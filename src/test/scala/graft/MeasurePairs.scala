package graft

import org.apache.spark.sql.functions._

/** One-off diagnosis for the dedup_components_star fourth-decade
  * failure (r15 verdict task 1): per decade, how big is the mined
  * pair graph the star contraction consumes, how concentrated is it
  * (max degree / component), and where does the star loop's work go
  * round by round? Prints one labelled line per fact so the numbers
  * can be pasted into SCALE.md.
  *
  * Usage: runMain graft.MeasurePairs <sfdir> [phases]
  *   phases ⊆ {pairs,rounds}; default both.
  */
object MeasurePairs {
  def main(args: Array[String]): Unit = {
    // GraftSession (honors SPARK_GRAFT_CPUS + the bench shuffle
    // profile), NOT TestSession's local[4]/4-partition harness — a
    // 4-partition shuffle at an amplified decade measures the harness
    val spark = GraftSession.get()
    val dir = args(0)
    val phases = if (args.length > 1) args(1).split(",").toSet else Set("pairs", "rounds")

    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[measure] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // fresh build, cached — Memo level env still applies to the inner
    // Memo call, so set SPARK_GRAFT_MEMO_LEVEL/DIR like the leg runner
    val pairs = t("build+count pairs") {
      val p = graft.operators.Dedup.ngramJaccard(spark, dir)
        .select(col("doc_a"), col("doc_b")).cache()
      println(s"[measure] pairs=${p.count()}")
      p
    }

    if (phases("pairs")) {
      val nodes = pairs.select(explode(array(col("doc_a"), col("doc_b"))).as("d"))
      val deg = nodes.groupBy(col("d")).agg(count(lit(1)).as("deg")).cache()
      val n = deg.count()
      val stats = deg.agg(max(col("deg")).as("mx"), avg(col("deg")).as("av"),
        expr("percentile_approx(deg, 0.99)").as("p99")).collect()(0)
      println(s"[measure] nodes=$n maxdeg=${stats.get(0)} avgdeg=${stats.get(1)} p99deg=${stats.get(2)}")
      deg.unpersist()
    }

    if (phases("rounds")) {
      // the starLabels loop, replicated with per-round edge counts and
      // per-round wall — the production loop only counts on its
      // convergence-check rounds
      var edges = pairs
        .select(greatest(col("doc_a"), col("doc_b")).as("a"),
          least(col("doc_a"), col("doc_b")).as("b"))
        .filter(col("a") =!= col("b")).distinct().localCheckpoint()
      println(s"[measure] round0 edges=${edges.count()}")
      var i = 0
      var done = false
      while (!done && i < 20) {
        val t0 = System.nanoTime()
        val sym = edges.unionByName(edges.select(col("b").as("a"), col("a").as("b")))
        val mins = sym.groupBy(col("a")).agg(min(col("b")).as("mn"))
          .select(col("a"), least(col("mn"), col("a")).as("m"))
        val ls = sym.join(mins, Seq("a"))
          .filter(col("b") > col("a"))
          .select(col("b").as("a"), col("m").as("b"))
          .filter(col("a") =!= col("b")).distinct()
        val or = ls.select(greatest(col("a"), col("b")).as("a"), least(col("a"), col("b")).as("b"))
        val mins2 = or.groupBy(col("a")).agg(min(col("b")).as("m"))
        val ss = or.join(mins2, Seq("a"))
          .select(col("b").as("a"), col("m").as("b"))
          .unionByName(mins2.select(col("a"), col("m").as("b")))
          .filter(col("a") =!= col("b"))
          .select(greatest(col("a"), col("b")).as("a"), least(col("a"), col("b")).as("b"))
          .distinct()
          .localCheckpoint()
        val cnt = ss.count()
        val same = cnt == edges.count() && ss.exceptAll(edges).isEmpty
        println(f"[measure] round${i + 1} edges=$cnt converged=$same wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
        done = same
        edges = ss
        i += 1
      }
    }
    spark.stop()
  }
}
