package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftExpressions.topkAgg
import graft.operators.Analytic

/** The bounded top-k aggregate (`TopKAgg`): answer equivalence with
  * the window `row_number` form, partition-count independence (the
  * merge path), tie/NaN determinism, SQL registration, and the plan
  * property that motivates it — no Window sort node anywhere.
  */
class TopKSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("an_topk_per_group == window row_number recompute on sf0.001") {
    val viaAgg = Analytic.topkPerGroup(spark, sf).collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("p_brand").orderBy(col("revenue").desc, col("p_partkey"))
    val li = graft.sources.Tables.lineitem(spark, sf)
    val p = graft.sources.Tables.part(spark, sf)
    val viaWindow = li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(graft.functions.Num.dsum2(col("l_extendedprice")).as("revenue"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("p_brand"), col("rk"), col("p_partkey"), col("revenue"))
      .orderBy(col("p_brand"), col("rk"))
      .collect().toSeq
    assert(viaAgg == viaWindow)
  }

  test("result is independent of input partitioning (merge path)") {
    val rows = (1 to 200).map(i => (s"g${i % 5}", (i * 37 % 101).toDouble, f"$i%012d"))
    def run(parts: Int) =
      rows.toDF("g", "s", "t").repartition(parts)
        .groupBy("g").agg(topkAgg(col("s"), col("t"), 4).as("top"))
        .orderBy("g").collect().toSeq
    assert(run(1) == run(7))
    assert(run(1) == run(32))
  }

  test("ties break on tag binary order; null score/tag rows are skipped") {
    val df = Seq(
      ("g", Some(5.0), Some("b")), ("g", Some(5.0), Some("a")),
      ("g", Some(7.0), Some("z")), ("g", None, Some("x")),
      ("g", Some(9.0), None), ("g", Some(1.0), Some("low")))
      .toDF("g", "s", "t")
    val top = df.groupBy("g")
      .agg(topkAgg(col("s"), col("t"), 3).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.score"), col("e.tag"))
      .collect().map(r => (r.getDouble(0), r.getString(1))).toSeq
    assert(top == Seq((7.0, "z"), (5.0, "a"), (5.0, "b")))
  }

  test("k larger than the group returns the whole group, ordered") {
    val top = Seq(("g", 1.0, "a"), ("g", 3.0, "b")).toDF("g", "s", "t")
      .groupBy("g").agg(topkAgg(col("s"), col("t"), 10).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.score"), col("e.tag"))
      .collect().map(r => (r.getDouble(0), r.getString(1))).toSeq
    assert(top == Seq((3.0, "b"), (1.0, "a")))
  }

  test("graft_topk_agg is SQL-callable and equals the Column API") {
    Seq(("a", 1.0, "x"), ("a", 2.0, "y"), ("b", 3.0, "z"))
      .toDF("g", "s", "t").createOrReplaceTempView("topk_t")
    val viaSql = spark.sql(
      "SELECT g, graft_topk_agg(s, t, 1) AS top FROM topk_t GROUP BY g ORDER BY g")
      .collect().toSeq
    val viaApi = spark.table("topk_t").groupBy("g")
      .agg(topkAgg(col("s"), col("t"), 1).as("top")).orderBy("g")
      .collect().toSeq
    assert(viaSql == viaApi)
  }

  test("top-k over a STREAM: at-rest buffer = batch (state-store round trip)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    // rows arrive in two micro-batches; the k-bounded buffer must
    // survive serialize/deserialize through the streaming state store
    // — the online form of "maintain a per-key leaderboard at ingest"
    val all = (1 to 100).map(i => (s"g${i % 3}", (i * 29 % 53).toDouble, f"$i%012d"))
    val (b1, b2) = all.splitAt(all.length / 2)
    val mem = MemoryStream[(String, Double, String)](spark)
    val agg = mem.toDF().toDF("g", "s", "t")
      .groupBy("g").agg(topkAgg(col("s"), col("t"), 5).as("top"))
    val q = agg.writeStream.format("memory").queryName("topk_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("topk_stream").orderBy("g").collect().toSeq
      val want = all.toDF("g", "s", "t")
        .groupBy("g").agg(topkAgg(col("s"), col("t"), 5).as("top"))
        .orderBy("g").collect().toSeq
      assert(got == want, "streamed top-k diverges from batch top-k")
    } finally q.stop()
  }

  test("VectorSumAgg == explode + per-dim sum; partition-independent; dims mismatch throws") {
    import graft.functions.GraftExpressions.vectorSumAgg
    val rows = (1 to 120).map(i => (s"g${i % 4}", Array.tabulate(8)(d => (i * (d + 3) % 17 - 8).toLong)))
    val df = rows.toDF("g", "v")
    def run(parts: Int) =
      df.repartition(parts).groupBy("g").agg(vectorSumAgg(col("v"), 8).as("s"))
        .orderBy("g").collect().map(r => (r.getString(0), r.getSeq[Long](1))).toSeq
    val viaExplode = df.select(col("g"), posexplode(col("v")))
      .groupBy("g", "pos").agg(sum("col").as("s"))
      .groupBy("g").agg(sort_array(collect_list(struct(col("pos"), col("s")))).as("ps"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)))).toSeq
    assert(run(1) == viaExplode)
    assert(run(1) == run(7))
    val bad = Seq(("g", Array(1L, 2L))).toDF("g", "v")
      .groupBy("g").agg(vectorSumAgg(col("v"), 8).as("s"))
    intercept[Exception] { bad.collect() }
  }

  test("vector sums over a STREAM: at-rest == batch (online centroid maintenance)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.functions.GraftExpressions.vectorSumAgg
    val all = (1 to 60).map(i => (i % 3, Array.tabulate(4)(d => (i * (d + 1)).toLong)))
    val (b1, b2) = all.splitAt(30)
    val mem = MemoryStream[(Int, Array[Long])](spark)
    val agg = mem.toDF().toDF("label", "qv")
      .groupBy("label").agg(vectorSumAgg(col("qv"), 4).as("s"), count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("vsum_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("vsum_stream").orderBy("label").collect().toSeq
      val want = all.toDF("label", "qv")
        .groupBy("label").agg(vectorSumAgg(col("qv"), 4).as("s"), count(lit(1)).as("n"))
        .orderBy("label").collect().toSeq
      assert(got == want, "streamed vector sums diverge from batch")
    } finally q.stop()
  }

  test("graft_vector_sum_agg is SQL-callable") {
    Seq((1, Seq(1L, 2L)), (1, Seq(10L, 20L))).toDF("g", "v")
      .createOrReplaceTempView("vsum_t")
    val got = spark.sql("SELECT graft_vector_sum_agg(v, 2) AS s FROM vsum_t GROUP BY g")
      .collect().map(_.getSeq[Long](0)).toSeq
    assert(got == Seq(Seq(11L, 22L)))
  }

  test("plan has no Window sort: the whole point at scale") {
    // executedPlan.toString recurses through the AdaptiveSparkPlan
    // wrapper; node-name scan on the rendered tree (same approach as
    // PlanPinSpec)
    val plan = Analytic.topkPerGroup(spark, sf).queryExecution.executedPlan.toString
    val names = plan.linesIterator.map(_.dropWhile(c => !c.isLetter).takeWhile(c => c.isLetterOrDigit)).toSet
    assert(!names.exists(_.contains("Window")), s"window node in plan: $names")
    assert(names.exists(_.contains("ObjectHashAggregate")),
      s"expected ObjectHashAggregate for the typed-buffer agg, got: $names")
  }
}
