package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** PageRank + transition-closure invariants, with the determinism
  * claims (sorted-fold sums are partition-count independent to the
  * bit) proven executable rather than asserted in prose.
  */
class GraphSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def ranksOf(edges: org.apache.spark.sql.DataFrame): Map[String, Double] =
    Graph.pagerankOn(edges).as[(String, Double)].collect().toMap

  test("pagerank conserves probability mass and stays in (0,1)") {
    val r = Graph.pagerank(spark, sf).as[(String, Double)].collect()
    assert(r.length == 5)
    assert(r.forall { case (_, v) => v > 0.0 && v < 1.0 })
    // every node has out-edges in a transition chain, so no dangling
    // leak: total mass stays 1 up to the ulp drift of 8 damped rounds
    assert(math.abs(r.map(_._2).sum - 1.0) < 1e-9)
  }

  test("pagerank is bit-identical at any partition count (sorted-fold sums)") {
    val e = Graph.transitionEdges(spark, sf)
    val a = ranksOf(e.repartition(1))
    val b = ranksOf(e.repartition(13))
    // exact Double equality on purpose: the determinism contract is
    // bit-level, not epsilon-level — plain SUM(double) fails this
    assert(a == b)
  }

  test("pagerank on a directed cycle stays uniform; a sink-heavy star ranks the hub highest") {
    val cycle = Seq(("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0), ("d", "a", 1.0))
      .toDF("src", "dst", "p")
    val rc = ranksOf(cycle)
    // uniform is the fixed point of a cycle; drift is ulp-scale only
    rc.values.foreach(v => assert(math.abs(v - 0.25) < 1e-12))
    // leaves feed the hub, hub returns mass evenly: hub must dominate
    val star = Seq(
      ("h", "l1", 1.0 / 3), ("h", "l2", 1.0 / 3), ("h", "l3", 1.0 / 3),
      ("l1", "h", 1.0), ("l2", "h", 1.0), ("l3", "h", 1.0)).toDF("src", "dst", "p")
    val rs = ranksOf(star)
    assert(rs("h") > rs("l1") && rs("l1") == rs("l2") && rs("l2") == rs("l3"))
  }

  test("sorted-fold ranks match plain-sum ranks within accumulation noise") {
    // the production-scale variant (unbounded in-degree) would use a
    // plain sum; pin that the deterministic fold computes the same
    // value up to FP association, so swapping is a perf knob not a
    // semantics change
    val e = Graph.transitionEdges(spark, sf)
    val det = ranksOf(e)
    var plain = e.select(col("src").as("node")).union(e.select(col("dst"))).distinct()
      .crossJoin(broadcast(e.select(col("src")).union(e.select(col("dst")))
        .distinct().agg(count(lit(1)).as("n"))))
      .select(col("node"), (lit(1.0) / col("n")).as("pagerank"))
    for (_ <- 1 to 8) {
      val s = e.join(plain, col("src") === col("node"))
        .select(col("dst"), (col("pagerank") * col("p")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      plain = plain.select(col("node")).join(s, col("node") === col("dst"), "left")
        .select(col("node"), (lit(0.15) / lit(5) + lit(0.85) * coalesce(col("s"), lit(0.0))).as("pagerank"))
    }
    val p = plain.as[(String, Double)].collect().toMap
    det.foreach { case (k, v) => assert(math.abs(v - p(k)) < 1e-12) }
  }

  test("two-step closure is row-stochastic and matches a driver-side matrix square") {
    val p2 = Graph.twoStep(spark, sf).as[(String, String, Double)].collect()
    val bySrc = p2.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    bySrc.foreach { case (_, tot) => assert(math.abs(tot - 1.0) < 1e-12) }
    // independent reference: square the P matrix on the driver
    val e = Graph.transitionEdges(spark, sf).as[(String, String, Double)].collect()
    val m = e.groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    p2.foreach { case (s, d, v) =>
      val want = m(s).toSeq.collect { case (mid, p1) if m(mid).contains(d) => p1 * m(mid)(d) }.sum
      assert(math.abs(v - want) < 1e-12, s"p2($s,$d)")
    }
  }
}
