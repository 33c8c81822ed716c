package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The at-scale approximate aggregates (SCALE.md's documented swaps
  * for exact count-distinct / percentiles) must land within their
  * error bounds on real data. */
class ApproxSpec extends AnyFunSuite {
  import TestSession._

  test("approx_count_distinct within 5% of exact on events.user_id") {
    import spark.implicits._
    val e = graft.sources.Tables.events(spark, sf)
    val (exact, approx) = e.agg(
        countDistinct($"user_id").cast("double"),
        approx_count_distinct($"user_id", 0.02).cast("double"))
      .as[(Double, Double)].head()
    assert(math.abs(approx - exact) / exact <= 0.05, s"exact=$exact approx=$approx")
  }

  test("KMV distinct sketch: self-reported error honest and within 3σ") {
    import spark.implicits._
    val r = graft.operators.Analytic.distinctSketch(spark, sf)
      .as[(String, Long, Double, Double)].collect()
    assert(r.length == 5)
    // exact column really is exact
    val want = graft.sources.Tables.events(spark, sf)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    r.foreach { case (t, exact, est, err) =>
      assert(exact == want(t))
      assert(err == est / exact - 1.0)
      // KMV rel-σ ≈ 1/√(k−2) ≈ 12.7% at k=64; 3σ bound
      assert(math.abs(err) < 0.38, s"$t err=$err beyond 3σ — hash mixing broke")
    }
  }

  test("approx_percentile within 2% of exact interpolated percentile") {
    import spark.implicits._
    val o = graft.sources.Tables.orders(spark, sf)
    val (exact, approx) = o.agg(
        expr("percentile(o_totalprice, 0.5)"),
        expr("approx_percentile(o_totalprice, 0.5, 10000)"))
      .as[(Double, Double)].head()
    assert(math.abs(approx - exact) / exact <= 0.02, s"exact=$exact approx=$approx")
  }
}
