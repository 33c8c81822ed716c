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
