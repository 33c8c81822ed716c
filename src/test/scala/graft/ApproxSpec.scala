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

  test("KMV sketch over a STREAM (Complete mode) ≡ batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    import graft.operators.Analytic
    // online cardinality monitoring: the same hash feeds a streaming
    // collect_set whose projection reproduces the batch sketch exactly
    val feed = graft.sources.Tables.events(spark, sf)
      .select($"event_type", $"user_id").as[(String, Long)].collect().toSeq
    val mem = MemoryStream[(String, Long)](spark)
    val k = 64
    val sketched = mem.toDF().toDF("event_type", "user_id")
      .withColumn("h32", Analytic.userHash32)
      .groupBy($"event_type")
      .agg(expr("sort_array(collect_set(h32))").as("hs"),
        expr("size(collect_set(user_id))").cast("long").as("exact_ct"))
      .withColumn("kept_ct", expr("size(hs)").cast("long"))
      .withColumn("kmv_est",
        when($"kept_ct" < k, $"kept_ct".cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
            expr(s"element_at(hs, $k)").cast("double")))
      .withColumn("err_frac", $"kmv_est" / $"exact_ct".cast("double") - lit(1.0))
      .select($"event_type", $"exact_ct", $"kmv_est", $"err_frac")
    val q = sketched.writeStream.format("memory").queryName("kmv_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(feed.take(feed.size / 2)); q.processAllAvailable()
      mem.addData(feed.drop(feed.size / 2)); q.processAllAvailable()
      val got = spark.table("kmv_stream")
        .as[(String, Long, Double, Double)].collect().sortBy(_._1).toSeq
      val want = Analytic.distinctSketch(spark, sf)
        .as[(String, Long, Double, Double)].collect().sortBy(_._1).toSeq
      assert(want.nonEmpty && got == want)
    } finally q.stop()
  }

  test("EWMA equals the driver-side recurrence bit-for-bit, at any partitioning") {
    import spark.implicits._
    import graft.operators.Analytic
    val got = Analytic.ewmaHours(spark, sf)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    // driver-side recurrence with the same IEEE ops
    val want = got.map(r => (r._1, r._2, r._3)).groupBy(_._1).toSeq.flatMap {
      case (t, rows) =>
        var prev = Double.NaN
        rows.sortBy(_._2).map { case (_, hr, ct) =>
          val e = if (prev.isNaN) ct.toDouble else 0.3 * ct.toDouble + 0.7 * prev
          prev = e
          (t, hr, ct, e)
        }
    }.sortBy(r => (r._1, r._2))
    assert(got.sortBy(r => (r._1, r._2)) == want)
    // the smoothed series tracks the raw series' range
    got.groupBy(_._1).foreach { case (t, rs) =>
      val (lo, hi) = (rs.map(_._3).min.toDouble, rs.map(_._3).max.toDouble)
      rs.foreach(r => assert(r._4 >= lo && r._4 <= hi, s"$t ewma escaped [$lo,$hi]"))
    }
  }

  test("CUSUM: driver recurrence equality + planted sustained shift alarms") {
    import spark.implicits._
    import graft.operators.Analytic
    // fixture check: engine == driver-side recurrence
    val got = Analytic.cusumHours(spark, sf)
      .as[(String, String, Long, Double, Double, Int)].collect().toSeq
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (t, rows) =>
      val s = rows.sortBy(_._2)
      val n = s.length.toDouble
      val mu = s.map(_._3).sum.toDouble / n
      val sg = math.sqrt(s.map(r => r._3 * r._3).sum.toDouble / n - mu * mu)
      var (sp, sn) = (0.0, 0.0)
      s.foreach { r =>
        sp = math.max(0.0, sp + (r._3.toDouble - mu - 0.5 * sg))
        sn = math.max(0.0, sn + (mu - r._3.toDouble - 0.5 * sg))
        assert(r._4 == sp && r._5 == sn, s"$t ${r._2}")
        assert(r._6 == (if (sp > 4.0 * sg || sn > 4.0 * sg) 1 else 0))
      }
    }
    // planted shift: 30 hours at 10, then 20 hours at 14. Each
    // post-shift hour is only +1.2σ (pointwise z never crosses 3),
    // but the shift is SUSTAINED: the positive accumulator must stay
    // exactly 0 through the whole front half (no upward drift) and
    // cross the 4σ alarm in the back half. (The negative side is free
    // to alarm in the front — with global-moment calibration both
    // segments deviate from the pooled mean; that is CUSUM semantics,
    // not a false positive.)
    val hrs = (0 until 50).map(i => f"2024-01-${i / 24 + 1}%02d ${i % 24}%02d:00:00")
    val hourly = (0 until 50).map(i => ("planted", hrs(i), if (i < 30) 10L else 14L))
      .toDF("event_type", "hr", "ct")
    val out = Analytic.cusumOn(hourly)
      .as[(String, String, Long, Double, Double, Int)].collect().sortBy(_._2)
    assert(out.take(30).forall(_._4 == 0.0), "positive drift before the shift")
    assert(out.drop(30).exists(r => r._4 > 0.0 && r._6 == 1),
      "sustained +2σ shift never tripped the positive accumulator")
  }

  test("out-of-order audit: planted disorder counted exactly; bucketed ≡ naive; fixture clean") {
    import spark.implicits._
    import java.sql.Timestamp
    import graft.operators.Analytic
    // planted: event 3 runs 40 s behind the frontier set by event 2,
    // event 5 runs 7 s behind; tiny bucket size forces the cross-bucket
    // frontier path (bucket_prev), not just the within-bucket window
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val planted = Seq(
      ("a", 1L, ts(0)), ("a", 2L, ts(100)), ("a", 3L, ts(60)),
      ("a", 4L, ts(120)), ("a", 5L, ts(113)), ("a", 6L, ts(130)),
      ("b", 7L, ts(0)), ("b", 8L, ts(10))).toDF("event_type", "event_id", "ts")
    for (bucket <- Seq(1L, 2L, 4096L)) {
      val out = Analytic.outOfOrderOn(planted, bucket)
        .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(out == Seq(("a", 2L, 6L, 40L), ("b", 0L, 2L, 0L)),
        s"bucketIds=$bucket gave $out")
    }
    // the parquet fixture is event-id-ordered: the audit must say so
    val clean = Analytic.outOfOrder(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(clean.nonEmpty && clean.forall(r => r._2 == 0L && r._4 == 0L))
  }

  test("MAD outliers: spike flagged where σ-masking hides it; constant series defined") {
    import spark.implicits._
    import graft.operators.Analytic
    // 8 quiet hours (9/11 alternating, so MAD is nonzero) and ONE spike
    // at 200. A single extreme point's z is bounded by ~√n, and here it
    // inflates σ to ~60 so its own z ≈ 2.8 — masked below the |z|>3
    // gate — while the median/MAD are untouched (med=11, MAD=2) and
    // rz ≈ 64 flags it
    val hrs = (0 until 9).map(i => f"2024-01-01 $i%02d:00:00")
    val series = (0 until 9).map { i =>
      ("spiky", hrs(i), if (i == 8) 200L else if (i % 2 == 0) 9L else 11L)
    }.toDF("event_type", "hr", "ct")
    val out = Analytic.madOutliersOn(series)
      .as[(String, String, Long, Double, Double, Double, Int)].collect()
    val spike = out.find(_._3 == 200L).get
    assert(spike._7 == 1, s"spike not flagged: rz=${spike._6}")
    assert(out.filter(_._3 != 200L).forall(_._7 == 0), "quiet hours misflagged")
    // same series through the σ-based anomaly gate: the spike's z is
    // genuinely masked — the robust detector is not redundant
    val z = Analytic.anomalyOn(series)
      .as[(String, String, Long, Double, Double, Double, Int)].collect()
    assert(z.find(_._3 == 200L).get._7 == 0, "fixture no longer demonstrates masking")
    // constant series: MAD = 0 ⇒ rz defined 0, nothing flagged
    val const = (0 until 10)
      .map(i => ("flat", f"2024-01-02 $i%02d:00:00", 10L))
      .toDF("event_type", "hr", "ct")
    val cflat = Analytic.madOutliersOn(const)
      .as[(String, String, Long, Double, Double, Double, Int)].collect()
    assert(cflat.forall(r => r._6 == 0.0 && r._7 == 0))
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
