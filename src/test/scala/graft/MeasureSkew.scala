package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.GmallDwdDb
import graft.streaming.LogStream

/** One-off measurement for SCALE.md (r9 ask #5): the envelope saltK
  * knob under table skew.
  *
  * Fixtures:
  *  - uniform: the sf envelope as generated (max table ≈ 30% of rows);
  *  - skewed:  order_detail inserts replicated until they are ~90% of
  *    all envelope rows — the "one hot topic" production shape.
  *
  * Workload: the production keying (`GmallDwdDb.saltedByTable`, the
  * exact repartition `envelope()` applies) is materialized first, like
  * the envelope Memo — the JSON parse is map-side and uniformly
  * parallel regardless of salt, so it is excluded from the timed
  * phase. Timed: the CONSUMER phase every dwd_* transform repeats —
  * the order-detail slice projection + a hash-reduce over the cached
  * partitioned frame. Narrow after the repartition, so wall time ≈ the
  * largest partition's work, which is precisely what saltK bounds.
  * Reported per config: min of 3 repeats.
  */
object MeasureSkew {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    val raw = GmallDwdDb.envelopeJson(spark, dir).cache()
    val isOd = col("value").contains("\"table\":\"order_detail\"")
    val od = raw.filter(isOd)
    val rest = raw.filter(!isOd)
    val (odCt, restCt) = (od.count(), rest.count())
    // replicate od lines so od' ≈ 9 × rest (≈ 90% of the union)
    val factor = math.max(1, math.ceil(9.0 * restCt / odCt).toInt)
    val odBig = od.withColumn("copy", explode(lit((1 to factor).toArray))).drop("copy")
    val skewedRaw = rest.unionByName(odBig).cache()
    val skewCt = skewedRaw.count() // materialize the cache before timing
    println(s"uniform rows=${odCt + restCt} (od=$odCt), " +
      s"skewed rows=$skewCt (od x$factor = ${odCt * factor}, ${100 * odCt * factor / skewCt}%)")

    def work(envRaw: DataFrame, saltK: Int): Double = {
      val env = GmallDwdDb
        .saltedByTable(spark, LogStream.maxwellEnvelope(envRaw), saltK).cache()
      env.count() // materialize the partitioned envelope (the Memo analog), untimed
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        GmallDwdDb.orderDetailSliceOn(env)
          .select(xxhash64(col("order_detail_id"), col("split_total_amount"),
            col("source_type"), col("split_activity_amount"),
            col("split_coupon_amount"), col("order_create_time")).as("h"))
          .agg(sum(col("h"))).head()
        (System.nanoTime() - t0) / 1e9
      }
      env.unpersist()
      reps.min
    }

    for ((name, frame) <- Seq("uniform" -> raw, "skewed" -> skewedRaw);
         saltK <- Seq(1, 8, 32)) {
      val t = work(frame, saltK)
      println(f"MEASURE fixture=$name saltK=$saltK sec=$t%.2f")
    }
    raw.unpersist(); skewedRaw.unpersist()
  }
}
