package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{GmallDwdDb, Skew}
import graft.streaming.LogStream

/** One-off measurement for SCALE.md (r12 ask #6): does the envelope's
  * table skew (the 90%-one-table scenario `MeasureSkew` covers for the
  * AGG) affect the flagship order-detail JOIN, and would salting it
  * help?
  *
  * Fixtures: uniform = the sf envelope as generated; skewed =
  * `order_detail` inserts replicated to ≈90% of all envelope rows.
  * Note the hot TABLE inflates join-key MULTIPLICITY uniformly (every
  * detail id gains the same factor), not key concentration — the
  * production "hot topic" shape.
  *
  * Workloads (min of 3, consumer = xxhash reduce so nothing collects):
  *  - plain: `tradeOrderDetailWideOn` exactly as shipped (J1 inner +
  *    two J2 left joins + broadcast dic);
  *  - salted: the J1 od ⋈ oi edge through `Skew.saltedJoin(salts=16)`,
  *    rest unchanged — what we WOULD ship if the key histogram said
  *    one reducer owns the join.
  *
  * Also prints the od/oi join-key histograms (max/avg multiplicity,
  * distinct keys) — the decision input: salting only pays when
  * max ≫ avg concentrates one partition.
  */
object MeasureJoinSkew {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    val raw = GmallDwdDb.envelopeJson(spark, dir).cache()
    val isOd = col("value").contains("\"table\":\"order_detail\"")
    val od = raw.filter(isOd)
    val rest = raw.filter(!isOd)
    val (odCt, restCt) = (od.count(), rest.count())
    val factor = math.max(1, math.ceil(9.0 * restCt / odCt).toInt)
    val odBig = od.withColumn("copy", explode(lit((1 to factor).toArray))).drop("copy")
    val skewedRaw = rest.unionByName(odBig).cache()
    val skewCt = skewedRaw.count()
    println(s"uniform rows=${odCt + restCt} (od=$odCt), " +
      s"skewed rows=$skewCt (od x$factor, ${100 * odCt * factor / skewCt}%)")

    def keyStats(df: DataFrame, k: String, label: String): Unit = {
      val st = df.groupBy(col(k)).agg(count(lit(1)).as("ct"))
        .agg(max(col("ct")), avg(col("ct")), count(lit(1))).head()
      println(f"KEYS $label max=${st.getLong(0)} avg=${st.getDouble(1)}%.2f " +
        s"distinct=${st.getLong(2)}")
    }

    val dic = GmallDwdDb.baseDic(spark)
    def slices(envRaw: DataFrame): (DataFrame, DataFrame, DataFrame, DataFrame) = {
      val env = LogStream.maxwellEnvelope(envRaw)
      (GmallDwdDb.orderDetailSliceOn(env), GmallDwdDb.orderInfoSliceOn(env),
        GmallDwdDb.activitySliceOn(env), GmallDwdDb.couponSliceOn(env))
    }

    def consume(wide: DataFrame): Unit = {
      wide.select(xxhash64(col("order_detail_id"), col("order_id"),
        col("split_total_amount"), col("source_type")).as("h"))
        .agg(sum(col("h"))).head()
      ()
    }
    def timed(f: => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    for ((name, frame) <- Seq("uniform" -> raw, "skewed" -> skewedRaw)) {
      val (odS, oiS, oaS, ocS) = slices(frame)
      keyStats(odS, "order_id", s"$name od.order_id")
      keyStats(oiS, "oi_id", s"$name oi.order_id")
      val plain = timed(consume(
        GmallDwdDb.tradeOrderDetailWideOn(odS, oiS, oaS, ocS, dic)))
      // salted J1 edge: same downstream shape as tradeOrderDetailWideOn
      val salted = timed(consume {
        val j1 = Skew.saltedJoin(odS,
          oiS.withColumnRenamed("oi_id", "order_id"), Seq("order_id"))
        j1.join(oaS, j1("order_detail_id") === oaS("oa_order_detail_id"), "left")
          .join(ocS, j1("order_detail_id") === ocS("oc_order_detail_id"), "left")
          .join(broadcast(dic), col("source_type") === dic("dic_code"))
      })
      println(f"MEASURE fixture=$name plain=$plain%.2f salted16=$salted%.2f sec")
    }
    raw.unpersist(); skewedRaw.unpersist()
  }
}
