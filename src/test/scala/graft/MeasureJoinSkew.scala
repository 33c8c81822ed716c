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

    val skipTable = sys.env.contains("SPARK_GRAFT_SKIP_TABLESKEW")
    for ((name, frame) <- Seq("uniform" -> raw, "skewed" -> skewedRaw)
         if !skipTable) {
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

    // ---- r13 verdict task 6: AQE skew-join vs manual salt on a ----
    // ---- 90%-one-KEY fixture (key CONCENTRATION, not table volume) --
    // The table-skew fixture above inflates every key's multiplicity
    // uniformly — AQE's skew split has nothing to split. This fixture
    // rewrites ~90% of od rows onto ONE order_id, the one-reducer-owns-
    // the-join shape both mechanisms exist for. The J1 edge is measured
    // bare (no downstream left joins) so the timing isolates the skewed
    // exchange, with the broadcast fallback disabled — at the 100 TB
    // operating point neither join side fits a broadcast.
    // two hot-key volumes: the raw od slice (~0.2 M rows — is skew even
    // visible at sub-reducer volumes?) and the replicated one (~6 M
    // rows, hot key ≈ 5 M — one reducer owns minutes of work)
    for ((scaleName, envFrame) <- Seq("hotkey90" -> raw,
                                      "hotkey90big" -> skewedRaw)) {
      val (odS0, oiS0, _, _) = slices(envFrame)
      val hot = oiS0.agg(min(col("oi_id"))).head().getString(0)
      val odHot = odS0.withColumn("order_id",
        when(pmod(xxhash64(col("order_detail_id")), lit(10)) < 9, lit(hot))
          .otherwise(col("order_id"))).cache()
      val oiR = oiS0.withColumnRenamed("oi_id", "order_id").cache()
      odHot.count(); oiR.count()
      keyStats(odHot, "order_id", s"$scaleName od.order_id")

      def consumeJ1(j: DataFrame): Unit = {
        j.select(xxhash64(col("order_detail_id"), col("order_id")).as("h"))
          .agg(sum(col("h"))).head()
        ()
      }
      def withConf[T](kvs: (String, String)*)(f: => T): T = {
        val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
        kvs.foreach { case (k, v) => spark.conf.set(k, v) }
        try f finally olds.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
      // lowered AQE skew thresholds so the splitter can fire at test
      // scale (defaults target 256 MB partitions; sf fixtures are MBs)
      val noBroadcast = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
      val aqeOn = noBroadcast ++ Seq(
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
      val aqeOff = noBroadcast ++ Seq(
        "spark.sql.adaptive.skewJoin.enabled" -> "false")

      val tAqe = withConf(aqeOn: _*) {
        timed(consumeJ1(odHot.join(oiR, Seq("order_id"))))
      }
      val tNone = withConf(aqeOff: _*) {
        timed(consumeJ1(odHot.join(oiR, Seq("order_id"))))
      }
      val tSalt = withConf(aqeOff: _*) {
        timed(consumeJ1(Skew.saltedJoin(odHot, oiR, Seq("order_id"))))
      }
      val tSaltAqe = withConf(aqeOn: _*) {
        timed(consumeJ1(Skew.saltedJoin(odHot, oiR, Seq("order_id"))))
      }
      println(f"MEASURE fixture=$scaleName aqeSkew=$tAqe%.2f " +
        f"noMitigation=$tNone%.2f salted16=$tSalt%.2f salted16+aqe=$tSaltAqe%.2f sec")
      odHot.unpersist(); oiR.unpersist()
    }
    raw.unpersist(); skewedRaw.unpersist()
  }
}
