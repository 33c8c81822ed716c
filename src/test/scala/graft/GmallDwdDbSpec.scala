package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GmallDwdDb
import graft.streaming.LogStream

/** The DWD-db apps' filter semantics over the Maxwell fixture — each
  * test pins a NEGATIVE case the envelope deliberately contains and the
  * app's filter must reject (the oracle gate alone would also catch a
  * wrongly-included row, but these make the rejection explicit). */
class GmallDwdDbSpec extends AnyFunSuite {
  import TestSession._

  private lazy val env = GmallDwdDb.envelope(spark, sf)

  // hand-authored CDC lines with realistic arrival-time spacing (all
  // envelopes of one order within seconds — the regime the reference's
  // 3-day TTL assumes; the parquet-derived fixture spreads od/oi event
  // times by months, so it exercises the BATCH form only)
  private def od(id: String, order: String, st: String, t: Long) =
    s"""{"database":"g","table":"order_detail","type":"insert","data":{"id":"$id","order_id":"$order","sku_id":"7","sku_name":"sku_7","order_price":"10.00","sku_num":"2","create_time":"1995-03-01 00:00:00","source_type":"$st","source_id":"3","split_total_amount":"19.00","split_activity_amount":"0.50","split_coupon_amount":"0.50"},"ts":$t}"""
  private def oi(order: String, typ: String, status: String, old: String, t: Long) =
    s"""{"database":"g","table":"order_info","type":"$typ","data":{"id":"$order","consignee":"n","total_amount":"20.00","order_status":"$status","user_id":"42","province_id":"${(order.toLong % 25).toString}","operate_time":"1995-03-01 01:00:00","original_total_amount":"20.00","activity_reduce_amount":"0.50","coupon_reduce_amount":"0.50"}$old,"ts":$t}"""
  private def oa(detail: String, t: Long) =
    s"""{"database":"g","table":"order_detail_activity","type":"insert","data":{"order_detail_id":"$detail","activity_id":"5","activity_rule_id":"8","create_time":"1995-03-01 00:00:00"},"ts":$t}"""
  private def oc(detail: String, t: Long) =
    s"""{"database":"g","table":"order_detail_coupon","type":"insert","data":{"order_detail_id":"$detail","coupon_id":"9","coupon_use_id":"cu9","create_time":"1995-03-01 00:00:00"},"ts":$t}"""

  test("fixture contains negative envelopes for every filter") {
    // coupon_use updates whose old has neither using_time nor used_time
    assert(env.filter(col("table") === "coupon_use" && col("type") === "update" &&
      !LogStream.columnChanged(col("old"), "using_time") &&
      !LogStream.columnChanged(col("old"), "used_time")).count() > 0)
    // order_info 1005/1003 updates whose old lacks order_status
    assert(env.filter(col("table") === "order_info" && col("type") === "update" &&
      !LogStream.columnChanged(col("old"), "order_status")).count() > 0)
    // favor_info cancel (0→1) updates
    assert(env.filter(col("table") === "favor_info" && col("type") === "update" &&
      col("data").getItem("is_cancel") === "1").count() > 0)
  }

  test("coupon order/pay reject updates whose old lacks the time column") {
    val order = GmallDwdDb.toolCouponOrder(spark, sf)
    assert(order.filter(col("order_time").isNull).count() === 0)
    val pay = GmallDwdDb.toolCouponPay(spark, sf)
    assert(pay.filter(col("payment_time").isNull).count() === 0)
    // %8==4 negatives share the cu<okey> id space with nothing — no id
    // from the negative population may appear in either output
    val negIds = env.filter(col("table") === "coupon_use" && col("type") === "update" &&
        LogStream.columnChanged(col("old"), "order_id"))
      .select(col("data").getItem("id").as("id"))
    assert(order.join(negIds, "id").count() === 0)
    assert(pay.join(negIds, "id").count() === 0)
  }

  test("refund left join only decorates acknowledged (1005, old has status) orders") {
    val refund = GmallDwdDb.tradeOrderRefund(spark, sf)
    // %20==3 → province present; %20==13 → envelope exists but filter
    // rejected it, so province is null
    val withP = refund.filter(col("province_id").isNotNull)
      .select(col("order_id").cast("long")).collect().map(_.getLong(0))
    assert(withP.nonEmpty && withP.forall(_ % 20 == 3))
    val withoutP = refund.filter(col("province_id").isNull)
      .select(col("order_id").cast("long")).collect().map(_.getLong(0))
    assert(withoutP.nonEmpty && withoutP.forall(_ % 20 == 13))
  }

  test("favor_add keeps inserts + restores, drops cancels") {
    val favor = GmallDwdDb.interactionFavorAdd(spark, sf)
    val keys = favor.select(regexp_extract(col("id"), "f(\\d+)", 1).cast("long").as("k"))
      .collect().map(_.getLong(0))
    assert(keys.nonEmpty)
    assert(keys.forall(k => k % 5 == 1 || k % 10 == 2))
    assert(!keys.exists(_ % 10 == 7))
  }

  test("streaming envelope through the app filters equals the batch form") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    // the reference apps are streaming consumers of topic_db; the *On
    // transforms must produce identical rows whether the envelope
    // comes from a batch frame or readStream micro-batches
    val lines = Seq(
      """{"database":"g","table":"coupon_use","type":"insert","data":{"id":"cu1","coupon_id":"7","user_id":"42","order_id":"9","get_time":"1995-03-01 00:00:00"},"ts":794016000}""",
      """{"database":"g","table":"coupon_use","type":"update","data":{"id":"cu1","coupon_id":"7","user_id":"42","order_id":"9","using_time":"1995-03-02 00:00:00"},"old":{"using_time":null},"ts":794102400}""",
      """{"database":"g","table":"coupon_use","type":"update","data":{"id":"cu1","coupon_id":"7","user_id":"42","order_id":"9"},"old":{"order_id":null},"ts":794102401}""",
      """{"database":"g","table":"favor_info","type":"insert","data":{"id":"f1","user_id":"42","sku_id":"5","is_cancel":"0","create_time":"1995-03-01 00:00:00"},"ts":794016000}""",
      """{"database":"g","table":"favor_info","type":"update","data":{"id":"f2","user_id":"43","sku_id":"6","is_cancel":"0","create_time":"1995-03-01 00:00:00"},"old":{"is_cancel":"1"},"ts":794016001}""",
      """{"database":"g","table":"favor_info","type":"update","data":{"id":"f3","user_id":"44","sku_id":"7","is_cancel":"1","create_time":"1995-03-01 00:00:00"},"old":{"is_cancel":"0"},"ts":794016002}""",
      """{"database":"g","table":"user_info","type":"insert","data":{"id":"42","create_time":"1995-01-05 00:00:00"},"ts":789264000}""",
      """not json — quarantined by the parse path""")
    def transforms(env: org.apache.spark.sql.DataFrame) = Seq(
      "coupon_order" -> GmallDwdDb.toolCouponOrderOn(env),
      "favor_add" -> GmallDwdDb.interactionFavorAddOn(env),
      "register" -> GmallDwdDb.userRegisterOn(env))
    val batchResults = transforms(
      LogStream.maxwellEnvelope(lines.toDF("value")))
      .map { case (n, df) => n -> df.collect().map(_.toString).toSet }.toMap
    val mem = MemoryStream[String](spark)
    val queries = transforms(LogStream.maxwellEnvelope(mem.toDF()))
      .map { case (n, df) =>
        n -> df.writeStream.format("memory").queryName(s"dwddb_$n")
          .outputMode(OutputMode.Append).start()
      }
    mem.addData(lines.take(4))
    queries.foreach(_._2.processAllAvailable())
    mem.addData(lines.drop(4))
    queries.foreach { case (_, q) => q.processAllAvailable(); q.stop() }
    batchResults.foreach { case (n, want) =>
      val got = spark.table(s"dwddb_$n").collect().map(_.toString).toSet
      assert(got == want, s"streaming $n diverged from batch")
      assert(want.nonEmpty, s"$n fixture produced no rows")
    }
  }

  test("flagship 5-table join: streaming form ≡ batch wide rows; D2 collapses mutations") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    import graft.streaming.Stateful

    val lines = Seq(
      od("d1", "1", "2401", 100), // activity-decorated, order mutates → 2 variants
      od("d2", "1", "2402", 100), // no decorations → null padding
      od("d3", "2", "2403", 200), // coupon-decorated
      od("d9", "9", "2404", 300), // order_info never arrives → inner join drops
      oi("1", "insert", "1001", "", 101),
      oi("1", "update", "1002", ""","old":{"order_status":"1001"}""", 150),
      oi("2", "insert", "1001", "", 201),
      oa("d1", 102),
      oa("dx", 103), // decoration for an unknown detail → dropped by left join
      oc("d3", 202),
      // negative: od update must be rejected by the insert-only slice
      s"""{"database":"g","table":"order_detail","type":"update","data":{"id":"d1","order_id":"1","sku_num":"9"},"old":{"sku_num":"2"},"ts":160}""")

    val dic = GmallDwdDb.baseDic(spark)
    val benv = LogStream.maxwellEnvelope(lines.toDF("value"))
    val batch = GmallDwdDb.tradeOrderDetailWideOn(
      GmallDwdDb.orderDetailSliceOn(benv), GmallDwdDb.orderInfoSliceOn(benv),
      GmallDwdDb.activitySliceOn(benv), GmallDwdDb.couponSliceOn(benv), dic)
      .drop("pt", "old")
    val cols = batch.columns.sorted
    val want = batch.select(cols.map(col): _*).collect().map(_.toString).toSet

    val mem = MemoryStream[String](spark)
    val q = GmallDwdDb.tradeOrderDetailStreamOn(
        LogStream.maxwellEnvelope(mem.toDF()), dic)
      .writeStream.format("memory").queryName("flagship_wide")
      .outputMode(OutputMode.Append).start()
    mem.addData(lines)
    q.processAllAvailable()
    // flush the outer-join + 3-day-bound state: per round, one sentinel
    // per table (keys chosen to never join) advances every branch's
    // watermark; three rounds propagate it through the 2-deep join chain
    (1 to 3).foreach { r =>
      val t = 5000000L * r
      mem.addData(Seq(od(s"sd$r", s"90$r", "2401", t), oi(s"91$r", "insert", "1001", "", t),
        oa(s"sx$r", t), oc(s"sy$r", t)))
      q.processAllAvailable()
    }
    q.stop()
    val wideT = spark.table("flagship_wide")
    assert(wideT.columns.sorted.toSeq == cols.toSeq,
      s"streaming columns ${wideT.columns.sorted.toSeq} != batch $cols")
    val got = wideT.filter(!col("order_detail_id").startsWith("sd"))
      .select(cols.map(col): _*).collect().map(_.toString).toSet
    assert(want.nonEmpty && got == want, "streaming wide rows diverged from batch")

    // D2 latest-wins over the wide stream (the upsert-Kafka hop the
    // reference puts between DwdTradeOrderDetail and its consumers):
    // per order_detail_id the newest (ts, payload) variant survives —
    // ties on od-ts resolve by payload, so the update variant wins
    val keyed = wideT.filter(!col("order_detail_id").startsWith("sd"))
      .select(col("order_detail_id"), col("ts"), col("type"), col("order_status"))
      .collect().map(r => Stateful.Keyed(r.getString(0),
        new Timestamp(r.getLong(1) * 1000L), r.getString(2) + "|" + r.getString(3)))
    val kmem = MemoryStream[Stateful.Keyed](spark)
    val dq = Stateful.latestWins(kmem.toDS().withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName("flagship_d2")
      .outputMode(OutputMode.Append).start()
    kmem.addData(keyed.toSeq)
    dq.processAllAvailable()
    Seq(10000000000L, 20000000000L).zipWithIndex.foreach { case (t, i) =>
      kmem.addData(Stateful.Keyed(s"zz$i", new Timestamp(t), "s"))
      dq.processAllAvailable()
    }
    dq.stop()
    val gotD2 = spark.table("flagship_d2").as[Stateful.Keyed].collect()
      .filterNot(_.key.startsWith("zz")).map(k => k.key -> k.payload).toMap
    val wantD2 = keyed.groupBy(_.key).map { case (k, rs) =>
      k -> rs.maxBy(r => (r.ts.getTime, r.payload)).payload }
    assert(gotD2 == wantD2, "streaming D2 diverged from batch row_number form")
    assert(wantD2("d1") == "update|1002" && wantD2("d2") == "update|1002")
    assert(wantD2("d3") == "insert|1001" && !wantD2.contains("d9"))
  }

  test("flagship stream chains into a windowed DWS agg (one query, 4 stateful operators)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    // the reference's DWD→DWS dataflow as ONE streaming query: the
    // 3-join flagship wide stream feeding a tumbling province window —
    // Spark's multiple-stateful-operator support, proven at-rest equal
    // to the batch form
    // every detail carries its activity/coupon decorations: MATCHED
    // left-outer rows emit eagerly and flow into the window while it
    // is open. (Null-padded rows emit only at watermark close, by
    // which point the downstream agg's late-record filter — delayed by
    // the joins' 3-day bounds — already passed their event time, so a
    // chained window never counts them: the documented Spark
    // multiple-stateful-operator caveat. Production shape: land the
    // wide stream in the topic/table hop — the D2 test's path — when
    // unmatched rows matter to downstream aggregations.)
    val lines = Seq(
      od("w1", "1", "2401", 100), od("w2", "1", "2402", 110), od("w3", "2", "2403", 200),
      od("w9", "9", "2404", 300), // order_info never arrives → dropped
      oa("w1", 102), oc("w1", 103), oa("w2", 111), oc("w2", 112),
      oa("w3", 202), oc("w3", 203),
      oi("1", "insert", "1001", "", 101),
      oi("1", "update", "1002", ""","old":{"order_status":"1001"}""", 150),
      oi("2", "insert", "1001", "", 201))
    val dic = GmallDwdDb.baseDic(spark)
    // windows on `etCol`: the stream reuses the join's watermarked
    // od_et (re-watermarking after a stateful operator is disallowed);
    // the batch expectation derives the same instant from ts
    def windowed(wide: org.apache.spark.sql.DataFrame, etCol: org.apache.spark.sql.Column) = wide
      .groupBy(window(etCol, "60 seconds"), col("province_id"))
      .agg(count(lit(1)).as("row_ct"))
      .select(col("window.start").cast("long").as("ws"), col("province_id"), col("row_ct"))
    val benv = LogStream.maxwellEnvelope(lines.toDF("value"))
    val want = windowed(GmallDwdDb.tradeOrderDetailWideOn(
        GmallDwdDb.orderDetailSliceOn(benv), GmallDwdDb.orderInfoSliceOn(benv),
        GmallDwdDb.activitySliceOn(benv), GmallDwdDb.couponSliceOn(benv), dic),
      timestamp_seconds(col("ts")))
      .collect().map(_.toString).toSet

    val mem = MemoryStream[String](spark)
    val agg = windowed(
      GmallDwdDb.tradeOrderDetailStreamOn(LogStream.maxwellEnvelope(mem.toDF()), dic,
        keepEventTime = true),
      col("od_et"))
    val q = agg.writeStream.format("memory").queryName("flagship_dws")
      .outputMode(OutputMode.Append).start()
    mem.addData(lines)
    q.processAllAvailable()
    // sentinels must SURVIVE the inner join (matching od+oi ids) so the
    // window operator observes their event time and closes the real
    // windows; one extra round for the agg's additional watermark hop
    (1 to 5).foreach { r =>
      val t = 5000000L * r
      mem.addData(Seq(od(s"sd$r", s"90$r", "2401", t), oi(s"90$r", "insert", "1001", "", t),
        oa(s"sx$r", t), oc(s"sy$r", t)))
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("flagship_dws")
      .filter(col("ws") < 1000000L) // sentinel windows start near 5M·r
      .collect().map(_.toString).toSet
    assert(want.nonEmpty && got == want,
      s"streaming DWD→DWS window diverged: got=$got want=$want")
  }

  test("refund stream chains into a windowed DWS agg (one query, 3 stateful operators)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    def ri(id: String, order: String, t: Long) =
      s"""{"database":"g","table":"order_refund_info","type":"insert","data":{"id":"$id","user_id":"42","order_id":"$order","sku_id":"7","refund_type":"1101","refund_num":"1","refund_amount":"19.00","refund_reason_type":"1301","refund_reason_txt":"r","create_time":"1995-03-01 00:00:00"},"ts":$t}"""
    val oldSt = ""","old":{"order_status":"1002"}"""
    val lines = Seq(
      ri("r1", "41", 100), ri("r2", "42", 110), ri("r3", "43", 200),
      ri("r9", "99", 300), // never acknowledged → null-padded at watermark close
      oi("41", "update", "1005", oldSt, 130), oi("42", "update", "1005", oldSt, 140),
      oi("43", "update", "1005", oldSt, 230),
      oi("44", "update", "1003", oldSt, 240)) // a cancel, not an ack — filtered
    val dic = GmallDwdDb.baseDic(spark)
    def windowed(refund: org.apache.spark.sql.DataFrame, etCol: org.apache.spark.sql.Column) =
      refund.groupBy(window(etCol, "60 seconds"), col("province_id"))
        .agg(count(lit(1)).as("refund_ct"))
        .select(col("window.start").cast("long").as("ws"), col("province_id"), col("refund_ct"))
    val benv = LogStream.maxwellEnvelope(lines.toDF("value"))
    // UNLIKE the flagship's 3-join chain (whose caveat drops
    // null-padded rows), the single left-outer hop here keeps them ON
    // TIME for the chained window: the agg's late-record filter uses
    // the join's OUTPUT watermark (input wm − boundSec), which trails
    // the flushed rows' event times — so the streamed chain equals the
    // FULL batch left-outer, unmatched (null-province) refunds
    // included. Empirically pinned; if Spark's multi-stateful
    // watermark propagation ever changes, this assert localizes it.
    val want = windowed(GmallDwdDb.tradeOrderRefundOn(
        GmallDwdDb.refundInfoSliceOn(benv), GmallDwdDb.refundAckSliceOn(benv), dic),
      timestamp_seconds(col("ts"))).collect().map(_.toString).toSet

    val mem = MemoryStream[String](spark)
    val agg = windowed(GmallDwdDb.tradeOrderRefundStreamOn(
        LogStream.maxwellEnvelope(mem.toDF()), dic, keepEventTime = true),
      col("ri_et"))
    val q = agg.writeStream.format("memory").queryName("refund_dws")
      .outputMode(OutputMode.Append).start()
    mem.addData(lines)
    q.processAllAvailable()
    // sentinel ri+ack pairs (join survivors) advance both watermarks
    // and close the real windows; extra rounds for the agg's hop
    (1 to 4).foreach { r =>
      val t = 5000000L * r
      mem.addData(Seq(ri(s"zs$r", s"90$r", t),
        oi(s"90$r", "update", "1005", oldSt, t)))
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("refund_dws")
      .filter(col("ws") < 1000000L) // sentinel windows start near 5M·r
      .collect().map(_.toString).toSet
    assert(want.nonEmpty && got == want,
      s"streaming refund DWD→DWS window diverged: got=$got want=$want")
  }

  test("flagship wide plan: broadcast dic lookup, shuffle fact joins, no cartesian") {
    // build the join fresh from the slices (the memoized frame would
    // plan as a cached scan and hide the join structure)
    val dic = GmallDwdDb.baseDic(spark)
    val wide = GmallDwdDb.tradeOrderDetailWideOn(
      GmallDwdDb.orderDetailSliceOn(env), GmallDwdDb.orderInfoSliceOn(env),
      GmallDwdDb.activitySliceOn(env), GmallDwdDb.couponSliceOn(env), dic)
    val plan = wide.queryExecution.executedPlan.toString
    // the dictionary decode must be a broadcast, never a shuffle; the
    // fact-fact joins shuffle on their keys; nothing may degenerate to
    // a cartesian/nested-loop
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(2000))
  }

  test("cancel detail joins only 1003-with-old-status orders") {
    val cd = GmallDwdDb.tradeCancelDetail(spark, sf)
    val keys = cd.select(col("order_id").cast("long")).distinct()
      .collect().map(_.getLong(0))
    assert(keys.nonEmpty && keys.forall(_ % 20 == 7))
  }

  test("envelope saltK spreads fact-table partitions, results identical") {
    import org.apache.spark.sql.functions.spark_partition_id
    val base = GmallDwdDb.envelope(spark, sf)
    val salted = GmallDwdDb.envelope(spark, sf, saltK = 4)
    // the premise: keyed by table alone, the dominant fact table sits
    // in ONE partition; salted, it spreads (that is the 100× knob)
    def parts(df: org.apache.spark.sql.DataFrame, t: String): Long =
      df.filter(col("table") === t).select(spark_partition_id()).distinct().count()
    assert(parts(base, "order_detail") == 1L)
    assert(parts(salted, "order_detail") > 1L, "saltK=4 failed to spread order_detail")
    // low-volume tables stay pruned to a single partition
    assert(parts(salted, "user_info") == 1L)
    // and the flagship join built on the salted envelope is row-equal
    // to the default wide frame — the salt is partitioning-only
    val wideSalted = GmallDwdDb.tradeOrderDetailWideOn(
      GmallDwdDb.orderDetailSliceOn(salted), GmallDwdDb.orderInfoSliceOn(salted),
      GmallDwdDb.activitySliceOn(salted), GmallDwdDb.couponSliceOn(salted),
      GmallDwdDb.baseDic(spark))
    val wideBase = GmallDwdDb.tradeOrderDetailWide(spark, sf)
    val key = Seq("order_detail_id", "type", "order_status", "split_total_amount",
      "activity_id", "coupon_id", "dic_name")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(key.map(col): _*).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(rows(wideSalted).toSeq == rows(wideBase).toSeq)
  }

  test("explicit saltK=0 means UNSALTED even when the session conf says otherwise; bad conf names itself") {
    import org.apache.spark.sql.functions.spark_partition_id
    // -1 is the only use-the-conf sentinel: a caller that explicitly
    // asks for no salt must never be silently salted by a deployment
    // env (SPARK_GRAFT_ENVELOPE_SALTK)
    spark.conf.set(GmallDwdDb.EnvelopeSaltKConf, "8")
    try {
      val unsalted = GmallDwdDb.envelope(spark, sf, saltK = 0)
      val fromConf = GmallDwdDb.envelope(spark, sf) // sentinel -> conf 8
      def parts(df: org.apache.spark.sql.DataFrame): Long =
        df.filter(col("table") === "order_detail")
          .select(spark_partition_id()).distinct().count()
      assert(parts(unsalted) == 1L, "explicit saltK=0 must stay unsalted under a salting conf")
      assert(parts(fromConf) > 1L, "the -1 sentinel must honor the conf")
      // a malformed conf value fails with the conf's NAME, not a bare
      // NumberFormatException from nowhere
      spark.conf.set(GmallDwdDb.EnvelopeSaltKConf, "eight")
      val e = intercept[IllegalArgumentException](GmallDwdDb.envelope(spark, sf))
      assert(e.getMessage.contains(GmallDwdDb.EnvelopeSaltKConf))
    } finally spark.conf.unset(GmallDwdDb.EnvelopeSaltKConf)
  }

  test("joinSkuDimChecked: inner-join-equal in domain, FAILS LOUDLY out of domain") {
    import spark.implicits._
    val sku = GmallDwdDb.skuDim(spark, 16)
    val in = Seq("0", "7", "15", "7").toDF("sku_id").withColumn("v", lit(1L))
    // in-domain: exactly the inner join (no dropped or duplicated facts)
    val got = GmallDwdDb.joinSkuDimChecked(in, sku)
      .select(col("sku_id"), col("trademark_id"), col("v"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val want = in.join(broadcast(sku), Seq("sku_id"))
      .select(col("sku_id"), col("trademark_id"), col("v"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
    // out-of-domain: a plain inner join would SILENTLY DROP the fact
    // (the r13 advice's data-loss hazard); the checked join must throw
    val out = Seq("7", "16").toDF("sku_id").withColumn("v", lit(1L))
    val ex = intercept[Exception] {
      GmallDwdDb.joinSkuDimChecked(out, sku).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("outside the dim domain")), s"wrong failure: $ex")
  }
}
