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

  test("cancel detail joins only 1003-with-old-status orders") {
    val cd = GmallDwdDb.tradeCancelDetail(spark, sf)
    val keys = cd.select(col("order_id").cast("long")).distinct()
      .collect().map(_.getLong(0))
    assert(keys.nonEmpty && keys.forall(_ % 20 == 7))
  }
}
