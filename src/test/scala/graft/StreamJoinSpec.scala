package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Joins

/** Stream-stream, interval, and lookup joins (J1/J2/J3/J6). */
class StreamJoinSpec extends AnyFunSuite {
  import TestSession._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  case class OrderInfo(id: Long, user: String, ts: Timestamp)
  case class OrderDetail(detail_id: Long, order_id: Long, sku: String, ts: Timestamp)

  test("J1: stream-stream inner equi-join matches within the time bound") {
    import spark.implicits._
    val infos = MemoryStream[OrderInfo](spark)
    val details = MemoryStream[OrderDetail](spark)
    val joined = Joins.streamStream(
      details.toDF().withWatermark("ts", "2 seconds"),
      infos.toDF().withWatermark("ts", "2 seconds"),
      "order_id", "id", "ts", "ts", lowerSec = 10, upperSec = 10)
      .select($"detail_id", $"sku", $"user")
    val q = joined.writeStream.format("memory").queryName("j1")
      .outputMode(OutputMode.Append).start()
    infos.addData(OrderInfo(1, "alice", ts(100)), OrderInfo(2, "bob", ts(200)))
    details.addData(
      OrderDetail(11, 1, "sku-a", ts(103)), // within 10s of order 1
      OrderDetail(12, 1, "sku-b", ts(150)), // outside 10s -> no match
      OrderDetail(21, 2, "sku-c", ts(195))) // within 10s of order 2
    q.processAllAvailable()
    q.stop()
    val got = spark.table("j1").as[(Long, String, String)].collect().toSet
    assert(got == Set((11L, "sku-a", "alice"), (21L, "sku-c", "bob")))
  }

  test("J2: left outer join emits null padding after the watermark closes") {
    import spark.implicits._
    val details = MemoryStream[OrderDetail](spark)
    val activities = MemoryStream[OrderInfo](spark) // stands in for order_detail_activity
    val joined = Joins.streamStream(
      details.toDF().withWatermark("ts", "1 seconds"),
      activities.toDF().withWatermark("ts", "1 seconds"),
      "order_id", "id", "ts", "ts", lowerSec = 5, upperSec = 5, joinType = "leftOuter")
      .select($"detail_id", $"user")
    val q = joined.writeStream.format("memory").queryName("j2")
      .outputMode(OutputMode.Append).start()
    details.addData(OrderDetail(11, 1, "sku-a", ts(100)), OrderDetail(12, 2, "sku-b", ts(100)))
    activities.addData(OrderInfo(1, "act-1", ts(101)))
    q.processAllAvailable()
    // watermark far past the join window: unmatched detail 12 must flush
    details.addData(OrderDetail(99, 9, "sentinel", ts(500)))
    activities.addData(OrderInfo(999, "sentinel", ts(500)))
    q.processAllAvailable()
    details.addData(OrderDetail(98, 8, "sentinel2", ts(600)))
    activities.addData(OrderInfo(998, "sentinel2", ts(600)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("j2").as[(Long, Option[String])].collect().toMap
    assert(got(11L).contains("act-1"))
    assert(got.contains(12L) && got(12L).isEmpty, s"unmatched row not flushed: $got")
  }

  test("J3: lookup join decodes dictionary codes via broadcast snapshot") {
    import spark.implicits._
    val stream = MemoryStream[OrderDetail](spark)
    val baseDic = Seq(("sku-a", "Widget"), ("sku-b", "Gadget")).toDF("dic_code", "dic_name")
    val joined = Joins.lookup(stream.toDF(), baseDic, col("sku") === col("dic_code"), "left")
      .select($"detail_id", $"dic_name")
    val q = joined.writeStream.format("memory").queryName("j3")
      .outputMode(OutputMode.Append).start()
    stream.addData(OrderDetail(1, 1, "sku-a", ts(1)), OrderDetail(2, 1, "sku-x", ts(2)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("j3").as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> Some("Widget"), 2L -> None))
  }

  test("J1+J2+J3 chained: the 5-table order-detail wide row in streaming form") {
    import spark.implicits._
    // the reference's DwdTradeOrderDetail: detail ⋈ info (inner),
    // leftOuter activity, broadcast dictionary decode — chained
    // stateful operators in one streaming query
    val details = MemoryStream[OrderDetail](spark)
    val infos = MemoryStream[OrderInfo](spark)
    val activities = MemoryStream[OrderInfo](spark)
    val baseDic = Seq(("sku-a", "Widget"), ("sku-b", "Gadget")).toDF("dic_code", "dic_name")

    val inner = Joins.streamStream(
      details.toDF().withWatermark("ts", "1 seconds"),
      infos.toDF().withColumnRenamed("user", "buyer").withColumnRenamed("ts", "its")
        .withWatermark("its", "1 seconds"),
      "order_id", "id", "ts", "its", lowerSec = 10, upperSec = 10)
    val withAct = Joins.streamStream(
      inner.select($"detail_id", $"order_id", $"sku", $"buyer", $"ts"),
      activities.toDF().select($"id".as("act_order"), $"user".as("activity"),
        $"ts".as("ats")).withWatermark("ats", "1 seconds"),
      "order_id", "act_order", "ts", "ats", lowerSec = 10, upperSec = 10,
      joinType = "leftOuter")
    val wide = Joins.lookup(withAct, baseDic, col("sku") === col("dic_code"), "left")
      .select($"detail_id", $"buyer", $"activity", $"dic_name")

    val q = wide.writeStream.format("memory").queryName("wide5")
      .outputMode(OutputMode.Append).start()
    infos.addData(OrderInfo(1, "alice", ts(100)), OrderInfo(2, "bob", ts(100)))
    details.addData(OrderDetail(11, 1, "sku-a", ts(101)), OrderDetail(21, 2, "sku-x", ts(101)))
    activities.addData(OrderInfo(1, "double11", ts(102))) // order 1 only
    q.processAllAvailable()
    // flush the outer join: advance all watermarks far past the bound
    details.addData(OrderDetail(99, 9, "s", ts(500)))
    infos.addData(OrderInfo(9, "s", ts(500)))
    activities.addData(OrderInfo(9, "s", ts(500)))
    q.processAllAvailable()
    details.addData(OrderDetail(98, 8, "s", ts(600)))
    infos.addData(OrderInfo(8, "s", ts(600)))
    activities.addData(OrderInfo(8, "s", ts(600)))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("wide5")
      .filter($"detail_id" < 90)
      .as[(Long, String, Option[String], Option[String])].collect().toSet
    assert(got == Set(
      (11L, "alice", Some("double11"), Some("Widget")),
      (21L, "bob", None, None)), s"got=$got")
  }

  test("J6: interval join between(-5s, +5s) both directions") {
    import spark.implicits._
    val a = MemoryStream[OrderInfo](spark)
    val b = MemoryStream[OrderInfo](spark)
    val joined = Joins.interval(
      a.toDF().withColumnRenamed("user", "ua").withWatermark("ts", "1 seconds"),
      b.toDF().withColumnRenamed("user", "ub").withWatermark("ts", "1 seconds"),
      "id", "id", "ts", "ts", boundSec = 5)
      .select($"ua", $"ub")
    val q = joined.writeStream.format("memory").queryName("j6")
      .outputMode(OutputMode.Append).start()
    a.addData(OrderInfo(1, "a-early", ts(100)), OrderInfo(2, "a-late", ts(300)))
    b.addData(OrderInfo(1, "b-within-after", ts(104)), OrderInfo(2, "b-outside", ts(310)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("j6").as[(String, String)].collect().toSet
    assert(got == Set(("a-early", "b-within-after")))
  }

  test("J1/J2 state is watermark-BOUNDED: numRowsTotal plateaus under sustained input and recovers across restart") {
    // r13 verdict task 2: the reference keeps 3-day idle join state
    // (DwdTradeOrderDetail.java:26); the Spark form CLAIMS the
    // watermark + range predicate bound it. Drive enough micro-batches
    // that eviction must occur and measure the claim through
    // StreamingQueryProgress.stateOperators rather than asserting it
    // from the docs. leftOuter is the stricter case (it additionally
    // tracks unmatched rows for null padding).
    import spark.implicits._
    val details = MemoryStream[OrderDetail](spark)
    val infos = MemoryStream[OrderInfo](spark)
    val ckpt = java.nio.file.Files.createTempDirectory("j_state_ck").toString
    def build() = Joins.streamStream(
      details.toDF().withWatermark("ts", "2 seconds"),
      infos.toDF().withWatermark("ts", "2 seconds"),
      "order_id", "id", "ts", "ts", lowerSec = 10, upperSec = 10,
      joinType = "leftOuter")
      .select($"detail_id", $"user")
    // foreachBatch sink: the memory sink refuses checkpoint recovery
    def start() = build().writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) => b.count(); () }
      .start()

    // each batch: 2 details (one joins, one stays unmatched until the
    // watermark closes it) + 1 info, 100 s apart — far past the ±10 s
    // bound + 2 s delay, so every batch's state is evictable by the next
    def feed(i: Int): Unit = {
      val t = 1000L + i * 100L
      details.addData(OrderDetail(i * 10L, i.toLong, "sku", ts(t)),
        OrderDetail(i * 10L + 1, 100000L + i, "orphan", ts(t)))
      infos.addData(OrderInfo(i.toLong, s"user-$i", ts(t + 3)))
    }
    def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)

    val q1 = start()
    val totals = (0 until 12).map { i => feed(i); q1.processAllAvailable(); stateRows(q1) }
    q1.stop()
    val fed = 12 * 3
    // plateau: the steady state (warmup excluded) never grows past the
    // early steady state — unbounded state would grow ~3 rows/batch
    val warm = totals.slice(2, 6).max
    assert(totals.drop(6).max <= warm,
      s"join state grew past its early plateau: $totals")
    assert(totals.last <= fed / 3,
      s"final state ${totals.last} is corpus-proportional ($fed rows fed): $totals")
    assert(totals.max > 0, s"state never materialized: $totals")

    // restart from the checkpoint: state must come back AT the plateau
    // (restored, not lost) and keep plateauing, not re-inflate
    val q2 = start()
    val after = (12 until 15).map { i => feed(i); q2.processAllAvailable(); stateRows(q2) }
    q2.stop()
    assert(after.head > 0, s"restart lost the join state: $after")
    assert(after.max <= warm,
      s"state ballooned after restart (plateau $warm): $after")
    info(s"state numRowsTotal per batch: ${totals.mkString(",")} " +
      s"(fed $fed rows); after restart: ${after.mkString(",")}")
  }
}
