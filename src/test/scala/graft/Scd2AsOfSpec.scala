package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GmallDwdDb, Scd2}

/** Semantics gates for the SCD2 history and the as-of join: the DuckDB
  * oracles prove engine ≡ SQL on the fixture; these prove the SQL means
  * what the scaladoc claims, including interval edges the fixture never
  * hits (a fact older than its key's first version).
  */
class Scd2AsOfSpec extends AnyFunSuite {
  import TestSession._

  private lazy val env = GmallDwdDb.envelope(spark, sf)

  test("SCD2 invariants: contiguous versions, chained intervals, one current row per key") {
    import spark.implicits._
    val h = Scd2.orderStatusHistoryOn(env)
      .select("order_id", "version_num", "order_status", "valid_from", "valid_to")
      .as[(Long, Long, String, String, String)].collect()
      .groupBy(_._1)
    assert(h.nonEmpty)
    h.foreach { case (oid, vs) =>
      val sorted = vs.sortBy(_._2)
      // versions count up from 1 with no gaps
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"order $oid")
      // intervals chain: each version ends where the next begins
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 == b._4, s"order $oid gap $a -> $b")
        case _ =>
      }
      // exactly the last version is open
      assert(sorted.last._5 == Scd2.EndOfTime, s"order $oid last not current")
      assert(sorted.init.forall(_._5 != Scd2.EndOfTime), s"order $oid two currents")
      // every key's history starts at the insert status
      assert(sorted.head._3 == "1001", s"order $oid first version ${sorted.head._3}")
      // the fixture's update rules decide the final status
      val expLast = if (oid % 20 == 3 || oid % 20 == 13) "1005"
      else if (oid % 20 == 7 || oid % 20 == 17) "1003" else "1001"
      assert(sorted.last._3 == expLast, s"order $oid final status")
    }
  }

  test("as-of join edges: before-first, on-boundary, inside, open-interval") {
    import spark.implicits._
    // key 1: two versions [t2,t4) and [t4,inf); key 2: one version
    val hist = Seq(
      (1L, 1L, "A", "2024-01-02 00:00:00", "2024-01-04 00:00:00"),
      (1L, 2L, "B", "2024-01-04 00:00:00", Scd2.EndOfTime),
      (2L, 1L, "C", "2024-01-01 00:00:00", Scd2.EndOfTime)
    ).toDF("k", "version_num", "order_status", "valid_from", "valid_to")
    val facts = Seq(
      (10L, 1L, "2024-01-01 12:00:00"), // before first version -> no match
      (11L, 1L, "2024-01-02 00:00:00"), // exactly valid_from -> v1 (closed start)
      (12L, 1L, "2024-01-03 23:59:59"), // inside v1
      (13L, 1L, "2024-01-04 00:00:00"), // exactly v2 start -> v2 (open end of v1)
      (14L, 1L, "2030-06-06 06:06:06"), // far future -> open interval v2
      (15L, 2L, "2024-05-05 00:00:00"), // single-version key
      (16L, 3L, "2024-05-05 00:00:00")  // unknown key -> no match
    ).toDF("fact_id", "k", "t")
    val got = Scd2.asOfJoin(facts, hist, "k", col("t"))
      .select(col("fact_id"), col("order_status"), col("version_num"))
      .as[(Long, Option[String], Option[Long])].collect().sortBy(_._1)
    val exp = Seq(
      (10L, None, None), (11L, Some("A"), Some(1L)), (12L, Some("A"), Some(1L)),
      (13L, Some("B"), Some(2L)), (14L, Some("B"), Some(2L)),
      (15L, Some("C"), Some(1L)), (16L, None, None))
    assert(got.toSeq == exp)
    // disjoint intervals guarantee: no fact row duplicated by the join
    assert(got.length == 7)
  }

  test("as-of equals the classic latest-version-at-or-before rule on the fixture") {
    import spark.implicits._
    // independent formulation: for each detail take the max version
    // with valid_from <= t; facts OLDER than their key's first version
    // (the synthetic shipdates are not constrained to follow the order
    // date) must surface as the explicit n/a row, never silently drop
    val details = GmallDwdDb.orderDetailSliceOn(env)
      .select(col("order_detail_id"),
        col("order_id").cast("long").as("order_id"),
        col("order_create_time"))
    val hist = Scd2.orderStatusHistoryOn(env)
    val backward = details.join(hist, Seq("order_id"))
      .filter(col("order_create_time") >= col("valid_from"))
      .groupBy(col("order_detail_id"))
      .agg(max(struct(col("version_num"), col("order_status"))).as("m"))
      .select(col("order_detail_id"), col("m.order_status").as("s"),
        col("m.version_num").as("v"))
      .as[(String, String, Long)].collect().sortBy(_._1)
    val asof = Scd2.orderDetailAsOfOn(env)
      .select(col("order_detail_id"), col("asof_status"), col("asof_version"))
      .as[(String, String, Long)].collect().sortBy(_._1)
    val (matched, na) = asof.partition(_._3 > 0L)
    assert(matched.toSeq == backward.toSeq)
    // the n/a rows are exactly the facts preceding their first version
    val first = hist.filter(col("version_num") === 1L)
      .select(col("order_id"), col("valid_from"))
    val expNa = details.join(first, Seq("order_id"))
      .filter(col("order_create_time") < col("valid_from"))
      .select(col("order_detail_id")).as[String].collect().sorted
    assert(na.map(_._1).toSeq == expNa.toSeq)
    assert(na.forall(r => r._2 == "n/a" && r._3 == 0L))
    // all three outcomes occur on real data
    assert(matched.exists(_._3 == 1L) && matched.exists(_._3 == 2L) && na.nonEmpty)
  }

  test("streaming SCD2 maintenance: upsert-merged version rows == batch history") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    // per-key in-order delivery (the Kafka key-partitioning contract):
    // a global (valid_from, typ) sort implies per-key order
    val events = Scd2.versionEventsOn(env).collect()
      .sortBy(e => (e.valid_from, e.typ))
    val mem = MemoryStream[Scd2.VersionEvent](spark)
    val q = Scd2.versionStream(mem.toDS())
      .writeStream.format("memory").queryName("scd2_stream")
      .outputMode(OutputMode.Append).start()
    events.grouped(700).foreach { chunk =>
      mem.addData(chunk.toSeq); q.processAllAvailable()
    }
    q.stop()
    // the upsert sink's merge rule: smallest valid_to per (key, version)
    val got = spark.table("scd2_stream")
      .groupBy(col("order_id"), col("version_num"))
      .agg(min(struct(col("valid_to"), col("user_id"), col("order_status"),
        col("valid_from"))).as("m"))
      .select(col("order_id"), col("version_num"), col("m.user_id"),
        col("m.order_status"), col("m.valid_from"), col("m.valid_to"))
      .collect().map(_.toString).toSet
    val want = Scd2.orderStatusHistoryOn(env)
      .select("order_id", "version_num", "user_id", "order_status",
        "valid_from", "valid_to")
      .collect().map(_.toString).toSet
    assert(want.nonEmpty && got == want,
      s"streaming SCD2 diverged: ${got.size} vs ${want.size} rows")
    // corrections really happened: some version was first emitted open,
    // then closed by a later micro-batch (or in-batch successor)
    assert(spark.table("scd2_stream").count() > want.size)
  }

  test("as-of join plans as a keyed join with residual interval, never a nested loop") {
    val details = GmallDwdDb.orderDetailSliceOn(env)
      .select(col("order_detail_id"),
        col("order_id").cast("long").as("order_id"),
        col("order_create_time"))
    val hist = Scd2.orderStatusHistoryOn(env)
      .select("order_id", "version_num", "order_status", "valid_from", "valid_to")
    val plan = Scd2.asOfJoin(details, hist, "order_id", col("order_create_time"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(2000))
  }
}
