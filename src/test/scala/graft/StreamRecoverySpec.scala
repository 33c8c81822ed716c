package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-recovery proofs — the fault-tolerance story the
  * reference left commented out (its apps carry disabled 3–5 s
  * exactly-once HDFS checkpoint configs, e.g.
  * `app/dim/DimApp.java:30-33`): a stopped streaming query restarted
  * from its checkpoint must (1) restore aggregation state from the
  * state store, (2) resume the source from the recorded offsets
  * without reprocessing, and (3) never duplicate rows in the file
  * sink. All three are asserted against plain batch recomputation
  * over the union of both deliveries.
  */
class StreamRecoverySpec extends AnyFunSuite {
  import TestSession._

  private def writeLines(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes("UTF-8"))

  test("stateful restart: counts resume from the state store, not from zero") {
    val inDir = Files.createTempDirectory("rec_in").toString
    val ckpt = Files.createTempDirectory("rec_ck").toString
    val outDir = Files.createTempDirectory("rec_out").toString + "/agg"

    def runOnce(): Unit = {
      val counts = spark.readStream.text(inDir)
        .select(split(col("value"), ",")(0).as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
      val q = counts.writeStream
        .outputMode(OutputMode.Complete)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("overwrite").parquet(outDir); ()
        }
        .start()
      assert(q.awaitTermination(60000), "stream run timed out")
    }

    writeLines(inDir, "a.txt", Seq("a,1", "a,2", "b,3"))
    runOnce() // first incarnation consumes file A, checkpoints state {a:2, b:1}

    writeLines(inDir, "b.txt", Seq("a,4", "c,5"))
    runOnce() // restarted incarnation must see ONLY file B + restored state

    val got = spark.read.parquet(outDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // recovery failure modes this distinguishes: state lost -> a=1;
    // source offsets lost -> double counting -> a=4
    assert(got == Map("a" -> 3L, "b" -> 1L, "c" -> 1L),
      s"restored-state counts wrong: $got")
  }

  test("file sink restart: exactly-once across incarnations (no reprocessing, no dupes)") {
    val inDir = Files.createTempDirectory("rec2_in").toString
    val ckpt = Files.createTempDirectory("rec2_ck").toString
    val outDir = Files.createTempDirectory("rec2_out").toString + "/rows"

    def runOnce(): Unit = {
      val rows = spark.readStream.text(inDir)
        .select(split(col("value"), ",")(0).as("k"),
          split(col("value"), ",")(1).cast("long").as("v"))
      val q = rows.writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .option("path", outDir)
        .trigger(Trigger.AvailableNow())
        .format("parquet")
        .start()
      assert(q.awaitTermination(60000), "stream run timed out")
    }

    writeLines(inDir, "a.txt", Seq("x,1", "y,2"))
    runOnce()
    writeLines(inDir, "b.txt", Seq("z,3"))
    runOnce()

    // reading through the sink's _spark_metadata commit log: exactly
    // the union of both deliveries, each row exactly once
    val got = spark.read.parquet(outDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq(("x", 1L), ("y", 2L), ("z", 3L)), s"sink rows wrong: $got")
  }

  test("stream-stream join state survives restart: a refund acked after the restart still joins") {
    import graft.operators.GmallDwdDb
    import graft.streaming.LogStream
    val inDir = Files.createTempDirectory("rec3_in").toString
    val ckpt = Files.createTempDirectory("rec3_ck").toString
    val outDir = Files.createTempDirectory("rec3_out").toString + "/refund"

    def ri(id: String, order: String, t: Long) =
      s"""{"database":"g","table":"order_refund_info","type":"insert","data":{"id":"$id","user_id":"42","order_id":"$order","sku_id":"7","refund_type":"1101","refund_num":"1","refund_amount":"19.00","refund_reason_type":"1301","refund_reason_txt":"r","create_time":"1995-03-01 00:00:00"},"ts":$t}"""
    def ack(order: String, t: Long) =
      s"""{"database":"g","table":"order_info","type":"update","data":{"id":"$order","order_status":"1005","province_id":"${order.toLong % 25}","operate_time":"1995-03-01 01:00:00"},"old":{"order_status":"1002"},"ts":$t}"""

    val dic = GmallDwdDb.baseDic(spark)
    def runOnce(): Unit = {
      val refund = GmallDwdDb.tradeOrderRefundStreamOn(
        LogStream.maxwellEnvelope(spark.readStream.text(inDir)), dic)
      val q = refund.writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .option("path", outDir)
        .trigger(Trigger.AvailableNow())
        .format("parquet")
        .start()
      assert(q.awaitTermination(120000), "stream run timed out")
    }

    // incarnation 1: r1 acked immediately; r2's ack arrives only AFTER
    // the restart; r3 is never acked (the watermark-flush row)
    writeLines(inDir, "a.jsonl",
      Seq(ri("r1", "41", 100), ack("41", 110), ri("r2", "42", 120), ri("r3", "43", 125)))
    runOnce()
    // incarnation 2: the cross-incarnation ack (needs r2 restored from
    // the join state store) + a far-future sentinel pair to advance
    // both watermarks past the data
    val far = 200L + 3L * 3 * 86400
    writeLines(inDir, "b.jsonl",
      Seq(ack("42", 130), ri("zr1", "901", far), ack("901", far)))
    runOnce()
    // incarnation 3: a second sentinel round — the watermark computed
    // from delivery B only applies to the NEXT batch, which flushes
    // r3's null-padded row
    writeLines(inDir, "c.jsonl", Seq(ri("zr2", "902", 2 * far), ack("902", 2 * far)))
    runOnce()

    val gotDf = spark.read.parquet(outDir).filter(!col("id").startsWith("zr"))
    val got = gotDf.select("id", "order_id", "province_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(got == Seq(
      ("r1", "41", "16"),  // joined within incarnation 1
      ("r2", "42", "17"),  // joined ACROSS the restart — restored join state
      ("r3", "43", null)), // unmatched, flushed exactly once at watermark
      s"recovered refund rows wrong: $got")
    // exactly-once: batch recompute over the union of all deliveries
    import spark.implicits._
    val allLines = Seq(ri("r1", "41", 100), ack("41", 110), ri("r2", "42", 120),
      ri("r3", "43", 125), ack("42", 130)).toDF("value")
    val benv = LogStream.maxwellEnvelope(allLines)
    val want = GmallDwdDb.tradeOrderRefundOn(
        GmallDwdDb.refundInfoSliceOn(benv), GmallDwdDb.refundAckSliceOn(benv), dic)
      .collect().map(_.toString).toSet
    assert(gotDf.collect().map(_.toString).toSet == want,
      "recovered store != batch over the union of deliveries")
  }

  test("compacted snapshot: dailyFlags state -> parquet -> bootstrap a FRESH query ≡ uncut run") {
    // The 100 TB story for SEMANTICALLY unbounded keyed state (D4's
    // lifetime-first / last-visit dates admit no TTL): snapshot the
    // state store to columnar, bootstrap the next incarnation from the
    // snapshot instead of dragging one ever-growing checkpoint across
    // every restart. The proof: phase1 → snapshot → NEW checkpoint
    // seeded from the snapshot → phase2 emits exactly what the uncut
    // run emits, and a bootstrap-less fresh query provably does NOT.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Stateful
    import graft.streaming.Stateful.{FlaggedEvent, UserEvent}
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    // phase 2 is flag-sensitive to phase-1 state: u1's d1 revisit must
    // NOT be daily-first but must still be lifetime-new; u1's d2 visit
    // is daily-first but NOT new; u3 is brand new
    val (d1, d2, d3) = ("2024-01-01", "2024-01-02", "2024-01-03")
    val phase1 = Seq(
      UserEvent(1, 1, ts(0), d1, 1), UserEvent(1, 2, ts(60), d1, 0),
      UserEvent(2, 3, ts(30), d1, 1))
    val phase2 = Seq(
      UserEvent(1, 4, ts(7200), d1, 0), UserEvent(1, 5, ts(86400), d2, 1),
      UserEvent(2, 6, ts(2 * 86400), d3, 1), UserEvent(3, 7, ts(86500), d2, 1))

    def run(name: String, batches: Seq[Seq[UserEvent]],
            mk: org.apache.spark.sql.Dataset[UserEvent] => org.apache.spark.sql.Dataset[FlaggedEvent])
        : (Set[(Long, Long, Int, Int)], String) = {
      val ckpt = Files.createTempDirectory(s"snap_ck_$name").toString
      val mem = MemoryStream[UserEvent](spark)
      val q = mk(mem.toDS()).writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      q.stop()
      (spark.table(name).select("user_id", "event_id", "is_daily_first", "is_new")
        .as[(Long, Long, Int, Int)].collect().toSet, ckpt)
    }

    val (uncut, _) = run("snap_uncut", Seq(phase1, phase2), Stateful.dailyFlags)
    val (out1, ckpt1) = run("snap_p1", Seq(phase1), Stateful.dailyFlags)

    // snapshot the STOPPED query's state store -> parquet -> read back
    // (the parquet hop is the point: columnar, compactable, survives
    // the checkpoint's deletion)
    val snapDir = Files.createTempDirectory("snap_pq").toString + "/visit_state"
    Stateful.visitStateSnapshot(spark, ckpt1).write.parquet(snapDir)
    val snapshot = spark.read.parquet(snapDir).as[Stateful.VisitSnapshot]
    assert(snapshot.count() === 2, "one compacted row per user seen in phase 1")
    assert(snapshot.collect().map(s => s.user_id -> (s.first_dt, s.last_dt)).toMap ===
      Map(1L -> (d1, d1), 2L -> (d1, d1)))

    // fresh query (NEW checkpoint, empty state store), seeded from the
    // snapshot, fed ONLY phase 2
    val (out2, _) = run("snap_p2", Seq(phase2),
      (ds: org.apache.spark.sql.Dataset[UserEvent]) => Stateful.dailyFlagsFrom(ds, snapshot))
    assert(out1 ++ out2 === uncut,
      "snapshot-bootstrapped restart must emit exactly the uncut run's rows")

    // teeth: WITHOUT the bootstrap the same phase-2 feed mislabels
    // u1's revisit as daily-first/new-user — state genuinely mattered
    val (bare, _) = run("snap_bare", Seq(phase2), Stateful.dailyFlags)
    assert(bare !== uncut -- out1, "control: a bootstrap-less fresh query must diverge")
  }

  test("compacted snapshot: SCD2 open-version state -> parquet -> bootstrap a FRESH query ≡ uncut run") {
    // The OTHER semantically unbounded keyed state named in SCALE.md:
    // the streaming SCD2 maintainer's open-version row (closing a
    // version is meaningful however late the next CDC mutation lands,
    // so no TTL is sound). Same proof shape as the dailyFlags case:
    // phase1 → snapshot → NEW checkpoint seeded from it → phase2
    // equals the uncut run, and a bootstrap-less control diverges.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Scd2
    import graft.operators.Scd2.{VersionEvent, VersionRow}
    import spark.implicits._
    // phase 2 is state-sensitive: order 1's third status must CLOSE the
    // version opened in phase 1 (version_num continuity 2 → 3) and
    // order 2's first update must close its phase-1 insert
    val phase1 = Seq(
      VersionEvent(1, "u1", "1001", "2024-01-01 00:00:00", "insert"),
      VersionEvent(1, "u1", "1002", "2024-01-01 08:00:00", "update"),
      VersionEvent(2, "u2", "1001", "2024-01-01 09:00:00", "insert"))
    val phase2 = Seq(
      VersionEvent(1, "u1", "1004", "2024-01-02 10:00:00", "update"),
      VersionEvent(2, "u2", "1003", "2024-01-02 11:00:00", "update"),
      VersionEvent(3, "u3", "1001", "2024-01-02 12:00:00", "insert"))

    def run(name: String, batches: Seq[Seq[VersionEvent]],
            mk: org.apache.spark.sql.Dataset[VersionEvent] => org.apache.spark.sql.Dataset[VersionRow])
        : (Set[VersionRow], String) = {
      val ckpt = Files.createTempDirectory(s"scd2_ck_$name").toString
      val mem = MemoryStream[VersionEvent](spark)
      val q = mk(mem.toDS()).writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      q.stop()
      (spark.table(name).as[VersionRow].collect().toSet, ckpt)
    }

    // the sink contract: per (order_id, version_num) keep the smallest
    // valid_to — corrections always shrink it
    def atRest(rows: Set[VersionRow]): Set[VersionRow] =
      rows.groupBy(r => (r.order_id, r.version_num))
        .values.map(_.minBy(_.valid_to)).toSet

    val (uncut, _) = run("scd2_uncut", Seq(phase1, phase2), Scd2.versionStream)
    val (out1, ckpt1) = run("scd2_p1", Seq(phase1), Scd2.versionStream)

    val snapDir = Files.createTempDirectory("scd2_pq").toString + "/version_state"
    Scd2.versionStateSnapshot(spark, ckpt1).write.parquet(snapDir)
    val snapshot = spark.read.parquet(snapDir).as[Scd2.VersionSnapshot]
    assert(snapshot.count() === 2, "one compacted open-version row per order seen in phase 1")
    assert(snapshot.collect().map(s => s.order_id -> (s.ver, s.order_status)).toMap ===
      Map(1L -> ((2L, "1002")), 2L -> ((1L, "1001"))))

    val (out2, _) = run("scd2_p2", Seq(phase2),
      (ds: org.apache.spark.sql.Dataset[VersionEvent]) => Scd2.versionStreamFrom(ds, snapshot))
    assert(atRest(out1 ++ out2) === atRest(uncut),
      "snapshot-bootstrapped restart must reconstruct exactly the uncut run's at-rest history")

    // teeth: a bootstrap-less fresh query restarts version_num at 1 and
    // never closes phase-1's open rows
    val (bare, _) = run("scd2_bare", Seq(phase2), Scd2.versionStream)
    assert(atRest(out1 ++ bare) !== atRest(uncut),
      "control: a bootstrap-less fresh query must diverge")
  }
}
