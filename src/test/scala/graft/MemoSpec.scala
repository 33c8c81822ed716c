package graft.operators

import graft.TestSession
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** The memo persist-level knob ([[Memo.LevelConf]]) exists because the
  * default cached-columnar level is FAIL-HARD when one JVM's memo
  * surface × task concurrency outgrows heap (SCALE.md "Memory
  * finding": the sf10eq leg OOM'd at the 12 GB default unrolling
  * spilled blocks back into the storage pool). These pin the knob's
  * contract: default unchanged, override honored at build time,
  * results identical either way. */
class MemoSpec extends AnyFunSuite {
  import TestSession.spark

  /** Private dir-key namespace: [[Memo.invalidate]] drops every entry
    * for a dir, and suites share one JVM/session — scoping this
    * suite's keys keeps its invalidations off other suites' memos. */
  private val MemoDir = "/tmp/memospec-keyspace"

  test("default memo persist level is MEMORY_AND_DISK (cached columnar)") {
    val df = Memo(spark, MemoDir, "memospec_default")(
      spark.range(0, 100).toDF("id"))
    try assert(df.storageLevel === StorageLevel.MEMORY_AND_DISK)
    finally Memo.invalidate(spark, Some(MemoDir))
  }

  test(s"${Memo.LevelConf} redirects NEW memo builds; results identical") {
    val expected = (0L until 100L).map(i => i * 3)
    spark.conf.set(Memo.LevelConf, "DISK_ONLY")
    try {
      val df = Memo(spark, MemoDir, "memospec_disk")(
        spark.range(0, 100).selectExpr("id * 3 as v"))
      assert(df.storageLevel === StorageLevel.DISK_ONLY)
      // the level changes WHERE blocks live, never what they hold —
      // run an action so disk-backed re-read actually executes
      assert(df.collect().map(_.getLong(0)).sorted.toSeq === expected)
      assert(df.collect().map(_.getLong(0)).sorted.toSeq === expected)
    } finally {
      spark.conf.unset(Memo.LevelConf)
      Memo.invalidate(spark, Some(MemoDir))
    }
  }

  test("NONE skips persistence: shared plan, zero cache footprint, results identical") {
    spark.conf.set(Memo.LevelConf, "NONE")
    try {
      val df = Memo(spark, MemoDir, "memospec_none")(
        spark.range(0, 100).selectExpr("id * 7 as v"))
      assert(df.storageLevel === StorageLevel.NONE)
      // still map-memoized (one plan for all consumers) ...
      assert(Memo(spark, MemoDir, "memospec_none")(
        fail("memo hit must not rebuild")) eq df)
      // ... and every action recomputes from source, same answer
      val expected = (0L until 100L).map(_ * 7)
      assert(df.collect().map(_.getLong(0)).sorted.toSeq === expected)
      assert(df.collect().map(_.getLong(0)).sorted.toSeq === expected)
    } finally {
      spark.conf.unset(Memo.LevelConf)
      Memo.invalidate(spark, Some(MemoDir))
    }
  }

  test("PARQUET materializes once, amortizes across sessions (the Kafka-topic analog), and invalidate deletes it") {
    val root = java.nio.file.Files.createTempDirectory("memospec-pq").toString
    var builds = 0
    def inSession(s: org.apache.spark.sql.SparkSession) = {
      s.conf.set(Memo.LevelConf, "PARQUET")
      s.conf.set(Memo.DirConf, root)
      Memo(s, MemoDir, "memospec_pq") {
        builds += 1
        s.range(0, 100).selectExpr("id * 11 as v", "cast(id as string) as k")
      }
    }
    val expected = (0L until 100L).map(_ * 11)
    try {
      val df = inSession(spark)
      assert(builds === 1)
      assert(df.storageLevel === StorageLevel.NONE) // columnar files, not blocks
      assert(df.collect().map(_.getLong(0)).sorted.toSeq === expected)
      assert(df.schema.fieldNames.toSeq === Seq("v", "k"))
      // a SECOND session (the stand-in for a second JVM — per-query
      // bench processes, a restarted service) finds the committed
      // materialization and never rebuilds
      val s2 = spark.newSession()
      val df2 = inSession(s2)
      assert(builds === 1, "second session must read the materialization, not rebuild")
      assert(df2.collect().map(_.getLong(0)).sorted.toSeq === expected)
      // invalidate = backfill contract: the materialization is stale
      // DATA after the source dir changes, so it is deleted, and the
      // next apply rebuilds from source
      Memo.invalidate(spark, Some(MemoDir))
      assert(!new java.io.File(
        s"$root/graft.materialized/${MemoDir.replaceAll("[^A-Za-z0-9._-]", "_")}").exists)
      val df3 = inSession(spark)
      assert(builds === 2, "post-invalidate apply must rebuild")
      assert(df3.collect().map(_.getLong(0)).sorted.toSeq === expected)
    } finally {
      Memo.invalidate(spark, Some(MemoDir))
      spark.conf.unset(Memo.LevelConf); spark.conf.unset(Memo.DirConf)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("racing same-key PARQUET builds commit exactly once and never duplicate rows") {
    // Two sessions (distinct memo keys, so both reach materialize)
    // racing the SAME (dir, name): the per-path build lock serializes
    // them — the loser must find the winner's commit and read it, not
    // build into a shared tmp dir or rename into the committed dir
    // (the HDFS mv-into failure mode: every later read silently
    // doubled). 20 iterations to accumulate interleavings.
    val root = java.nio.file.Files.createTempDirectory("memospec-race").toString
    val builds = new java.util.concurrent.atomic.AtomicInteger
    def inSession(s: org.apache.spark.sql.SparkSession, name: String) = {
      s.conf.set(Memo.LevelConf, "PARQUET")
      s.conf.set(Memo.DirConf, root)
      Memo(s, MemoDir, name) {
        builds.incrementAndGet()
        s.range(0, 1000).selectExpr("id * 13 as v")
      }
    }
    try {
      for (i <- 0 until 20) {
        val name = s"memospec_race_$i"
        val sessions = Seq(spark.newSession(), spark.newSession())
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration._
        val dfs = Await.result(
          Future.sequence(sessions.map(s => Future(inSession(s, name)))), 120.seconds)
        dfs.foreach(df => assert(df.count() === 1000,
          s"iteration $i: a torn/nested commit duplicated or lost rows"))
      }
      assert(builds.get() <= 20,
        s"per-key lock must make the loser read the winner: ${builds.get()} builds for 20 keys")
    } finally {
      spark.conf.set(Memo.LevelConf, "PARQUET"); spark.conf.set(Memo.DirConf, root)
      Memo.invalidate(spark, Some(MemoDir))
      spark.conf.unset(Memo.LevelConf); spark.conf.unset(Memo.DirConf)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("invalidate under PARQUET deletes only the graft-owned subtree of the configured root") {
    val root = java.nio.file.Files.createTempDirectory("memospec-ns").toString
    val unrelated = new java.io.File(root, "precious-user-data.txt")
    java.nio.file.Files.writeString(unrelated.toPath, "do not delete")
    spark.conf.set(Memo.LevelConf, "PARQUET")
    spark.conf.set(Memo.DirConf, root)
    try {
      Memo(spark, MemoDir, "memospec_ns")(spark.range(0, 10).toDF("id")).count()
      assert(new java.io.File(root, "graft.materialized").exists)
      // the all-dirs form is the aggressive one — it must still scope
      // its recursive delete to graft's own segment
      Memo.invalidate(spark, None)
      assert(!new java.io.File(root, "graft.materialized").exists)
      assert(unrelated.exists, "invalidate deleted unrelated user files in the memo root")
    } finally {
      spark.conf.unset(Memo.LevelConf); spark.conf.unset(Memo.DirConf)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("the conf is read per BUILD, not per process: an already-memoized frame keeps its level") {
    val before = Memo(spark, MemoDir, "memospec_sticky")(spark.range(0, 10).toDF("id"))
    spark.conf.set(Memo.LevelConf, "DISK_ONLY")
    try {
      val again = Memo(spark, MemoDir, "memospec_sticky")(
        fail("memo hit must not rebuild"))
      assert(again.storageLevel === StorageLevel.MEMORY_AND_DISK)
      assert(again eq before)
    } finally {
      spark.conf.unset(Memo.LevelConf)
      Memo.invalidate(spark, Some(MemoDir))
    }
  }

  test("heap guard policy: the measured 12 GB small-heap law is operational (SCALE.md memory finding)") {
    val gb = 1024L * 1024 * 1024
    // the measured-fatal shape: 12 GB heap / 32 task threads, any
    // block-store level — warn loudly, honor the level
    assert(Memo.guardDecision(None, "warn", 12 * gb, 32) === (("MEMORY_AND_DISK", true)))
    assert(Memo.guardDecision(Some("DISK_ONLY"), "warn", 12 * gb, 32) === (("DISK_ONLY", true)))
    // auto switches ONLY the implicit default; an explicit level is
    // honored (the decade tooling measures DISK_ONLY on purpose)
    assert(Memo.guardDecision(None, "auto", 12 * gb, 32) === (("PARQUET", true)))
    assert(Memo.guardDecision(Some("DISK_ONLY"), "auto", 12 * gb, 32) === (("DISK_ONLY", true)))
    // the known-good envelope (96 GB / 32 = 3 GB per task) is untouched
    assert(Memo.guardDecision(None, "warn", 96 * gb, 32) === (("MEMORY_AND_DISK", false)))
    assert(Memo.guardDecision(None, "auto", 96 * gb, 32) === (("MEMORY_AND_DISK", false)))
    // PARQUET and NONE have no cached-batch heap residency — never guarded
    assert(Memo.guardDecision(Some("PARQUET"), "warn", 12 * gb, 32) === (("PARQUET", false)))
    assert(Memo.guardDecision(Some("NONE"), "warn", 12 * gb, 32) === (("NONE", false)))
    // off silences but never re-levels
    assert(Memo.guardDecision(None, "off", 12 * gb, 32) === (("MEMORY_AND_DISK", false)))
    // the boundary is heap PER TASK, not absolute heap: 12 GB on 8
    // threads is 1.5 GB/task — above the line
    assert(Memo.guardDecision(None, "warn", 12 * gb, 8) === (("MEMORY_AND_DISK", false)))
  }
}
