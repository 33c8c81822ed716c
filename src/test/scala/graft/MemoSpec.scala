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
}
