package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Shared per-(session, dir, name) DataFrame memoization with persist —
  * the batch analog of the reference's shared DWD Kafka topics: each
  * derived frame (pageLog, orderWide, the CDC envelope fixture, ...) is
  * computed once per session+dir and read by every downstream query.
  *
  * One store for all operator modules, so a backfill that rewrites a
  * dir invalidates EVERY cached frame derived from it with one call —
  * split per-module stores would leave the other module's entries
  * stale. Cached frames snapshot the parquet at first access. */
private[graft] object Memo {
  private val memo =
    scala.collection.concurrent.TrieMap[(SparkSession, String, String), DataFrame]()

  /** Session conf key selecting the persist level for memoized frames
    * (any [[StorageLevel]] name; also settable per-process via the
    * `SPARK_GRAFT_MEMO_LEVEL` env through [[graft.GraftSession]]).
    *
    * Default `MEMORY_AND_DISK` — the cached-columnar level every
    * measured bench number uses. The level is NOT a small-heap escape
    * hatch, and round 15 measured why: `df.persist` at ANY block
    * level builds cached-columnar batches in executor heap
    * (`CompressibleColumnBuilder.appendFrom` + dictionary stats)
    * before the finished blocks reach the store, so 32 concurrent
    * batch builders over a wide corpus-scale frame exceed a 12 GB
    * heap no matter where the blocks will land — the sf10eq leg dies
    * at 12 GB under MEMORY_AND_DISK (storage-pool unroll thrash, the
    * r14-captured `PartiallyUnrolledIterator` signature) AND under
    * `DISK_ONLY` (uncaught heap OOM inside the columnar build),
    * salted or not (SCALE.md round-15 "12 GB memory finding", 2×2
    * measured, full stderr kept). `DISK_ONLY` remains useful when the
    * batches FIT at build time and only the accumulated surface ×
    * re-read concurrency is the problem, or for frames that must stay
    * session-private. The mode that actually survives a small heap is
    * `PARQUET` below: columnar FILES written through bounded
    * row-group writers, no cached-batch heap residency at all. On a
    * real cluster the storage pool is the fleet's aggregate memory
    * and the default stands. */
  val LevelConf = "spark.graft.memo.storageLevel"

  /** `NONE` disables memo persistence entirely: the frame is still
    * built (and map-memoized, so every consumer shares ONE plan) but
    * each action recomputes it from source. Footprint becomes
    * execution-memory-only; cost is the cold path EVERY TIME — and for
    * the CDC envelope that cost is multiplicative (a query referencing
    * the envelope N times re-derives and re-parses it N times per
    * action; measured: the flagship at a mere sf0.1 burned 4 CPU-hours
    * before being killed). NONE is kept only as the
    * zero-footprint diagnostic mode; the mode that matches what a
    * cluster actually does with a corpus-sized shared surface is
    * `PARQUET` below. */

  /** `PARQUET` materializes each memo frame to columnar storage ONCE
    * (under [[DirConf]]) and re-reads it thereafter — the batch analog
    * of the reference's materialized DWD Kafka topics
    * (`MyKafkaUtil.java:24-56` consumers re-read a topic the producer
    * wrote once; nobody re-derives DWD from ODS per query). Unlike
    * heap/disk persist the footprint is compressed columnar (the
    * sf10eq envelope's ~75 GB DISK_ONLY block store is ~3 GB as
    * parquet), it survives the JVM (per-query processes amortize one
    * build, as Kafka consumers do), and re-reads get row-group
    * pruning + column pushdown instead of block deserialization. The
    * store is a CACHE keyed by source dir: a dir backfill must call
    * [[invalidate]] (which deletes the materialization) — same staleness
    * contract as the persist levels. Everything lives under a
    * `graft.materialized/` segment of this root, so invalidation never
    * touches unrelated contents of a user-supplied directory; the
    * single-writer commit protocol is documented on [[materialize]]. */
  val DirConf = "spark.graft.memo.parquetDir"

  /** Guard policy for the measured small-heap law (SCALE.md round-15
    * "12 GB memory finding"): block-store persist at ANY level builds
    * cached-columnar batches in heap across every executor thread, so
    * below ~[[MinHeapPerTaskBytes]] heap per task the BUILD alone
    * OOMs regardless of where blocks land — the only level that
    * survives is `PARQUET`. Values: `warn` (default — loud log line,
    * level honored), `auto` (switch the implicit DEFAULT level to
    * PARQUET; an explicitly configured level is always honored, so
    * measurement tooling that sets `DISK_ONLY` on purpose still
    * measures `DISK_ONLY`), `off`. */
  val HeapGuardConf = "spark.graft.memo.heapGuard"

  /** The 12 GB / 32-thread config died (375 MB/task); 96 GB / 32
    * (3 GB/task) is the known-good envelope. The line sits just above
    * the measured-fatal point with margin for narrower frames. */
  val MinHeapPerTaskBytes: Long = 512L * 1024 * 1024

  /** The policy table, pure so MemoSpec can pin it without forging a
    * small JVM: (level to use, whether to emit the loud warning). */
  private[operators] def guardDecision(explicitLevel: Option[String], guard: String,
                                       heapBytes: Long, taskThreads: Int): (String, Boolean) = {
    val level = explicitLevel.getOrElse("MEMORY_AND_DISK")
    val blockStore = level != "PARQUET" && level != "NONE"
    val starved = heapBytes / math.max(1, taskThreads) < MinHeapPerTaskBytes
    if (!blockStore || !starved || guard == "off") (level, false)
    else if (guard == "auto" && explicitLevel.isEmpty) ("PARQUET", true)
    else (level, true)
  }

  private val warnedSessions =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** The level [[apply]] will actually use for `spark` after the heap
    * guard — surfaced so measurement artifacts (Bench JSON) can record
    * the RESOLVED level, not just the configured one, when `auto`
    * rewrites the implicit default. */
  private[graft] def resolvedLevel(spark: SparkSession): String =
    effectiveLevel(spark)

  private def effectiveLevel(spark: SparkSession): String = {
    val explicitLevel =
      Option(spark.conf.get(LevelConf, null)).filter(_.nonEmpty)
    val (level, warn) = guardDecision(explicitLevel,
      spark.conf.get(HeapGuardConf, "warn"),
      Runtime.getRuntime.maxMemory, spark.sparkContext.defaultParallelism)
    if (warn && warnedSessions.add(spark))
      System.err.println(
        s"[graft] Memo heap guard: heap/task is below ${MinHeapPerTaskBytes >> 20} MB " +
          s"and the memo level resolves to '${explicitLevel.getOrElse("MEMORY_AND_DISK")}'. " +
          "Block-store persist builds cached-columnar batches in heap on every task " +
          "thread and OOMs at this ratio no matter where blocks land (measured: " +
          "SCALE.md '12 GB memory finding'). " +
          (if (level == "PARQUET") "Auto-selected the PARQUET memo level instead."
           else s"Set $LevelConf=PARQUET (or $HeapGuardConf=auto) to survive, " +
             s"or $HeapGuardConf=off to silence."))
    level
  }

  private def levelFor(spark: SparkSession): Option[StorageLevel] =
    effectiveLevel(spark) match {
      case "NONE" => None
      case s => Some(StorageLevel.fromString(s))
    }

  /** All materializations live under a graft-owned segment of the
    * configured root, so [[invalidate]]'s recursive deletes can only
    * ever touch graft's own files — a `DirConf` (or
    * `SPARK_GRAFT_MEMO_DIR`) pointed at a directory with unrelated
    * contents loses nothing but this subtree. */
  private def parquetRoot(spark: SparkSession): String =
    spark.conf.get(DirConf, sys.props("java.io.tmpdir") + "/graft-memo") +
      "/graft.materialized"

  private def parquetPath(spark: SparkSession, dir: String, name: String) =
    new org.apache.hadoop.fs.Path(
      s"${parquetRoot(spark)}/${dir.replaceAll("[^A-Za-z0-9._-]", "_")}/$name")

  /** One lock object per materialization path: builds are eager
    * multi-second write jobs, so they must not run under the global
    * memo lock (it would serialize UNRELATED builds), but two
    * same-key builds in one JVM must never overlap — they'd tear each
    * other's tmp dir and double-write the commit. Bounded by the
    * number of distinct (dir, name) keys, i.e. tiny. */
  private val buildLocks =
    scala.collection.concurrent.TrieMap[String, Object]()

  /** Build-and-commit (or read-back) the materialized form of a memo
    * frame. Same-JVM races are serialized per key (the second thread
    * waits, then reads the first's commit). Cross-JVM races (per-query
    * bench processes) are resolved by tmp+rename with a fail-on-
    * existing rename: tmp names carry pid AND thread id, a winner
    * committed while we built is detected before the rename, and the
    * rename itself goes through `FileContext` with `Rename.NONE`
    * semantics — it THROWS if the destination appeared in the window,
    * rather than silently moving tmp INSIDE the committed dir the way
    * `FileSystem.rename` does on HDFS/RawLocal (which would duplicate
    * every later read). Losers delete their tmp and read the winner. */
  private def materialize(spark: SparkSession, dir: String, name: String)
                         (build: => DataFrame): DataFrame = {
    val path = parquetPath(spark, dir, name)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = path.getFileSystem(conf)
    val committed = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val lock = buildLocks.getOrElseUpdate(path.toString, new Object)
    lock.synchronized {
      if (!fs.exists(committed)) {
        val tmp = new org.apache.hadoop.fs.Path(
          path.getParent, path.getName + ".tmp." +
            ProcessHandle.current().pid() + "." + Thread.currentThread().getId)
        build.write.mode("overwrite").parquet(tmp.toString)
        if (fs.exists(committed)) {
          fs.delete(tmp, true) // another process committed while we built
        } else {
          try {
            fs.mkdirs(path.getParent)
            org.apache.hadoop.fs.FileContext.getFileContext(path.toUri, conf)
              .rename(tmp, path) // Rename.NONE: throws if path exists
          } catch {
            case e: java.io.IOException =>
              fs.delete(tmp, true)
              if (!fs.exists(committed)) throw new IllegalStateException(
                s"memo materialize: rename to $path failed with no committed winner", e)
          }
        }
      }
    }
    spark.read.parquet(path.toString)
  }

  // Single lock around the build: TrieMap.getOrElseUpdate does not
  // guarantee single evaluation of the by-name default, and a losing
  // persist() would leak cached blocks with no handle to unpersist.
  // Builds are cheap plan constructions (the expensive part — the job —
  // runs lazily later), so one coarse lock beats per-key striping.
  /** Opportunistically drop entries pinned to stopped sessions so the
    * maps don't retain dead SparkSessions for the JVM's lifetime.
    * TrieMap iteration is concurrent-safe, so this runs lock-free in
    * BOTH apply branches (the PARQUET one included). */
  private def sweepStopped(): Unit = {
    memo.keys.toSeq
      .filter { case (s, _, _) => s.sparkContext.isStopped }
      .foreach(memo.remove)
    values.keys.toSeq
      .filter { case (s, _, _) => s.sparkContext.isStopped }
      .foreach(values.remove)
    // the heap-guard warn set also pins sessions strongly — purge
    // stopped ones here too, or a long-lived multi-session JVM (the
    // test suite) retains every dead SparkSession it ever warned on
    warnedSessions.removeIf(_.sparkContext.isStopped)
  }

  def apply(spark: SparkSession, dir: String, name: String)
           (build: => DataFrame): DataFrame = {
    val key = (spark, dir, name)
    memo.get(key).getOrElse {
      sweepStopped()
      if (effectiveLevel(spark) == "PARQUET") {
        // eager write job — must not run under the global lock
        // (materialize serializes per KEY instead)
        val df = materialize(spark, dir, name)(build)
        // a concurrent invalidate()/sweepStopped() (lock-free) can
        // remove the key between putIfAbsent and a re-read — return
        // the race winner (or our own df) without touching the map again
        memo.putIfAbsent(key, df).getOrElse(df)
      } else synchronized {
        memo.getOrElseUpdate(key,
          levelFor(spark).fold(build)(l => build.persist(l)))
      }
    }
  }

  // Driver-side VALUE memo (k-means models, other small derived
  // objects) sharing the frame store's key scheme and lifecycle, so
  // one invalidate() call clears BOTH — a split per-module store would
  // serve stale models after a dir backfill. Unlike frame builds,
  // value builds run eager Spark actions (seconds), so they run
  // OUTSIDE any lock: a racing duplicate build wastes work but leaks
  // nothing (no persist), and putIfAbsent makes one winner visible.
  private val values =
    scala.collection.concurrent.TrieMap[(SparkSession, String, String), Any]()

  def value[T](spark: SparkSession, dir: String, name: String)(build: => T): T = {
    val key = (spark, dir, name)
    values.get(key) match {
      case Some(v) => v.asInstanceOf[T]
      case None =>
        val built = build
        values.putIfAbsent(key, built)
        values(key).asInstanceOf[T]
    }
  }

  /** Drop (and unpersist) every memoized frame — and drop every
    * memoized value — for `dir` (all dirs if None) in this session,
    * across all modules. Under the `PARQUET` level this also deletes
    * the on-disk materializations for `dir` (they are a cache keyed by
    * the source dir; after a backfill they are stale data, not a
    * cache-warm bonus). */
  def invalidate(spark: SparkSession, dir: Option[String]): Unit = {
    memo.keys.toSeq
      .filter { case (s, d, _) => s == spark && dir.forall(_ == d) }
      .foreach { k => memo.remove(k).foreach(_.unpersist()) }
    values.keys.toSeq
      .filter { case (s, d, _) => s == spark && dir.forall(_ == d) }
      .foreach(values.remove)
    if (effectiveLevel(spark) == "PARQUET") {
      val root = new org.apache.hadoop.fs.Path(parquetRoot(spark))
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      dir match {
        case Some(d) => fs.delete(new org.apache.hadoop.fs.Path(
          root, d.replaceAll("[^A-Za-z0-9._-]", "_")), true)
        case None => fs.delete(root, true)
      }
    }
  }
}
