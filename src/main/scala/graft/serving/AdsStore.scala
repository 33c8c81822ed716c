package graft.serving

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet publication for foreachBatch-maintained ADS
  * stores — the streaming-deployment store discipline behind
  * [[QueryServer.bindStore]] (SURVEY §3.3): each micro-batch PUBLISHES
  * its recomputed ADS frame as `<root>/v=<version>/` and readers
  * resolve the highest `_SUCCESS`-marked version, so an HTTP request
  * never observes a half-written store. A plain parquet
  * `mode("overwrite")` of one fixed path cannot give that guarantee —
  * it deletes before it writes, and a concurrent read catches the gap.
  * The reference gets the same effect from ClickHouse/Phoenix upserts
  * (`gmall-realtime`'s ClickHouseUtil sink); on a parquet/lakehouse
  * store the version pointer is the equivalent.
  *
  * Scale shape: ADS frames are (days × channel-like keys) — megabytes
  * at any corpus scale — so a full rewrite per micro-batch is the
  * right trade; `keep` bounds disk at two versions (the newest plus
  * one for reads in flight), pruned only after the new version's
  * `_SUCCESS` exists.
  */
object AdsStore {

  /** Bound on how many successive version candidates a publisher will
    * try to claim before failing loudly — only reachable when MANY
    * writers race one root, which is outside any sane deployment. */
  val MaxClaimAttempts = 64

  /** Write `df` as a NEW version under `root`, then prune versions
    * strictly older than the newest `keep` committed ones. Returns the
    * version actually written: `version` normally, the next free
    * number when `version` is not strictly newer — a restarted
    * pipeline whose batch ids reset (fresh checkpoint) or a retried
    * batch must NEVER `overwrite` a committed `v=` directory in place,
    * because that deletes before it writes and a concurrent read would
    * catch the gap this class exists to close. Readers therefore
    * always observe monotonically increasing versions.
    *
    * CONCURRENT publishers (r13 verdict task 4): the bare
    * read-max-then-write scan races — two publishers could pick the
    * same number and co-write one directory. Each candidate version is
    * therefore CLAIMED first via an exclusive marker-file create
    * (`v=<n>.claim`): atomic at the namenode on HDFS-like stores,
    * O_EXCL via java.nio on `file://` (Hadoop's local `create` has a
    * check-then-create window). Exactly one racer wins a number; the
    * loser bumps to the next free number and re-claims, so concurrent
    * publishers commit DISTINCT versions and no update is lost —
    * AdsStoreSpec hammers this with racing threads. A claim whose
    * publisher crashed just skips that number (claims below the keep
    * horizon are pruned with their versions).
    *
    * Pruning deletes only canonical `v=<long>` dirs (and their claim
    * markers) STRICTLY OLDER than the keep horizon — never anything at
    * or above it — so a racing publisher's fresher commit can never be
    * pruned by a slightly-stale keep-set (the old `!keepSet` filter
    * could). Crashed partials are likewise removed once the horizon
    * passes them, keeping disk bounded. */
  def publish(df: DataFrame, root: String, version: Long, keep: Int = 2): Long = {
    val spark = df.sparkSession
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p)
    val committed = versions(spark, root)
    val start = committed.lastOption match {
      case Some(latest) if version <= latest => latest + 1
      case _ => version
    }
    val v = Iterator.range(0, MaxClaimAttempts).map(start + _)
      .find(cand => claim(fs, p, cand))
      .getOrElse(throw new IllegalStateException(
        s"AdsStore.publish: could not claim a version under $root after " +
          s"$MaxClaimAttempts attempts from $start — an unreasonable number " +
          "of concurrent publishers is racing this root"))
    df.write.mode("overwrite").parquet(s"$root/v=$v")
    // prune strictly below the keep horizon (committed versions only
    // define the horizon; the just-written v is committed by now)
    val keepMin = (versions(spark, root) :+ v).distinct.sorted.takeRight(keep).min
    val now = System.currentTimeMillis()
    fs.listStatus(p).toSeq
      // delete only CANONICAL v=<long> names (and their claim files)
      // below the horizon — exactly the names this class writes;
      // "v=007", "v=+5", "v=backup" were not written by it and are
      // left alone
      .filter(s => prunableVersion(s.getPath.getName).exists(_ < keepMin))
      // a claimed-but-UNCOMMITTED version below the horizon may be a
      // concurrent publisher still writing (a fast racer can push the
      // horizon past a slow racer's claim) — deleting it mid-write
      // fails that publisher's job (the hammer caught exactly this).
      // Committed versions prune freely; uncommitted ones only after
      // ClaimGraceMs, old enough that the claimant must have crashed.
      .filter { s =>
        val n = prunableVersion(s.getPath.getName).get
        fs.exists(new Path(p, s"v=$n/_SUCCESS")) ||
          now - claimedAtMs(fs, p, n).getOrElse(0L) > ClaimGraceMs
      }
      .foreach(s => fs.delete(s.getPath, true))
    v
  }

  /** How long an uncommitted claim below the keep horizon is presumed
    * to be a LIVE concurrent publish (a publish is seconds; a claim
    * this stale is a crashed publisher's leftover, safe to reap). */
  val ClaimGraceMs: Long = 15L * 60 * 1000

  private def claimedAtMs(fs: FileSystem, root: Path, n: Long): Option[Long] =
    try Some(fs.getFileStatus(new Path(root, s"v=$n.claim")).getModificationTime)
    catch { case _: java.io.IOException => None }

  /** Atomically create the exclusive claim marker for `cand`; true iff
    * this caller won the number. */
  private def claim(fs: FileSystem, root: Path, cand: Long): Boolean = {
    val marker = new Path(root, s"v=$cand.claim")
    if (fs.getScheme == "file") {
      // Hadoop's RawLocalFileSystem.create(overwrite=false) is
      // check-then-create; java.nio createFile is O_CREAT|O_EXCL
      try {
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(marker.toUri.getPath))
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try { fs.create(marker, false).close(); true }
      catch { case _: java.io.IOException => false }
    }
  }

  /** Some(n) iff `name` is a canonical version dir `v=<long>` or its
    * claim marker `v=<long>.claim` — the only names publish prunes. */
  private def prunableVersion(name: String): Option[Long] =
    canonicalVersion(name.stripSuffix(".claim"))

  /** Some(n) iff `name` is exactly the `v=<long>` form this class
    * writes (round-trip check rejects leading zeros/signs). */
  private def canonicalVersion(name: String): Option[Long] =
    name.stripPrefix("v=").toLongOption.filter(n => name == s"v=$n")

  /** Committed (`_SUCCESS`-marked) versions under `root`, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory)
      // canonical names only: a foreign committed "v=007" would list
      // as 7 but readVersion(7) resolves to the (absent) "v=7" dir
      .flatMap(s => canonicalVersion(s.getPath.getName))
      .filter(n => fs.exists(new Path(p, s"v=$n/_SUCCESS")))
      .sorted
  }

  /** Newest committed version number only — one listing, no DataFrame
    * construction (no parquet footer I/O); the serving hot path
    * resolves this per request and defers the actual read to a cache
    * miss. */
  def latestVersion(spark: SparkSession, root: String): Option[Long] =
    versions(spark, root).lastOption

  /** One committed version's frame — the `v=` directory layout stays
    * private to this class. */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame =
    spark.read.parquet(s"$root/v=$version")

  /** The newest committed version's frame, with its version number —
    * None until the first publish commits. */
  def read(spark: SparkSession, root: String): Option[(Long, DataFrame)] =
    latestVersion(spark, root).map(v => (v, readVersion(spark, root, v)))
}
