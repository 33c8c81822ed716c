package graft.serving

import org.apache.hadoop.fs.Path
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

  /** Write `df` as a NEW version under `root` (single writer assumed —
    * the foreachBatch contract), then prune everything but the newest
    * `keep` committed versions. Returns the version actually written:
    * `version` normally, `latest + 1` when `version` is not strictly
    * newer — a restarted pipeline whose batch ids reset (fresh
    * checkpoint) or a retried batch must NEVER `overwrite` a committed
    * `v=` directory in place, because that deletes before it writes
    * and a concurrent read would catch the gap this class exists to
    * close. Readers therefore always observe monotonically increasing
    * versions. Pruning removes uncommitted partials too (a crashed
    * earlier publish's leftovers — safe under the single-writer
    * contract), so disk stays bounded at `keep` versions. */
  def publish(df: DataFrame, root: String, version: Long, keep: Int = 2): Long = {
    val spark = df.sparkSession
    val committed = versions(spark, root)
    val v = committed.lastOption match {
      case Some(latest) if version <= latest => latest + 1
      case _ => version
    }
    df.write.mode("overwrite").parquet(s"$root/v=$v")
    val keepSet = (versions(spark, root) :+ v).distinct.sorted.takeRight(keep).toSet
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(s => s.isDirectory)
      // delete only CANONICAL v=<long> names outside the keep set
      // (stale versions and crashed publishes' partials) — exactly the
      // names this class writes; "v=007", "v=+5", "v=backup" were not
      // written by it and are left alone
      .filter(s => canonicalVersion(s.getPath.getName).exists(!keepSet(_)))
      .foreach(s => fs.delete(s.getPath, true))
    v
  }

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
