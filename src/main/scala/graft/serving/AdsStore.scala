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

  /** Write `df` as version `version` under `root`, then prune all but
    * the newest `keep` committed versions. */
  def publish(df: DataFrame, root: String, version: Long, keep: Int = 2): Unit = {
    df.write.mode("overwrite").parquet(s"$root/v=$version")
    val spark = df.sparkSession
    versions(spark, root).dropRight(keep).foreach { v =>
      val p = new Path(s"$root/v=$v")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  /** Committed (`_SUCCESS`-marked) versions under `root`, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .filter(s => fs.exists(new Path(s.getPath, "_SUCCESS")))
      .flatMap(_.getPath.getName.stripPrefix("v=").toLongOption)
      .sorted
  }

  /** The newest committed version's frame, with its version number —
    * None until the first publish commits. */
  def read(spark: SparkSession, root: String): Option[(Long, DataFrame)] =
    versions(spark, root).lastOption.map(v => (v, spark.read.parquet(s"$root/v=$v")))
}
