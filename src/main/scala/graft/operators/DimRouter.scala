package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Config-driven DIM routing — the reference's broadcast-state pattern
  * (SURVEY.md §2 J5/P9/K3) re-expressed as a driver-side loop.
  *
  * The reference streams a MySQL `table_process` config table via CDC,
  * broadcasts it to all tasks (`app/dim/DimApp.java:70-78`), routes
  * each Maxwell record by `table`, prunes its payload to the
  * configured `sinkColumns` (`app/func/TableProcessFunction.java:149-163`),
  * creates Phoenix tables at runtime and upserts row-by-row
  * (`app/func/DimSinkFunction.java:28-59`).
  *
  * Spark-first shape: the config is a small frame snapshot read each
  * micro-batch; routing is one filter per sink table over a shared
  * cached parse of the CDC batch; pruning is a static `select` (so
  * Catalyst sees the narrow schema and prunes the scan); the
  * per-record Phoenix upsert becomes a set-based latest-wins merge.
  * At 100 TB the merge is a Delta/Iceberg `MERGE INTO` keyed by the
  * sink PK; the parquet-era [[upsert]] here has identical semantics.
  */
object DimRouter {

  /** One row of the reference's `gmall_config.table_process`
    * (`bean/TableProcess.java:11-17`). sinkExtend (Phoenix DDL salt
    * options) has no Spark meaning and is dropped. */
  case class TableProcess(sourceTable: String, sinkTable: String,
                          sinkColumns: Seq[String], sinkPk: String)

  /** J5+P9: route a Maxwell-envelope frame (schema per
    * `LogStream.maxwellSchema`) into one pruned frame per configured
    * sink table. Insert/update/bootstrap records pass; deletes are
    * emitted separately by [[deletes]]. */
  def route(envelope: DataFrame, configs: Seq[TableProcess]): Map[String, DataFrame] = {
    val live = envelope.filter(col("type").isin("insert", "update", "bootstrap-insert"))
    configs.map { tp =>
      val routed = live.filter(col("table") === tp.sourceTable)
      // config-driven pruning as a static projection: the sink schema
      // is (pk, columns...), each drawn from the Maxwell data map
      val cols = tp.sinkColumns.map(c => col("data").getItem(c).as(c))
      tp.sinkTable -> routed.select(cols :+ col("ts").as("_cdc_ts"): _*)
    }.toMap
  }

  /** Tombstones for a sink table (the reference deletes from Redis
    * cache on update/delete; a lakehouse sink turns these into
    * `MERGE ... WHEN MATCHED DELETE`). */
  def deletes(envelope: DataFrame, tp: TableProcess): DataFrame =
    envelope.filter(col("table") === tp.sourceTable && col("type") === "delete")
      .select(col("data").getItem(tp.sinkPk).as(tp.sinkPk), col("ts").as("_cdc_ts"))

  /** K3: latest-wins upsert of a routed batch into the existing DIM
    * table state. Set-based equivalent of the reference's per-record
    * `upsert into <t> values (...)`: for each PK keep the row with the
    * highest `_cdc_ts` (ties: updates beat existing). */
  def upsert(existing: DataFrame, updates: DataFrame, pk: String): DataFrame = {
    val tagged = existing.withColumn("_src", lit(0))
      .unionByName(updates.withColumn("_src", lit(1)))
    tagged
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col(pk)).orderBy(col("_cdc_ts").desc, col("_src").desc)))
      .filter(col("_rk") === 1)
      .drop("_rk", "_src")
  }

  /** End-to-end driver loop: route a CDC batch and merge each sink
    * table into its parquet location under `warehouseDir`. This is the
    * body a `foreachBatch` would run per micro-batch (SURVEY.md §3.1);
    * it is also directly usable in batch backfills.
    *
    * NOTE: this variant rewrites the whole base table per batch —
    * simple and fine for backfills, but O(dim table) per micro-batch.
    * The streaming-scale path is [[routeAndWriteBucketed]], which
    * rewrites only the hash buckets a batch actually touches.
    *
    * Deletes participate in the same latest-wins resolution as live
    * records (as tombstone rows), so a delete followed by a later
    * re-insert of the same PK within one batch keeps the row — the
    * per-PK winner is whichever event is newest, with live records
    * beating tombstones on equal `_cdc_ts`. */
  def routeAndWrite(spark: SparkSession, envelope: DataFrame,
                    configs: Seq[TableProcess], warehouseDir: String): Unit = {
    val batch = envelope.cache()
    try {
      route(batch, configs).foreach { case (sinkTable, updates) =>
        val tp = configs.find(_.sinkTable == sinkTable).get
        val path = s"$warehouseDir/$sinkTable"
        val incoming = withTombstones(batch, tp, updates)
        // recover an interrupted swap BEFORE deciding whether a base
        // exists — otherwise a crash mid-swap (dst renamed aside, tmp
        // not yet in place) would make this merge run against an empty
        // base and silently reset the table to the latest batch
        recoverInterruptedSwap(spark, path)
        val base = if (tableExists(spark, path))
          spark.read.parquet(path).withColumn("_del", lit(0))
        else incoming.limit(0)
        val merged = base.withColumn("_src", lit(0))
          .unionByName(incoming.withColumn("_src", lit(1)))
          .withColumn("_rk", row_number().over(
            Window.partitionBy(col(tp.sinkPk))
              .orderBy(col("_cdc_ts").desc, col("_del"), col("_src").desc)))
          .filter(col("_rk") === 1 && col("_del") === 0)
          .drop("_rk", "_src", "_del")
        merged.write.mode("overwrite").parquet(s"$path.tmp")
        swapInto(spark, path)
      }
    } finally batch.unpersist()
  }

  /** Live batch rows plus delete tombstones widened to the sink schema
    * (nulls outside pk/ts), tagged with `_del` so the latest-wins merge
    * can resolve delete-vs-reinsert races within one batch. */
  private def withTombstones(batch: DataFrame, tp: TableProcess,
                             updates: DataFrame): DataFrame = {
    val d = deletes(batch, tp)
    val tombs = updates.columns.foldLeft(d) { (acc, c) =>
      if (d.columns.contains(c)) acc
      else acc.withColumn(c, lit(null).cast(updates.schema(c).dataType))
    }.select(updates.columns.map(col): _*)
    updates.withColumn("_del", lit(0))
      .unionByName(tombs.withColumn("_del", lit(1)))
  }

  /** Deterministic bucket id for a sink PK: Murmur3 `hash` mod `n`.
    * Stable across batches and Spark versions in this repo, so a PK
    * always lands in the same on-disk bucket directory. */
  def bucketOf(pk: org.apache.spark.sql.Column, nBuckets: Int): org.apache.spark.sql.Column =
    pmod(hash(pk), lit(nBuckets))

  /** The O(batch) form of [[routeAndWrite]]: DIM base tables are stored
    * hash-bucketed by sink PK as hive-partitioned parquet
    * (`<table>/bkt=K/`), and a micro-batch merge touches ONLY the
    * buckets containing the batch's PKs:
    *
    *  1. bucket the batch (`bkt = pmod(hash(pk), n)`), collect the
    *     touched-bucket id set (≤ nBuckets values — model-sized);
    *  2. read the base pruned to those partitions (Catalyst partition
    *     pruning: untouched bucket directories are never scanned);
    *  3. latest-wins merge exactly as [[routeAndWrite]];
    *  4. write the merge result partitioned by `bkt` to `<table>.tmp`,
    *     then atomically swap each touched bucket directory into place.
    *
    * Untouched bucket files are never read, rewritten, or renamed —
    * per-batch cost is O(batch ∪ touched buckets), not O(dim table),
    * which restores the reference's per-record-upsert cost shape
    * (`app/func/DimSinkFunction.java:28-59`) at set-based granularity.
    *
    * Crash safety: the tmp write completes before any base mutation; a
    * crash mid-swap leaves at most one bucket renamed aside
    * (`.old-bkt-K`), which [[recoverInterruptedBuckets]] restores on
    * the next run. The merge is idempotent — replaying the same batch
    * over an already-merged bucket yields the identical rows (update
    * beats base on equal ts, tombstoned PKs stay gone) — so the
    * streaming checkpoint's replay-on-failure contract holds per
    * bucket. At 100 TB this is a lakehouse `MERGE INTO` over a table
    * bucketed/clustered by PK; the layout and touched-set pruning here
    * are the same shape.
    */
  def routeAndWriteBucketed(spark: SparkSession, envelope: DataFrame,
                            configs: Seq[TableProcess], warehouseDir: String,
                            nBuckets: Int = 16): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val batch = envelope.cache()
    try {
      route(batch, configs).foreach { case (sinkTable, updates) =>
        val tp = configs.find(_.sinkTable == sinkTable).get
        val path = s"$warehouseDir/$sinkTable"
        val incoming = withTombstones(batch, tp, updates)
          .withColumn("bkt", bucketOf(col(tp.sinkPk), nBuckets))
          .cache()
        try {
          recoverInterruptedBuckets(spark, path)
          val touched = incoming.select("bkt").distinct()
            .collect().map(_.getInt(0)).sorted
          if (touched.nonEmpty) {
            val fs = org.apache.hadoop.fs.FileSystem.get(
              spark.sparkContext.hadoopConfiguration)
            val tmpPath = new org.apache.hadoop.fs.Path(s"$path.tmp")
            if (fs.exists(tmpPath)) fs.delete(tmpPath, true)
            val base =
              if (bucketedTableExists(spark, path))
                spark.read.parquet(path)
                  .filter(col("bkt").isin(touched.map(Int.box): _*))
                  .withColumn("_del", lit(0))
                  .select(incoming.columns.map(col): _*)
              else incoming.limit(0)
            val merged = base.withColumn("_src", lit(0))
              .unionByName(incoming.withColumn("_src", lit(1)))
              .withColumn("_rk", row_number().over(
                Window.partitionBy(col(tp.sinkPk))
                  .orderBy(col("_cdc_ts").desc, col("_del"), col("_src").desc)))
              .filter(col("_rk") === 1 && col("_del") === 0)
              .drop("_rk", "_src", "_del")
            merged.write.partitionBy("bkt").mode("overwrite").parquet(s"$path.tmp")
            touched.foreach(b => swapBucket(fs, path, b))
            fs.delete(tmpPath, true)
          }
        } finally incoming.unpersist()
      }
    } finally batch.unpersist()
  }

  /** Read a bucketed DIM table as its logical rows (bucket layout
    * hidden from consumers). */
  def readBucketedDim(spark: SparkSession, warehouseDir: String,
                      sinkTable: String): DataFrame =
    spark.read.parquet(s"$warehouseDir/$sinkTable").drop("bkt")

  /** Swap one merged bucket directory from `path.tmp/bkt=K` into
    * `path/bkt=K` with the same rename-aside protocol as [[swapInto]],
    * scoped to the single bucket. The aside name is dot-prefixed so
    * Spark's file listing never sees a half-swapped bucket as data. A
    * touched bucket whose merge result is empty (every PK deleted) has
    * no tmp dir — the old bucket dir is simply removed. */
  private def swapBucket(fs: org.apache.hadoop.fs.FileSystem,
                         path: String, bucket: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val dst = new Path(s"$path/bkt=$bucket")
    val src = new Path(s"$path.tmp/bkt=$bucket")
    val old = new Path(s"$path/.old-bkt-$bucket")
    def checked(ok: Boolean, what: String): Unit =
      if (!ok) throw new java.io.IOException(
        s"DimRouter bucket swap: $what failed for $path bkt=$bucket")
    if (!fs.exists(new Path(path))) checked(fs.mkdirs(new Path(path)), "mkdirs table dir")
    if (fs.exists(old)) checked(fs.delete(old, true), s"delete stale $old")
    if (fs.exists(dst)) checked(fs.rename(dst, old), s"rename $dst aside")
    if (fs.exists(src)) checked(fs.rename(src, dst), s"rename $src into place")
    if (fs.exists(old)) checked(fs.delete(old, true), s"delete $old")
  }

  /** Repair any bucket left renamed-aside by a crash between
    * `rename(dst, old)` and `rename(src, dst)`: if `bkt=K` is missing
    * but `.old-bkt-K` survives, the aside copy is the only base state —
    * rename it back (the interrupted batch then replays idempotently).
    * A surviving aside NEXT TO a live `bkt=K` is post-install garbage
    * and is deleted. Idempotent; no-op on a healthy table. */
  private[operators] def recoverInterruptedBuckets(spark: SparkSession,
                                                   path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dir = new Path(path)
    if (fs.exists(dir)) {
      val Aside = """\.old-bkt-(\d+)""".r
      fs.listStatus(dir).foreach { st =>
        st.getPath.getName match {
          case Aside(b) =>
            val dst = new Path(s"$path/bkt=$b")
            if (fs.exists(dst)) {
              if (!fs.delete(st.getPath, true)) throw new java.io.IOException(
                s"DimRouter bucket recovery: delete stale aside failed for $path bkt=$b")
            } else if (!fs.rename(st.getPath, dst))
              throw new java.io.IOException(
                s"DimRouter bucket recovery failed for $path bkt=$b")
          case _ => ()
        }
      }
    }
  }

  /** A bucketed table "exists" once it has at least one bucket
    * partition directory (an empty table dir — e.g. every row deleted —
    * must not be offered to `spark.read.parquet`, which cannot infer a
    * schema from it). */
  private def bucketedTableExists(spark: SparkSession, path: String): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(path)
    fs.exists(dir) && fs.listStatus(dir).exists(_.getPath.getName.startsWith("bkt="))
  }

  /** Swap `path.tmp` (the freshly-written merge result) into `path`.
    *
    * Crash-safe ordering for the parquet era: the previous table is
    * renamed aside (`path` → `path.old`) before the new one moves in,
    * so no failure point leaves the data unrecoverable — a crash
    * between the two renames is repaired by renaming `path.old` back.
    * Every FileSystem call is checked; a false return (e.g. a silently
    * failed rename on an object store) throws instead of losing state.
    * At scale this whole swap is a transactional `MERGE INTO` on a
    * lakehouse table format. */
  private def swapInto(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new Path(path)
    val tmp = new Path(s"$path.tmp")
    val old = new Path(s"$path.old")
    def checked(ok: Boolean, what: String): Unit =
      if (!ok) throw new java.io.IOException(s"DimRouter swap: $what failed for $path")
    // recoverInterruptedSwap ran before the merge read its base, so a
    // missing dst with a surviving .old here means the merge just ran
    // against the WRONG (empty) base — installing tmp would silently
    // drop the prior state held only in .old. Refuse instead of
    // "recovering": there is nothing valid to install.
    if (!fs.exists(dst) && fs.exists(old))
      throw new IllegalStateException(
        s"DimRouter swap: $dst missing but $old exists — merge ran against an " +
          "empty base; refusing to install a merge result that would drop prior state")
    if (fs.exists(old)) checked(fs.delete(old, true), s"delete stale $old")
    if (fs.exists(dst)) checked(fs.rename(dst, old), s"rename $dst aside")
    checked(fs.rename(tmp, dst), s"rename $tmp into place")
    if (fs.exists(old)) checked(fs.delete(old, true), s"delete $old")
  }

  /** If a previous swap crashed between rename(dst, old) and
    * rename(tmp, dst), `path` is missing and `path.old` holds the only
    * copy of prior DIM state — rename it back. Idempotent; no-op when
    * the table is healthy. */
  private[operators] def recoverInterruptedSwap(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new Path(path)
    val old = new Path(s"$path.old")
    if (!fs.exists(dst) && fs.exists(old) && !fs.rename(old, dst))
      throw new java.io.IOException(s"DimRouter swap recovery failed for $path")
  }

  private def tableExists(spark: SparkSession, path: String): Boolean =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(path))

  /** A deterministic `table_process` row for the named query below —
    * the `gmall_config` shape (`bean/TableProcess.java:11-17`) with a
    * sink schema that exercises P9's map-key pruning (6 of the ~20
    * payload keys survive). */
  val orderInfoConfig: TableProcess = TableProcess(
    sourceTable = "order_info", sinkTable = "dim_order_info",
    sinkColumns = Seq("id", "user_id", "order_status", "total_amount",
      "province_id", "operate_time"),
    sinkPk = "id")

  /** J5/P9/K3 as ONE oracle-named query: the Maxwell envelope fixture
    * routed through [[route]] with [[orderInfoConfig]] (config-driven
    * table filter + payload pruning), then the batch's inserts and
    * updates merged latest-wins by [[upsert]] — the set-based form of
    * `DimApp.java:70-78` + `TableProcessFunction.java:57-163` +
    * `DimSinkFunction.java:28-59`'s per-record Phoenix upsert. Insert
    * and update of one order carry the same CDC `ts` (second
    * granularity), which is exactly the tie [[upsert]] resolves in
    * favor of the update — so the merged dim shows post-mutation
    * status/operate_time for every mutated order, verified against a
    * DuckDB rebuild from `orders` alone. */
  def dimOrderInfo(spark: SparkSession, dir: String): DataFrame = {
    val env = GmallDwdDb.envelope(spark, dir)
    val ins = route(env.filter(col("type") === "insert"),
      Seq(orderInfoConfig))(orderInfoConfig.sinkTable)
    val upd = route(env.filter(col("type") === "update"),
      Seq(orderInfoConfig))(orderInfoConfig.sinkTable)
    upsert(ins, upd, orderInfoConfig.sinkPk)
      .orderBy(col("id").cast("bigint"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dim_order_info" -> ((s, d) => dimOrderInfo(s, d)))

  /** DuckDB rebuild from `orders` alone: the fixture's order_info
    * envelope rules (insert per order at status 1001/operate_time =
    * orderdate; one update per okey%20 ∈ {3,13}→1005, {7,17}→1003 at
    * operate_time + 1 day, same ts) merged latest-wins. */
  val oracles: Map[String, String] = Map(
    "dim_order_info" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS id,
        |  CAST(o_custkey AS VARCHAR) AS user_id,
        |  CASE WHEN o_orderkey % 20 IN (3, 13) THEN '1005'
        |       WHEN o_orderkey % 20 IN (7, 17) THEN '1003'
        |       ELSE '1001' END AS order_status,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS total_amount,
        |  CAST(o_custkey % 25 AS VARCHAR) AS province_id,
        |  strftime(o_orderdate + CASE WHEN o_orderkey % 20 IN (3, 7, 13, 17)
        |    THEN INTERVAL 1 DAY ELSE INTERVAL 0 DAY END, '%Y-%m-%d %H:%M:%S') AS operate_time,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS _cdc_ts
        |FROM orders ORDER BY o_orderkey""".stripMargin)
}
