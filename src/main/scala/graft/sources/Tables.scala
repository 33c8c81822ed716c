package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet star schema (TESTDATA.md).
  *
  * All engine queries read through here so path handling, column
  * pruning and (at cluster scale) bucketing/sorting decisions live in
  * one place. At 100 TB these would be catalog tables; the parquet
  * scan + Catalyst pushdown path is identical.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has been written by the driver as both parquet
    * TIMESTAMP(NANOS) and TIMESTAMP(MICROS)/NTZ across regenerations,
    * so this loader branches on the READ schema rather than assuming
    * either encoding:
    *   - NANOS: Spark 4 rejects it natively; the session reads it as a
    *     long (`spark.sql.legacy.parquet.nanosAsLong`, set once in
    *     `GraftSession.builder`) and we integer-divide to micros — the
    *     same truncation DuckDB applies.
    *   - MICROS (isAdjustedToUTC=false → TimestampNTZType): cast to the
    *     session-TZ TimestampType the oracles expect; the session TZ is
    *     pinned UTC (`GraftSession.scala:21`) so the wall-clock value is
    *     preserved exactly.
    * Either way callers always see `ts: TimestampType` — pinned by
    * TablesSpec so the next driver-side regeneration fails in ONE test
    * with a clear message instead of 34 downstream analysis errors.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = s.read.parquet(s"$d/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts read as unexpected type $other — extend Tables.events for the new encoding")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Fan a frame out to full core parallelism before compute-heavy
    * per-row work (signatures, wide projections) when its input is a
    * small single-file scan — a single parquet row group caps scan
    * parallelism at 1 regardless of cores, and broadcast-join plans
    * never reshuffle downstream. Gated on the scan's file count (a
    * plan-level check — no RDD materialization, no double planning),
    * so on production many-file tables this is a no-op rather than a
    * gratuitous full shuffle. */
  def spread(s: SparkSession, df: DataFrame): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    if (df.inputFiles.length < target) df.repartition(target) else df
  }
}
