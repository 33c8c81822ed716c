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
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4
    * rejects outright. The session reads it as a long
    * (`spark.sql.legacy.parquet.nanosAsLong`, set once in
    * `GraftSession.builder` — not here, so reading `events` never
    * mutates session conf under concurrent readers) and this loader
    * converts to TimestampType by integer-dividing to micros — the
    * same truncation DuckDB applies, so oracle comparisons agree to
    * the microsecond.
    */
  def events(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
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
