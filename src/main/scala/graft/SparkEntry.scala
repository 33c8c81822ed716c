package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator module contributes a `queries` map (name → builder)
  * and an `oracles` map (name → ANSI SQL the driver runs in DuckDB on
  * the same parquet tables). Queries without an oracle get a
  * rows-only check.
  */
object SparkEntry {
  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracles),
      (Analytic.queries, Analytic.oracles),
      (AsOf.queries, AsOf.oracles),
      (GmallDwdDb.queries, GmallDwdDb.oracles),
      (DimRouter.queries, DimRouter.oracles),
      (GmallDws.queries, GmallDws.oracles),
      (GmallAds.queries, GmallAds.oracles),
      (Dedup.queries, Dedup.oracles),
      (Similarity.queries, Similarity.oracles),
      (TextAnalysis.queries, TextAnalysis.oracles),
      (Curation.queries, Curation.oracles),
      (Search.queries, Search.oracles),
      (Governance.queries, Governance.oracles),
      (Graph.queries, Graph.oracles),
      (Scd2.queries, Scd2.oracles),
      (Multimodal.queries, Multimodal.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * Every oracle ships with its CTEs `MATERIALIZED`
    * ([[graft.operators.DuckSql.materialize]]): DuckDB re-inlines
    * plain CTEs at every reference, which made the multiply-referenced
    * replay CTEs catastrophically slow (387 s for one PQ oracle) and
    * starved the round-11 driver gate into an empty artifact. Measured
    * across all 204 oracles at sf0.001: 119.6 s → 48.0 s total, no
    * query slower, results identical up to row order (which the gate
    * canonicalizes away). One choke point here so every future oracle
    * is covered; `tools/oracle_bench.py` is the cost tripwire. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2)
      .map { case (k, v) => k -> DuckSql.materialize(v) }.toMap
}
