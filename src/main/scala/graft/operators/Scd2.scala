package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.LogStream

/** SCD type-2 dimension history and the as-of join that consumes it.
  *
  * The reference's DIM layer keeps only the latest row per key
  * (`TableProcessFunction.java:57-163` upserts into Phoenix; history is
  * lost on every update). A warehouse user asking "what was the order
  * status when this detail shipped?" needs the version history — the
  * standard SCD2 shape: one row per (key, version) with a
  * `[valid_from, valid_to)` interval, closed by the next version's
  * start. This module derives that history from the same Maxwell CDC
  * envelope the `dwd_*` queries parse (`GmallDwdDb.envelope`), then
  * joins facts to the version valid at their event time.
  *
  * Scale shape:
  *  - History build: ONE shuffle on the dim key for the
  *    `row_number`/`lead` window; per-key groups are the key's version
  *    count (CDC updates per row — single digits in practice), so the
  *    in-key sort is trivial and no key is meaningfully skewed.
  *  - As-of join: the interval predicate rides a LEFT join whose equi
  *    component is the dim key, so Catalyst plans a shuffled
  *    hash/sort-merge join on the key with the interval as a residual
  *    condition — never a nested-loop. Version intervals per key are
  *    disjoint and contiguous, so each fact matches AT MOST one version
  *    (no post-join dedup), and facts older than the first version
  *    surface as explicit `n/a` rows instead of silently dropping.
  * Both shapes survive 100×: the history is O(CDC volume), the join
  * shuffles fact rows once on a key they already carry.
  *
  * Timestamps ride as `yyyy-MM-dd HH:mm:ss` strings end-to-end:
  * lexicographic order IS chronological order for this format, both
  * engines compare bytes, and no timezone conversion can diverge.
  */
object Scd2 {

  private def d(field: String): Column = col("data").getItem(field)

  /** Open-interval sentinel for the current version (string-max in the
    * pinned timestamp format, so interval predicates need no null
    * handling). */
  val EndOfTime = "9999-12-31 00:00:00"

  /** SCD2 history of `order_info.order_status`: one row per
    * (order_id, version), versions ordered by (`operate_time`, type) —
    * the fixture's insert carries the order date, each status update
    * the following day, and `'insert' < 'update'` breaks the tie if a
    * source ever stamps both with one time. */
  def orderStatusHistoryOn(env: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("order_id"))
      .orderBy(col("valid_from"), col("type"))
    LogStream.cdcSlice(env, "order_info", Seq("insert", "update"))
      .select(
        d("id").cast(LongType).as("order_id"),
        d("user_id").as("user_id"),
        d("order_status").as("order_status"),
        d("operate_time").as("valid_from"),
        col("type"))
      .withColumn("version_num", row_number().over(w).cast(LongType))
      .withColumn("valid_to",
        coalesce(lead(col("valid_from"), 1).over(w), lit(EndOfTime)))
      .withColumn("is_current", (col("valid_to") === EndOfTime).cast(LongType))
      .select(col("order_id"), col("version_num"), col("user_id"),
        col("order_status"), col("valid_from"), col("valid_to"),
        col("is_current"))
  }

  def orderStatusHistory(spark: SparkSession, dir: String): DataFrame =
    orderStatusHistoryOn(GmallDwdDb.envelope(spark, dir))
      .orderBy(col("order_id"), col("version_num"))

  /** Keyed as-of join: each fact row gets the single `hist` version
    * whose `[valid_from, valid_to)` interval contains `t`. `hist` must
    * be an SCD2 frame (disjoint contiguous intervals per key) — then
    * the LEFT join matches ≤ 1 version per fact and facts before the
    * first version keep null version columns. */
  def asOfJoin(facts: DataFrame, hist: DataFrame, key: String,
               t: Column): DataFrame =
    facts.join(hist,
      facts(key) === hist(key) &&
        t >= hist("valid_from") && t < hist("valid_to"),
      "left")
      .drop(hist(key))

  /** Every order_detail insert joined AS OF its `create_time` to the
    * order-status version then in effect: the fixture's details ride
    * `l_shipdate` (≥ order date + 1 day), so orders with a status
    * update resolve to version 2 while untouched orders stay on
    * version 1 — both paths exercised on real data. */
  def orderDetailAsOfOn(env: DataFrame): DataFrame = {
    val details = GmallDwdDb.orderDetailSliceOn(env)
      .select(col("order_detail_id"),
        col("order_id").cast(LongType).as("order_id"),
        col("order_create_time"))
    val hist = orderStatusHistoryOn(env)
      .select(col("order_id"), col("version_num"), col("order_status"),
        col("valid_from"), col("valid_to"))
    asOfJoin(details, hist, "order_id", col("order_create_time"))
      .select(col("order_detail_id"), col("order_id"),
        col("order_create_time"),
        coalesce(col("order_status"), lit("n/a")).as("asof_status"),
        coalesce(col("version_num"), lit(0L)).as("asof_version"))
  }

  def orderDetailAsOf(spark: SparkSession, dir: String): DataFrame =
    orderDetailAsOfOn(GmallDwdDb.envelope(spark, dir))
      .orderBy(col("order_detail_id"))

  // ------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dim_scd2_order_status" -> ((s, d) => orderStatusHistory(s, d)),
    "dwd_order_detail_asof" -> ((s, d) => orderDetailAsOf(s, d)))

  /** Shared version-history CTE: the envelope's order_info rows rebuilt
    * from `orders` with the fixture's modulus rules (insert 1001 at the
    * order date; o%20 ∈ {3,13} → 1005 and {7,17} → 1003 one day later),
    * then the same row_number/lead window as the engine. */
  private val histCte: String =
    s"""v AS (
       |  SELECT o_orderkey AS order_id, CAST(o_custkey AS VARCHAR) AS user_id,
       |         '1001' AS order_status,
       |         strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from,
       |         'insert' AS typ
       |  FROM orders
       |  UNION ALL
       |  SELECT o_orderkey, CAST(o_custkey AS VARCHAR),
       |         CASE WHEN o_orderkey % 20 IN (3,13) THEN '1005' ELSE '1003' END,
       |         strftime(o_orderdate + INTERVAL 1 DAY, '%Y-%m-%d %H:%M:%S'),
       |         'update'
       |  FROM orders WHERE o_orderkey % 20 IN (3,7,13,17)
       |), hist AS (
       |  SELECT order_id, user_id, order_status, valid_from,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY order_id ORDER BY valid_from, typ) AS BIGINT) AS version_num,
       |    COALESCE(LEAD(valid_from) OVER (PARTITION BY order_id ORDER BY valid_from, typ),
       |             '$EndOfTime') AS valid_to
       |  FROM v
       |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "dim_scd2_order_status" ->
      s"""WITH $histCte
         |SELECT order_id, version_num, user_id, order_status, valid_from, valid_to,
         |  CAST(CASE WHEN valid_to = '$EndOfTime' THEN 1 ELSE 0 END AS BIGINT) AS is_current
         |FROM hist ORDER BY order_id, version_num""".stripMargin,
    "dwd_order_detail_asof" ->
      s"""WITH $histCte,
         |od AS (
         |  SELECT l_orderkey AS okey, l_linenumber AS lno, l_shipdate AS sdate,
         |         ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_linenumber
         |           ORDER BY l_partkey, l_suppkey, l_quantity, l_extendedprice,
         |                    l_discount, l_tax, l_shipdate) AS rn
         |  FROM lineitem WHERE l_orderkey % 3 = 0
         |), f AS (
         |  SELECT 'd' || CAST(okey AS VARCHAR) || '-' || CAST(lno AS VARCHAR) || '-' || CAST(rn AS VARCHAR) AS order_detail_id,
         |         okey AS order_id,
         |         strftime(sdate, '%Y-%m-%d %H:%M:%S') AS order_create_time
         |  FROM od
         |)
         |SELECT f.order_detail_id, f.order_id, f.order_create_time,
         |  COALESCE(hist.order_status, 'n/a') AS asof_status,
         |  CAST(COALESCE(hist.version_num, 0) AS BIGINT) AS asof_version
         |FROM f LEFT JOIN hist
         |  ON f.order_id = hist.order_id
         | AND f.order_create_time >= hist.valid_from
         | AND f.order_create_time < hist.valid_to
         |ORDER BY f.order_detail_id""".stripMargin)
}
