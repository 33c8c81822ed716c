package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** As-of (point-in-time) join — each left row matched with the single
  * latest right row whose timestamp is ≤ the left timestamp, per key.
  * Not in the reference's surface; standard for feature lookups and
  * training-data assembly ("the newest state as of event time").
  *
  * Spark has no native as-of join; the naive range join explodes to
  * O(|L|·|R|) pairs per key before picking the max. This composition
  * is the scalable form: tag both sides, union, and carry the last
  * right payload forward over one (key, ts) sort — one shuffle + one
  * sort total regardless of match fan-in. DuckDB's native ASOF JOIN
  * is the oracle.
  */
object AsOf {

  /** Left rows from `left`, each enriched with `rightCols` from the
    * latest `right` row at or before its timestamp (nulls when none).
    * Right rows must be unique per (key, ts) — pre-dedup if not; ties
    * at equal ts match the right row (inclusive bound).
    *
    * The right payload is carried as ONE struct (null exactly for
    * left-side rows), so a matched right row arrives atomically —
    * carrying columns independently would stitch together fields from
    * different right rows whenever a payload column is null. */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               tsL: String, tsR: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightCols.map(col): _*)
    val payloadType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c).copy(name = c)))
    val l = left
      .withColumn("_ts", col(tsL))
      .withColumn("_side", lit(1))
      .select(Seq(col(key), col("_ts"), col("_side")) ++
        leftCols.filterNot(_ == key).map(col) :+
        lit(null).cast(payloadType).as("_r"): _*)
    val r = right
      .withColumn("_ts", col(tsR))
      .withColumn("_side", lit(0))
      .select(Seq(col(key), col("_ts"), col("_side")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        payload.as("_r"): _*)
    // right rows sort before left rows at equal ts -> inclusive match
    val w = Window.partitionBy(key).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_c", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
        rightCols.map(c => col("_c").getField(c).as(c)): _*)
  }

  /** Each purchase matched to the user's latest click at or before it:
    * the classic attribution as-of. Clicks deduped to one per
    * (user, ts) — ASOF semantics require a unique right frame. */
  def purchaseAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "click_ts").orderBy(col("click_id").desc)))
      .filter(col("rn") === 1).drop("rn")
    asOfJoin(purchases, clicks, "user_id", "ts", "click_ts", Seq("click_id", "click_ts"))
      .select(col("user_id"), col("purchase_id"),
        col("click_id"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("click_ts"))).as("gap_sec"))
      .orderBy(col("user_id"), col("purchase_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j_asof_attribution" -> purchaseAttribution)

  val oracles: Map[String, String] = Map(
    "j_asof_attribution" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS purchase_id, ts FROM events WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT user_id, click_id, click_ts FROM (
        |    SELECT user_id, event_id AS click_id, ts AS click_ts,
        |      row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'click'
        |  ) WHERE rn = 1
        |)
        |SELECT p.user_id AS user_id, purchase_id, click_id,
        |  CAST(date_diff('second', click_ts, ts) AS BIGINT) AS gap_sec
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
        |ORDER BY user_id, purchase_id""".stripMargin)
}
