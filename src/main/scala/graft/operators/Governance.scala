package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-governance operators: the user-erasure ("right to be
  * forgotten") cascade report — given a deterministic victim set of
  * users, how many rows each table loses, including the indirect
  * cascade (a victim's orders take their lineitems with them).
  *
  * Scale shape: the victim set is a filtered key projection (tiny
  * relative to the corpus) and BROADCASTS into every per-table
  * semi-join probe; the cascade hop (orders → lineitem) joins on the
  * order key with the doomed-order side again broadcast-sized. No
  * table ever shuffles for the report — each is scanned once and
  * probed row-by-row, which is exactly the shape the actual erasure
  * rewrite job would use (anti-join instead of semi-join, same
  * probes). Counts are exact, so the report doubles as the post-delete
  * audit record.
  */
object Governance {

  /** Deterministic victim selection: every 97th customer key. A real
    * run swaps this for the request queue; everything downstream is
    * shape-identical. */
  private val VictimModulus = 97

  private[graft] def victims(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_custkey") % VictimModulus === 0)
      .select(col("c_custkey").as("uid"))

  /** Per-table erasure impact: total rows, rows erased (direct victim
    * rows, plus the order→lineitem cascade), rows kept. */
  def erasureReport(spark: SparkSession, dir: String): DataFrame = {
    val v = broadcast(victims(spark, dir))

    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val events = Tables.events(spark, dir)

    val doomedOrders = orders.join(v, orders("o_custkey") === v("uid"))
      .select(col("o_orderkey"))

    def row(name: String, total: DataFrame, erased: DataFrame): DataFrame = {
      val t = total.agg(count(lit(1)).as("total_rows"))
      val e = erased.agg(count(lit(1)).as("rows_erased"))
      t.crossJoin(e).select(
        lit(name).as("table_name"), col("total_rows"), col("rows_erased"),
        (col("total_rows") - col("rows_erased")).as("rows_kept"))
    }

    row("customer", customer,
        customer.join(v, customer("c_custkey") === v("uid"), "left_semi"))
      .unionByName(row("orders", orders,
        orders.join(v, orders("o_custkey") === v("uid"), "left_semi")))
      .unionByName(row("lineitem", lineitem,
        lineitem.join(broadcast(doomedOrders),
          lineitem("l_orderkey") === doomedOrders("o_orderkey"), "left_semi")))
      .unionByName(row("events", events,
        events.join(v, events("user_id") === v("uid"), "left_semi")))
      .orderBy(col("table_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gov_erasure_report" -> ((s, d) => erasureReport(s, d)))

  val oracles: Map[String, String] = Map(
    "gov_erasure_report" ->
      s"""WITH v AS (
        |  SELECT c_custkey AS uid FROM customer WHERE c_custkey % $VictimModulus = 0
        |), doomed AS (
        |  SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT uid FROM v)
        |), r AS (
        |  SELECT 'customer' AS table_name,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS total_rows,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer WHERE c_custkey IN (SELECT uid FROM v)) AS rows_erased
        |  UNION ALL SELECT 'orders',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders WHERE o_custkey IN (SELECT uid FROM v))
        |  UNION ALL SELECT 'lineitem',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM doomed))
        |  UNION ALL SELECT 'events',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM events),
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM events WHERE user_id IN (SELECT uid FROM v))
        |)
        |SELECT table_name, total_rows, rows_erased,
        |  total_rows - rows_erased AS rows_kept
        |FROM r ORDER BY table_name""".stripMargin)
}
