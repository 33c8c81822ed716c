package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming joins (SURVEY.md §2.3), Structured Streaming form.
  *
  * Reference semantics reproduced:
  *  - J1 unwindowed stream-stream inner equi-join with 3-day idle
  *    state retention (`DwdTradeOrderDetail.java:26,137-190`)
  *  - J2 stream-stream left outer joins for optional enrichments
  *    (`DwdTradeOrderDetail.java:185-188`)
  *  - J3 lookup join `FOR SYSTEM_TIME AS OF proctime`
  *    (`DwdTradeOrderDetail.java:189-190`) — a stream-static broadcast
  *    join, the dim snapshot re-resolved each micro-batch
  *  - J6 interval join `between(-5 s, +5 s)` event time
  *    (`src/test/java/com/atguigu/app/DataStreamJoinTest.java:48-56`)
  *
  * Flink bounds join state by idle-state retention (a processing-time
  * TTL); Spark bounds it with watermarks plus an event-time range
  * predicate. The reference's 3-day retention maps to a 3-day bound:
  * semantically "rows join if their event times are within the
  * retention of each other", which is what the retention achieves for
  * in-order streams. Outer-join null padding is emitted only after the
  * watermark closes the window (Flink emits eagerly and retracts;
  * Spark's at-rest result is the same — SURVEY.md §7.5 item 2, and the
  * reference's own downstream dedup D2 exists to absorb exactly that
  * difference).
  *
  * Scale notes: stream-stream joins shuffle both sides on the key and
  * keep [bound] of state per key in the state store; the lookup join
  * is a broadcast (no shuffle, no state). Tight bounds = small state:
  * prefer the 5 s cart-add bound over the 3-day order bound wherever
  * the business semantics allow.
  */
object Joins {

  /** J1/J2: stream-stream equi-join bounded by an event-time range —
    * `left.tsCol BETWEEN right.tsCol - lower AND right.tsCol + upper`.
    * Both inputs must be watermarked. `joinType`: inner | leftOuter |
    * rightOuter | fullOuter. Aliases inputs `l` / `r`. */
  def streamStream(left: DataFrame, right: DataFrame, keyL: String, keyR: String,
                   tsL: String, tsR: String, lowerSec: Long, upperSec: Long,
                   joinType: String = "inner"): DataFrame =
    left.alias("l").join(right.alias("r"),
      expr(s"l.$keyL = r.$keyR AND " +
        s"l.$tsL >= r.$tsR - INTERVAL $lowerSec SECONDS AND " +
        s"l.$tsL <= r.$tsR + INTERVAL $upperSec SECONDS"),
      joinType)

  /** J6: the DataStream interval join `between(-lower, +upper)` is the
    * same range-bounded join with symmetric defaults. */
  def interval(left: DataFrame, right: DataFrame, keyL: String, keyR: String,
               tsL: String, tsR: String, boundSec: Long = 5): DataFrame =
    streamStream(left, right, keyL, keyR, tsL, tsR, boundSec, boundSec)

  /** J3: lookup (temporal) join — stream side joined to a broadcast
    * snapshot of the dimension. Structured Streaming re-plans the
    * static side every micro-batch, giving AS-OF-processing-time
    * semantics like the reference's cached JDBC lookup (refresh = the
    * reference's 1 h cache TTL, here one micro-batch). */
  def lookup(stream: DataFrame, dim: DataFrame, cond: Column,
             joinType: String = "inner"): DataFrame =
    stream.join(broadcast(dim), cond, joinType)
}
