package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming windowed aggregation — the Structured Streaming form of
  * the reference's DWS layer (SURVEY.md §2.5): 10-second tumbling
  * event-time windows, 2-second bounded-out-of-orderness watermarks
  * (13 s for the tri-stream union,
  * `DwsTrafficVcChArIsNewPageViewWindow.java:118`), and window-bound
  * `stt`/`edt` stamping.
  *
  * Late data beyond the watermark is dropped with no side output —
  * matching the reference, which configures no allowed-lateness
  * anywhere. The reference stamps `ts = System.currentTimeMillis()`
  * in its window functions; we stamp the deterministic `window.end`
  * instead (SURVEY.md §7.5 item 4).
  *
  * Scale notes: one shuffle on (window, keys); partial aggregation is
  * map-side; streaming state = one row per open (window, key) evicted
  * at watermark. A global window (W5, no keys) is a single-reducer
  * aggregation in Flink but partial-aggregates in parallel here.
  */
object Windows {

  val WindowLength = "10 seconds"
  val Watermark = "2 seconds"
  val UnionWatermark = "13 seconds"

  /** W1–W6 shape: watermarked tumbling window + keyed aggregation,
    * with string `stt`/`edt` window bounds like the ClickHouse DWS
    * tables. `keys` may be empty (W5 global window). Works on batch
    * frames too (watermark is a no-op there) — StreamingSpec relies
    * on that to assert batch/stream agreement. */
  def tumbling(df: DataFrame, eventCol: String, keys: Seq[Column], aggs: Seq[Column],
               windowLength: String = WindowLength, watermark: String = Watermark): DataFrame = {
    val win = window(col(eventCol), windowLength)
    df.withWatermark(eventCol, watermark)
      .groupBy(win +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("stt", date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("edt", date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss"))
      .drop("window")
  }

  /** M1: union N homogeneous one-hot streams then window — the
    * tri-stream traffic union (`DwsTrafficVcChArIsNewPageViewWindow`).
    * All inputs must share a schema (project to one-hot metric columns
    * first, like the reference's TrafficPageViewBean). */
  def unionTumbling(parts: Seq[DataFrame], eventCol: String, keys: Seq[Column],
                    aggs: Seq[Column]): DataFrame =
    tumbling(parts.reduce(_ unionByName _), eventCol, keys, aggs,
      watermark = UnionWatermark)
}
