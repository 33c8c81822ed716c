package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Stateful, Windows}
import graft.streaming.Stateful._

/** End-to-end streaming pipeline (SURVEY.md §3.1's lifecycle):
  * source → stateful per-user flags (flatMapGroupsWithState) →
  * watermarked tumbling-window aggregation → sink, fed micro-batch by
  * micro-batch, asserted equal to the one-shot batch computation.
  * This chains two stateful operators — the state-store + watermark
  * interplay the DWS apps rely on.
  */
class PipelineSpec extends AnyFunSuite {
  import TestSession._

  test("stream: events -> dailyFlags -> 10s window agg == batch computation") {
    import spark.implicits._
    // real events from sf0.001, shifted into UserEvent shape
    val events = graft.sources.Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"ts",
        date_format($"ts", "yyyy-MM-dd").as("dt"), lit(0).as("is_session_start"))
      .as[UserEvent].collect().toSeq.sortBy(e => (e.ts.getTime, e.event_id))

    // ---- batch oracle: window functions + groupBy over the same data
    val wUserDay = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "dt").orderBy("ts", "event_id")
    val batch = events.toDF()
      .withColumn("is_daily_first",
        when(row_number().over(wUserDay) === 1, 1).otherwise(0))
      .groupBy(window($"ts", "10 seconds"))
      .agg(sum($"is_daily_first").as("uv"), count(lit(1)).as("pv"))
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("stt"), $"uv", $"pv")
      .as[(String, Long, Long)].collect().toSet

    // ---- streaming: three micro-batches + watermark-advancing sentinel
    val mem = MemoryStream[UserEvent](spark)
    val flagged = Stateful.dailyFlags(mem.toDS())
    val windowed = Windows.tumbling(
        flagged.toDF(), "ts", Nil,
        Seq(sum($"is_daily_first").cast("long").as("uv"), count(lit(1)).as("pv")))
      .select($"stt", $"uv", $"pv")
    val q = windowed.writeStream.format("memory").queryName("pipeline")
      .outputMode(OutputMode.Append).start()
    val chunks = events.grouped(math.max(1, events.size / 3)).toSeq
    chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
    // sentinel far beyond the last event closes every window (2099 so
    // its own window is filterable out of the assertion)
    val far = Timestamp.valueOf("2099-01-01 00:00:00")
    mem.addData(UserEvent(-1L, -1L, far, "2099-01-01", 0))
    q.processAllAvailable()
    mem.addData(UserEvent(-1L, -2L, new Timestamp(far.getTime + 3600_000L), "2099-01-01", 0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("pipeline")
      .filter(!$"stt".startsWith("2099"))
      .as[(String, Long, Long)].collect().toSet
    assert(streamed == batch, s"streamed=${streamed.size} windows, batch=${batch.size} windows")
  }
}
