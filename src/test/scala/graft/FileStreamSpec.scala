package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.LogStream

/** Real `readStream` integration (file source — the offline stand-in
  * for the Kafka source S1/S2) driving the ODS plumbing, with a
  * `foreachBatch` parquet sink (the K4 ClickHouse-sink analog). */
class FileStreamSpec extends AnyFunSuite {
  import TestSession._

  test("readStream text -> parse/quarantine -> foreachBatch parquet sink") {
    val inDir = Files.createTempDirectory("fs_in").toString
    val outDir = Files.createTempDirectory("fs_out").toString + "/clean"
    val lines = Seq(
      """{"database":"g","table":"cart_info","type":"insert","data":{"id":"1","sku_num":"2"},"ts":100}""",
      """{"database":"g","table":"cart_info","type":"update","data":{"id":"1","sku_num":"5"},"old":{"sku_num":"2"},"ts":101}""",
      """garbage line""",
      """{"database":"g","table":"order_info","type":"insert","data":{"id":"9"},"ts":102}""")
    Files.write(Paths.get(inDir, "batch-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))

    var dirtySeen = 0L
    val raw = spark.readStream.text(inDir)
    val parsed = LogStream.parse(raw, LogStream.maxwellSchema)
    val q = parsed.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.cache()
        try {
          LogStream.clean(b).withColumn("pt", current_timestamp())
            .write.mode("append").parquet(outDir)
          // dirty side output: the quarantine path
          dirtySeen += LogStream.dirty(b).count()
        } finally { b.unpersist() }
        ()
      }
      .start()
    assert(q.awaitTermination(60000), "parse/quarantine run timed out")
    assert(dirtySeen == 1)

    val clean = spark.read.parquet(outDir)
    assert(clean.count() == 3)
    assert(clean.columns.contains("pt"))
    assert(clean.filter(col("table") === "cart_info").count() == 2)
    import spark.implicits._
    assert(clean.filter(col("type") === "update")
      .select($"old"("sku_num")).as[String].collect().toSeq == Seq("2"))
  }

  test("P10 five-sink split: one streamed pass writes all five branches ≡ batch") {
    // the production BaseLog shape: ONE readStream consumer, ONE
    // foreachBatch that parses, quarantines and five-way splits each
    // micro-batch, writing every branch to its own sink — the batch
    // analog of the reference's main + 4 side-output topic writes
    import graft.operators.GmallDwd
    val inDir = Files.createTempDirectory("fs_log_in").toString
    val outDir = Files.createTempDirectory("fs_log_out").toString
    GmallDwd.logJson(spark, sf).coalesce(1).write.mode("overwrite").text(inDir)
    val raw = spark.readStream.text(inDir)
    val parsed = LogStream.parse(raw, LogStream.pageLogSchema)
    val run = parsed.writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.cache()
        try LogStream.splitLog(LogStream.clean(b)).foreach { case (name, df) =>
          df.write.mode("append").parquet(s"$outDir/$name")
        } finally { b.unpersist() }
        ()
      }.start()
    assert(run.awaitTermination(120000), "five-sink split run timed out")
    val want = LogStream.splitLog(LogStream.clean(LogStream.parse(
      spark.read.text(inDir), LogStream.pageLogSchema)))
    want.foreach { case (name, df) =>
      val got = spark.read.parquet(s"$outDir/$name").toJSON.collect().sorted.toSeq
      val exp = df.toJSON.collect().sorted.toSeq
      assert(got == exp, s"branch $name diverged (got ${got.size}, want ${exp.size})")
      assert(exp.nonEmpty, s"branch $name is empty — fixture covers every branch")
    }
  }

  test("J4 dim chain + watermarked window: streamed facts ≡ batch DWS rows") {
    // The async-dim-join window shape
    // (DwsTradeTrademarkCategoryUserSpuOrderWindow.java:88-199): the
    // fact stream rides through the PRODUCTION orderWideOn chain
    // (stream-static order join + three broadcast dim hops, all
    // stateless) into a watermarked tumbling window keyed by
    // trademark × category × user × spu. Append mode — windows emit on
    // watermark close, driven by a far-future sentinel file.
    // (countDistinct(order_id) is not append-streamable; the windowed
    // agg uses count + sum, the same divergence GmallDws documents.)
    import graft.operators.GmallDwd
    import graft.sources.Tables
    val inDir = Files.createTempDirectory("fs_li").toString
    val src = s"$sf/lineitem.parquet"
    Files.copy(Paths.get(src), Paths.get(inDir, "initial.parquet"))
    val o = Tables.orders(spark, sf)
    val p = Tables.part(spark, sf)
    val c = Tables.customer(spark, sf)
    val n = Tables.nation(spark, sf)
    def windowed(wide: DataFrame): DataFrame = wide
      // parquet ms-timestamps surface as TIMESTAMP_NTZ; watermarks
      // require the session-zoned TIMESTAMP type (UTC-pinned session)
      .withColumn("ship_ts", col("ship_ts").cast("timestamp"))
      .withWatermark("ship_ts", "0 seconds")
      .groupBy(window(col("ship_ts"), "1 day"),
        col("tm"), col("cat1"), col("user_id"), col("spu"))
      .agg(count(lit(1)).as("row_ct"), sum(col("split_total_amount")).as("amount"))
      .select(col("window.start").cast("long").as("ws"), col("tm"), col("cat1"),
        col("user_id"), col("spu"), col("row_ct"), col("amount"))

    val liSchema = spark.read.parquet(src).schema
    val agg = windowed(GmallDwd.orderWideOn(
      spark.readStream.schema(liSchema).parquet(inDir), o, p, c, n))
    val q = agg.writeStream.format("memory").queryName("j4_dws")
      .outputMode(OutputMode.Append).start()
    val cutoff = java.sql.Timestamp.valueOf("2090-01-01 00:00:00")
    try {
      q.processAllAvailable()
      // sentinel: one fact far in the future (2099) advances the
      // watermark past every real window; it joins a real order, so it
      // flows through the full chain to the window operator
      spark.read.parquet(src).limit(1)
        .withColumn("l_shipdate",
          lit("2099-01-01 00:00:00").cast(liSchema("l_shipdate").dataType))
        .write.mode("append").parquet(inDir)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("j4_dws")
      .filter(col("ws") < cutoff.getTime / 1000)
      .collect().map(_.toString).toSet
    val want = windowed(GmallDwd.orderWideOn(
        spark.read.parquet(src), o, p, c, n))
      .collect().map(_.toString).toSet
    assert(want.nonEmpty && got == want,
      s"streamed J4 chain + window diverged (got ${got.size}, want ${want.size})")
  }
}
