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
    q.awaitTermination(60000)
    assert(dirtySeen == 1)

    val clean = spark.read.parquet(outDir)
    assert(clean.count() == 3)
    assert(clean.columns.contains("pt"))
    assert(clean.filter(col("table") === "cart_info").count() == 2)
    import spark.implicits._
    assert(clean.filter(col("type") === "update")
      .select($"old"("sku_num")).as[String].collect().toSeq == Seq("2"))
  }
}
