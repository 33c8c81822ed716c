package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-recovery proofs — the fault-tolerance story the
  * reference left commented out (its apps carry disabled 3–5 s
  * exactly-once HDFS checkpoint configs, e.g.
  * `app/dim/DimApp.java:30-33`): a stopped streaming query restarted
  * from its checkpoint must (1) restore aggregation state from the
  * state store, (2) resume the source from the recorded offsets
  * without reprocessing, and (3) never duplicate rows in the file
  * sink. All three are asserted against plain batch recomputation
  * over the union of both deliveries.
  */
class StreamRecoverySpec extends AnyFunSuite {
  import TestSession._

  private def writeLines(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes("UTF-8"))

  test("stateful restart: counts resume from the state store, not from zero") {
    val inDir = Files.createTempDirectory("rec_in").toString
    val ckpt = Files.createTempDirectory("rec_ck").toString
    val outDir = Files.createTempDirectory("rec_out").toString + "/agg"

    def runOnce(): Unit = {
      val counts = spark.readStream.text(inDir)
        .select(split(col("value"), ",")(0).as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
      val q = counts.writeStream
        .outputMode(OutputMode.Complete)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("overwrite").parquet(outDir); ()
        }
        .start()
      assert(q.awaitTermination(60000), "stream run timed out")
    }

    writeLines(inDir, "a.txt", Seq("a,1", "a,2", "b,3"))
    runOnce() // first incarnation consumes file A, checkpoints state {a:2, b:1}

    writeLines(inDir, "b.txt", Seq("a,4", "c,5"))
    runOnce() // restarted incarnation must see ONLY file B + restored state

    val got = spark.read.parquet(outDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // recovery failure modes this distinguishes: state lost -> a=1;
    // source offsets lost -> double counting -> a=4
    assert(got == Map("a" -> 3L, "b" -> 1L, "c" -> 1L),
      s"restored-state counts wrong: $got")
  }

  test("file sink restart: exactly-once across incarnations (no reprocessing, no dupes)") {
    val inDir = Files.createTempDirectory("rec2_in").toString
    val ckpt = Files.createTempDirectory("rec2_ck").toString
    val outDir = Files.createTempDirectory("rec2_out").toString + "/rows"

    def runOnce(): Unit = {
      val rows = spark.readStream.text(inDir)
        .select(split(col("value"), ",")(0).as("k"),
          split(col("value"), ",")(1).cast("long").as("v"))
      val q = rows.writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .option("path", outDir)
        .trigger(Trigger.AvailableNow())
        .format("parquet")
        .start()
      assert(q.awaitTermination(60000), "stream run timed out")
    }

    writeLines(inDir, "a.txt", Seq("x,1", "y,2"))
    runOnce()
    writeLines(inDir, "b.txt", Seq("z,3"))
    runOnce()

    // reading through the sink's _spark_metadata commit log: exactly
    // the union of both deliveries, each row exactly once
    val got = spark.read.parquet(outDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq(("x", 1L), ("y", 2L), ("z", 3L)), s"sink rows wrong: $got")
  }
}
