package graft

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.LogStream

/** One-off measurement for SCALE.md (r14 verdict ask #7): STREAMING
  * ingest throughput of both reference topics, native parse vs
  * `from_json` — the batch legs already prove the native expressions
  * faster; this anchors the "ingest is scan-speed" claim in the
  * `readStream` form the reference actually runs (`BaseLogApp` /
  * `MyKafkaUtil` consumers parse every record of `topic_log` /
  * `topic_db`).
  *
  * Method: synthesize each topic's line files once from the sf dir's
  * own fixtures (`GmallDwdDb.envelopeJson`, `GmallDwd.logJson`),
  * replicated to ~target-row volume and staged as 64 text files. Each
  * variant runs the SAME file-stream plan shape — text source →
  * parse-with-Generate-barrier → per-batch full-field hash reduce in
  * `foreachBatch` — with ONLY the parser expression differing, over 4
  * micro-batches (maxFilesPerTrigger=16, AvailableNow). The probe
  * hashes every top-level field so neither variant can skip parsing
  * work. rows/sec = staged rows / wall seconds, min wall of 2 runs
  * (run 1 absorbs stream-start and JIT warmup; both variants pay the
  * same fixed query-start cost, which UNDERSTATES the native gain).
  */
object MeasureIngest {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val targetRows = sys.env.getOrElse("GRAFT_INGEST_ROWS", "2000000").toLong

    def stage(name: String, lines: DataFrame): (String, Long) = {
      val base = lines.count()
      val copies = math.max(1L, (targetRows + base - 1) / base).toInt
      val out = Files.createTempDirectory(s"ingest_$name").toString
      lines.withColumn("c", explode(lit((1 to copies).toArray))).drop("c")
        .repartition(64).write.mode("overwrite").text(out)
      val staged = spark.read.text(out).count()
      println(s"$name: staged $staged lines (${copies}x of $base) in $out")
      (out, staged)
    }

    def bench(name: String, in: String, rows: Long,
              parser: Column, probe: Seq[Column]): Double = {
      val walls = (1 to 2).map { _ =>
        val raw = spark.readStream
          .option("maxFilesPerTrigger", 16).text(in)
        val parsed = raw.select(col("value"), explode(array(parser)).as("parsed"))
        val t0 = System.nanoTime()
        val q = parsed.writeStream
          .outputMode(OutputMode.Append)
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation",
            Files.createTempDirectory(s"ingest_ck_$name").toString)
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.select(xxhash64(probe: _*).as("h")).agg(sum(col("h"))).collect(); ()
          }
          .start()
        q.awaitTermination()
        (System.nanoTime() - t0) / 1e9
      }
      val wall = walls.min
      println(f"$name%-28s wall=$wall%7.2f s  rows/s=${rows / wall}%,12.0f")
      wall
    }

    // readStream.text can't stream a DataFrame; stage concrete files
    val (dbDir, dbRows) = stage("topic_db",
      graft.operators.GmallDwdDb.envelopeJson(spark, dir))
    val (logDir, logRows) = stage("topic_log",
      graft.operators.GmallDwd.logJson(spark, dir))

    val mw = LogStream.maxwellSchema
    val mwProbe = Seq(col("parsed.database"), col("parsed.table"),
      col("parsed.type"), col("parsed.ts"),
      size(map_keys(col("parsed.data"))), size(map_keys(col("parsed.old"))))
    val pl = LogStream.pageLogSchema
    val plProbe = Seq(col("parsed.common.mid"), col("parsed.common.is_new"),
      col("parsed.page.page_id"), col("parsed.page.during_time"),
      col("parsed.start.loading_time"), size(col("parsed.displays")),
      size(col("parsed.actions")), col("parsed.err.error_code"), col("parsed.ts"))

    val results = Seq(
      ("topic_db_from_json", dbDir, dbRows, from_json(col("value"), mw), mwProbe),
      ("topic_db_native", dbDir, dbRows,
        graft.functions.GraftExpressions.maxwellParse(col("value")), mwProbe),
      ("topic_log_from_json", logDir, logRows, from_json(col("value"), pl), plProbe),
      ("topic_log_native", logDir, logRows,
        graft.functions.GraftExpressions.jsonParse(col("value"), pl), plProbe)
    ).map { case (name, in, rows, parser, probe) =>
      name -> (rows, bench(name, in, rows, parser, probe))
    }

    val json = results.map { case (n, (rows, wall)) =>
      f""""$n":{"rows":$rows,"wall_sec":$wall%.3f,"rows_per_sec":${(rows / wall).toLong}}"""
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/ingest_bench.json"), json)
    println(json)
    spark.stop()
  }
}
