package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DimRouter
import graft.operators.DimRouter.TableProcess
import graft.streaming.LogStream

/** Config-driven DIM routing: table routing, column pruning,
  * latest-wins upsert, delete propagation (J5/P9/K3). */
class DimRouterSpec extends AnyFunSuite {
  import TestSession._

  private val configs = Seq(
    TableProcess("user_info", "dim_user_info", Seq("id", "name", "email"), "id"),
    TableProcess("sku_info", "dim_sku_info", Seq("id", "price"), "id"))

  private def envelope(rows: String*) = {
    import spark.implicits._
    LogStream.maxwellEnvelope(rows.toDF("value"))
  }

  test("route splits by table and prunes to sinkColumns") {
    val env = envelope(
      """{"database":"gmall","table":"user_info","type":"insert","data":{"id":"1","name":"a","email":"a@x","secret":"drop-me"},"ts":10}""",
      """{"database":"gmall","table":"sku_info","type":"insert","data":{"id":"7","price":"9.99","internal":"drop-me"},"ts":11}""",
      """{"database":"gmall","table":"unrelated","type":"insert","data":{"id":"9"},"ts":12}""")
    val routed = DimRouter.route(env, configs)
    assert(routed.keySet == Set("dim_user_info", "dim_sku_info"))
    val u = routed("dim_user_info")
    assert(u.columns.toSeq == Seq("id", "name", "email", "_cdc_ts"))
    assert(u.count() == 1)
    assert(routed("dim_sku_info").columns.toSeq == Seq("id", "price", "_cdc_ts"))
  }

  test("streaming DIM route: foreachBatch micro-batches accumulate table state") {
    // DimApp.java's full streaming loop: a readStream of Maxwell lines,
    // routeAndWrite per micro-batch, DIM state accumulating across
    // batches — update beats the prior batch's insert, delete drops,
    // a later re-insert restores
    import org.apache.spark.sql.streaming.Trigger
    val inDir = Files.createTempDirectory("dim_in").toString
    val wh = Files.createTempDirectory("dim_wh").toString
    val batch1 = Seq(
      """{"database":"g","table":"user_info","type":"insert","data":{"id":"1","name":"a","email":"a@x"},"ts":10}""",
      """{"database":"g","table":"user_info","type":"insert","data":{"id":"2","name":"b","email":"b@x"},"ts":10}""",
      """{"database":"g","table":"user_info","type":"insert","data":{"id":"3","name":"c","email":"c@x"},"ts":10}""")
    val batch2 = Seq(
      """{"database":"g","table":"user_info","type":"update","data":{"id":"1","name":"a2","email":"a@x"},"ts":20}""",
      """{"database":"g","table":"user_info","type":"delete","data":{"id":"2"},"ts":21}""",
      """{"database":"g","table":"user_info","type":"delete","data":{"id":"3"},"ts":21}""",
      """{"database":"g","table":"user_info","type":"insert","data":{"id":"3","name":"c2","email":"c2@x"},"ts":22}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(inDir, "b1.jsonl"),
      batch1.mkString("\n").getBytes("UTF-8"))
    def runOnce(): Unit = {
      val q = LogStream.maxwellEnvelope(spark.readStream.text(inDir))
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$inDir-ck")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          DimRouter.routeAndWrite(spark, b, configs.take(1), wh)
        }.start()
      assert(q.awaitTermination(120000), "DIM micro-batch run timed out")
    }
    runOnce()
    assert(spark.read.parquet(s"$wh/dim_user_info").count() == 3)
    java.nio.file.Files.write(java.nio.file.Paths.get(inDir, "b2.jsonl"),
      batch2.mkString("\n").getBytes("UTF-8"))
    runOnce() // checkpointed: only b2 is a new micro-batch
    import spark.implicits._
    val state = spark.read.parquet(s"$wh/dim_user_info")
      .select($"id", $"name", $"_cdc_ts").as[(String, String, Long)]
      .collect().sortBy(_._1).toSeq
    assert(state == Seq(("1", "a2", 20L), ("3", "c2", 22L)),
      s"cumulative DIM state diverged: $state")
  }

  test("upsert is latest-wins per PK; delete rows are dropped on write") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("dim_router").toString
    // batch 1: two users
    DimRouter.routeAndWrite(spark, envelope(
      """{"database":"g","table":"user_info","type":"insert","data":{"id":"1","name":"a","email":"a@x"},"ts":10}""",
      """{"database":"g","table":"user_info","type":"insert","data":{"id":"2","name":"b","email":"b@x"},"ts":10}"""),
      configs, tmp)
    // batch 2: update user 1, delete user 2, insert user 3
    DimRouter.routeAndWrite(spark, envelope(
      """{"database":"g","table":"user_info","type":"update","data":{"id":"1","name":"a2","email":"a@x"},"old":{"name":"a"},"ts":20}""",
      """{"database":"g","table":"user_info","type":"delete","data":{"id":"2","name":"b","email":"b@x"},"ts":20}""",
      """{"database":"g","table":"user_info","type":"insert","data":{"id":"3","name":"c","email":"c@x"},"ts":20}"""),
      configs, tmp)
    val state = spark.read.parquet(s"$tmp/dim_user_info")
      .select("id", "name").as[(String, String)].collect().toMap
    assert(state == Map("1" -> "a2", "3" -> "c"))
  }

  test("delete then re-insert of the same PK in one batch keeps the newer row") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("dim_router2").toString
    DimRouter.routeAndWrite(spark, envelope(
      """{"database":"g","table":"user_info","type":"insert","data":{"id":"1","name":"a","email":"a@x"},"ts":10}"""),
      configs, tmp)
    DimRouter.routeAndWrite(spark, envelope(
      """{"database":"g","table":"user_info","type":"delete","data":{"id":"1","name":"a","email":"a@x"},"ts":20}""",
      """{"database":"g","table":"user_info","type":"insert","data":{"id":"1","name":"a-back","email":"a@x"},"ts":21}""",
      """{"database":"g","table":"user_info","type":"insert","data":{"id":"2","name":"b","email":"b@x"},"ts":21}""",
      """{"database":"g","table":"user_info","type":"delete","data":{"id":"2","name":"b","email":"b@x"},"ts":22}"""),
      configs, tmp)
    val state = spark.read.parquet(s"$tmp/dim_user_info")
      .select("id", "name").as[(String, String)].collect().toMap
    // id 1: delete@20 then re-insert@21 -> row survives with the new value
    // id 2: insert@21 then delete@22 -> row gone
    assert(state == Map("1" -> "a-back"))
  }

  test("interrupted swap (dst missing, .old present) is repaired, not reset") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("dim_router_crash").toString
    DimRouter.routeAndWrite(spark, envelope(
      """{"database":"g","table":"user_info","type":"insert","data":{"id":"1","name":"a","email":"a@x"},"ts":10}""",
      """{"database":"g","table":"user_info","type":"insert","data":{"id":"2","name":"b","email":"b@x"},"ts":10}"""),
      configs, tmp)
    // simulate a crash between rename(dst, old) and rename(tmp, dst):
    // the table dir is gone and .old holds the only copy of prior state
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$tmp/dim_user_info"),
      new org.apache.hadoop.fs.Path(s"$tmp/dim_user_info.old")))
    // the next batch must merge against the RECOVERED base — without
    // repair it would see tableExists=false and reset to this batch
    DimRouter.routeAndWrite(spark, envelope(
      """{"database":"g","table":"user_info","type":"insert","data":{"id":"3","name":"c","email":"c@x"},"ts":20}"""),
      configs, tmp)
    val state = spark.read.parquet(s"$tmp/dim_user_info")
      .select("id").as[String].collect().toSet
    assert(state == Set("1", "2", "3"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$tmp/dim_user_info.old")))
  }

  // --- bucketed (O(batch)) merge path ---------------------------------

  private def insertRow(id: Int, name: String, ts: Long) =
    s"""{"database":"g","table":"user_info","type":"insert","data":{"id":"$id","name":"$name","email":"$name@x"},"ts":$ts}"""

  private def bucketFiles(dir: String): Map[String, Map[String, (Long, Long)]] = {
    val root = new java.io.File(dir)
    root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("bkt="))
      .map { b =>
        b.getName -> b.listFiles().filter(_.isFile)
          .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
      }.toMap
  }

  test("bucketed merge: cumulative state matches the full-rewrite path") {
    import spark.implicits._
    val whFull = Files.createTempDirectory("dim_full").toString
    val whBkt = Files.createTempDirectory("dim_bkt").toString
    val b1 = envelope((1 to 40).map(i => insertRow(i, s"u$i", 10)): _*)
    val b2 = envelope(
      """{"database":"g","table":"user_info","type":"update","data":{"id":"3","name":"u3-v2","email":"u3@x"},"ts":20}""",
      """{"database":"g","table":"user_info","type":"delete","data":{"id":"7","name":"u7","email":"u7@x"},"ts":20}""",
      insertRow(41, "u41", 20))
    Seq(b1, b2).foreach { b =>
      DimRouter.routeAndWrite(spark, b, configs, whFull)
      DimRouter.routeAndWriteBucketed(spark, b, configs, whBkt, nBuckets = 8)
    }
    val full = spark.read.parquet(s"$whFull/dim_user_info")
      .select($"id", $"name", $"email", $"_cdc_ts")
      .as[(String, String, String, Long)].collect().sortBy(_._1).toSeq
    val bkt = DimRouter.readBucketedDim(spark, whBkt, "dim_user_info")
      .select($"id", $"name", $"email", $"_cdc_ts")
      .as[(String, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(bkt == full, "bucketed merge state diverged from the full-rewrite path")
    assert(full.size == 40) // 40 inserts + 1 insert - 1 delete
  }

  test("bucketed merge rewrites only the touched buckets (others byte-identical)") {
    val wh = Files.createTempDirectory("dim_bkt_touch").toString
    val n = 8
    DimRouter.routeAndWriteBucketed(spark,
      envelope((1 to 64).map(i => insertRow(i, s"u$i", 10)): _*),
      configs, wh, nBuckets = n)
    val table = s"$wh/dim_user_info"
    val before = bucketFiles(table)
    assert(before.size == n, s"expected all $n buckets populated, got ${before.keySet}")
    // one updated PK → exactly one touched bucket
    DimRouter.routeAndWriteBucketed(spark, envelope(
      """{"database":"g","table":"user_info","type":"update","data":{"id":"5","name":"u5-v2","email":"u5@x"},"ts":20}"""),
      configs, wh, nBuckets = n)
    val after = bucketFiles(table)
    val changed = before.keySet.filter(b => before(b) != after(b))
    assert(changed.size == 1,
      s"expected exactly 1 rewritten bucket, got $changed")
    val untouched = before.keySet -- changed
    untouched.foreach { b =>
      assert(after(b) == before(b),
        s"untouched bucket $b was rewritten (files/sizes/mtimes differ)")
    }
    // and the merge result is correct
    import spark.implicits._
    val state = DimRouter.readBucketedDim(spark, wh, "dim_user_info")
      .select($"id", $"name").as[(String, String)].collect().toMap
    assert(state("5") == "u5-v2" && state.size == 64)
  }

  test("bucketed merge: delete-then-reinsert in one batch; emptied bucket dir is removed") {
    import spark.implicits._
    val wh = Files.createTempDirectory("dim_bkt_del").toString
    // nBuckets=1 would defeat the point; use 4 and delete every PK of one bucket
    DimRouter.routeAndWriteBucketed(spark,
      envelope((1 to 12).map(i => insertRow(i, s"u$i", 10)): _*),
      configs, wh, nBuckets = 4)
    val byBucket = DimRouter.readBucketedDim(spark, wh, "dim_user_info")
      .withColumn("bkt", DimRouter.bucketOf(col("id"), 4))
      .select($"bkt", $"id").as[(Int, String)].collect()
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).toSet }
    val (victim, victims) = byBucket.head
    val dels = victims.toSeq.map(id =>
      s"""{"database":"g","table":"user_info","type":"delete","data":{"id":"$id"},"ts":20}""")
    DimRouter.routeAndWriteBucketed(spark, envelope(
      dels :+ """{"database":"g","table":"user_info","type":"delete","data":{"id":"1","name":"u1","email":"u1@x"},"ts":20}"""
        :+ """{"database":"g","table":"user_info","type":"insert","data":{"id":"1","name":"u1-back","email":"u1@x"},"ts":21}""": _*),
      configs, wh, nBuckets = 4)
    val state = DimRouter.readBucketedDim(spark, wh, "dim_user_info")
      .select($"id", $"name").as[(String, String)].collect().toMap
    val expectGone = victims - "1"
    assert(expectGone.forall(!state.contains(_)), s"deleted PKs survived: $state")
    if (victims.contains("1")) assert(state("1") == "u1-back")
    // fully-emptied bucket leaves no partition dir behind
    val liveBkts = DimRouter.readBucketedDim(spark, wh, "dim_user_info")
      .withColumn("bkt", DimRouter.bucketOf(col("id"), 4))
      .select("bkt").distinct().as[Int].collect().toSet
    val onDisk = new java.io.File(s"$wh/dim_user_info").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bkt="))
      .map(_.getName.stripPrefix("bkt=").toInt).toSet
    if (!liveBkts.contains(victim)) assert(!onDisk.contains(victim),
      s"emptied bucket bkt=$victim still has a directory on disk")
  }

  test("bucketed merge: interrupted per-bucket swap is repaired, not reset") {
    import spark.implicits._
    val wh = Files.createTempDirectory("dim_bkt_crash").toString
    DimRouter.routeAndWriteBucketed(spark,
      envelope((1 to 16).map(i => insertRow(i, s"u$i", 10)): _*),
      configs, wh, nBuckets = 4)
    // simulate a crash between rename(dst, old) and rename(src, dst)
    // for bucket 2: the aside dir holds the only copy of that bucket
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val table = s"$wh/dim_user_info"
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$table/bkt=2"),
      new org.apache.hadoop.fs.Path(s"$table/.old-bkt-2")))
    val preCount = 16
    // next batch (touching a different PK) must first recover bkt=2
    DimRouter.routeAndWriteBucketed(spark, envelope(insertRow(17, "u17", 20)),
      configs, wh, nBuckets = 4)
    val state = DimRouter.readBucketedDim(spark, wh, "dim_user_info")
      .select("id").as[String].collect().toSet
    assert(state == (1 to 17).map(_.toString).toSet,
      s"recovered state lost rows: ${state.size}/$preCount+1")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$table/.old-bkt-2")))
  }

  test("upsert prefers the update over existing on equal ts") {
    import spark.implicits._
    val existing = Seq(("1", "old", 5L)).toDF("id", "name", "_cdc_ts")
    val updates = Seq(("1", "new", 5L)).toDF("id", "name", "_cdc_ts")
    val merged = DimRouter.upsert(existing, updates, "id")
    assert(merged.select("name").as[String].collect().toSeq == Seq("new"))
  }
}
