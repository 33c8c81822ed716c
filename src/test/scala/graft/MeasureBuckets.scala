package graft

import org.apache.spark.sql.functions._

import graft.operators.{DimRouter, GmallDwdDb}

/** One-off measurement for SCALE.md: rewrite fraction of the bucketed
  * DIM merge on the sf0.01 order_info envelope. */
object MeasureBuckets {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val wh = java.nio.file.Files.createTempDirectory("dim_measure").toString
    val cfg = Seq(DimRouter.orderInfoConfig)
    val env = GmallDwdDb.envelope(spark, dir).cache()

    def dirBytes(table: String): Map[String, Long] = {
      val root = new java.io.File(s"$wh/$table")
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("bkt="))
        .map(b => b.getName -> b.listFiles().filter(_.isFile).map(_.length()).sum).toMap
    }

    for (n <- Seq(64, 256, 1024)) {
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$wh/dim_order_info"), true)
      val t0 = System.nanoTime()
      DimRouter.routeAndWriteBucketed(spark, env.filter(col("type") === "insert"), cfg, wh, n)
      val tBase = (System.nanoTime() - t0) / 1e9
      val before = dirBytes("dim_order_info")
      // ~1% batch: one update per okey % 100 == 3
      val batch = env.filter(col("type") === "update" &&
        col("data").getItem("id").cast("long") % 100 === 3)
      val k = batch.select(col("data").getItem("id")).distinct().count()
      val t1 = System.nanoTime()
      DimRouter.routeAndWriteBucketed(spark, batch, cfg, wh, n)
      val tMerge = (System.nanoTime() - t1) / 1e9
      val after = dirBytes("dim_order_info")
      val changed = before.keySet.filter(b => before(b) != after(b))
      val totalBytes = before.values.sum
      val changedBytes = changed.toSeq.map(before).sum
      println(f"RESULT n=$n%4d batchKeys=$k touched=${changed.size}%4d/" +
        f"$n%4d dirFrac=${changed.size.toDouble / n}%.3f byteFrac=${changedBytes.toDouble / totalBytes}%.3f " +
        f"baseSec=$tBase%.2f mergeSec=$tMerge%.2f")
    }
    spark.stop()
  }
}
