package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

object MeasureEdit {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("ngram_jaccard cold")(noop(Dedup.queries("dedup_ngram_jaccard")(spark, dir)))
    time("edit cold")(noop(Dedup.editDistancePairs(spark, dir)))
    time("edit warm")(noop(Dedup.editDistancePairs(spark, dir)))
    val df = Dedup.editDistancePairs(spark, dir)
    val dpOnly = df.groupBy().sum("edit_dist")
    time("dp-only agg 1")(dpOnly.head())
    time("dp-only agg 2")(dpOnly.head())
    println("load=" + java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage)
  }
}
