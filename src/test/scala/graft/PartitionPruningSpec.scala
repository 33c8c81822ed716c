package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Evidence for the SCALE.md claim that date-partitioned layouts prune:
  * write events dt-partitioned, filter one day, and assert the physical
  * scan carries partition filters and touches only that day's files. */
class PartitionPruningSpec extends AnyFunSuite {
  import TestSession._

  test("dt-partitioned write + single-day filter scans one partition") {
    val dir = Files.createTempDirectory("part_events").toString + "/events_by_dt"
    val e = graft.sources.Tables.events(spark, sf)
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
    e.write.partitionBy("dt").mode("overwrite").parquet(dir)

    val days = spark.read.parquet(dir).select("dt").distinct().count()
    assert(days > 5, s"need multiple day partitions, got $days")

    val oneDay = spark.read.parquet(dir)
      .filter(col("dt") === "2024-01-03" && col("event_type") === "view")
      .select("event_id", "user_id")
    val scan = oneDay.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }.get
    // partition filter reached the scan (pruning, not a post-scan filter)
    assert(scan.partitionFilters.exists(_.toString.contains("dt")),
      s"no partition filter in scan: ${scan.partitionFilters}")
    // only the one day's files are selected
    assert(scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
      .forall(_.files.forall(_.getPath.toString.contains("dt=2024-01-03"))))
    // and the data filter on event_type is pushed too
    assert(scan.metadata("PushedFilters").contains("event_type"))
    assert(oneDay.count() > 0)
  }
}
