package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bucketed, Tables}

/** Scan-layer levers from SCALE.md made checkable: co-located bucketed
  * joins (bucketing both fact tables by the join key removes the
  * per-query shuffle entirely) and date-partitioned layouts (a dt
  * predicate prunes the scan to the queried partitions). */
class BucketedSpec extends AnyFunSuite {
  import TestSession._

  test("co-bucketed fact-fact join plans with zero Exchange and matches the plain join") {
    val tmp = Files.createTempDirectory("graft_bucketed").toString
    // the sf0.001 tables are broadcast-sized, which would sidestep the
    // very mechanism under test — force the shuffled-join path the way
    // a 100 TB fact-fact join takes it
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderstatus")
      val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
      val ob = Bucketed.writeBucketed(o, "graft_orders_b", s"$tmp/orders", "o_orderkey", 8)
      val lb = Bucketed.writeBucketed(li, "graft_lineitem_b", s"$tmp/lineitem", "l_orderkey", 8)
      val joined = lb.join(ob, lb("l_orderkey") === ob("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("line_ct"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("gross"))
      val got = joined.collect().map(_.toString).toSet // finalizes the AQE plan
      // the join must consume the bucket layout directly: no Exchange
      // keyed by either join key anywhere in the final plan (the one
      // remaining Exchange is the groupBy on o_orderstatus)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled join consuming bucket layout:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles on the join key:\n$plan")
      // and produce the identical result to the unbucketed plan
      val want = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("line_ct"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("gross"))
        .collect().map(_.toString).toSet
      assert(got == want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    }
  }

  test("dt-partitioned layout prunes the scan to the queried day") {
    val tmp = Files.createTempDirectory("graft_partitioned").toString
    // the DWS/ADS layout at 100 TB: every table partitioned by day
    Tables.orders(spark, sf)
      .withColumn("dt", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("dt").parquet(tmp)
    val all = spark.read.parquet(tmp)
    val days = all.select("dt").distinct().count()
    assert(days > 10, s"fixture has only $days days")
    // partition-column type inference reads dt back as DATE
    val oneDay = all.filter(col("dt") === lit(all.select(min(col("dt"))).head().get(0)))
    // partition pruning happens at planning: the scan's file-read
    // metric (after execution) must cover only the one dt directory,
    // not the whole table
    oneDay.collect()
    val scan = oneDay.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in plan"))
    val filesRead = scan.metrics("numFiles").value
    val totalFiles = all.inputFiles.length
    assert(filesRead < totalFiles / 5,
      s"scan not pruned: read $filesRead of $totalFiles files")
    assert(scan.toString.contains("PartitionFilters: [isnotnull(dt"),
      s"no partition filter on the scan:\n$scan")
  }
}
