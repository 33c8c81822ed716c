package graft

import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Loader-schema pin: the driver regenerates /root/testdata between
  * rounds and has already switched events.ts encoding once
  * (TIMESTAMP(NANOS) -> TIMESTAMP(MICROS)/NTZ, round 10), which broke
  * 34 queries at analysis time. This spec makes the NEXT encoding
  * change fail here, in one test with a clear message, instead of
  * everywhere downstream.
  */
class TablesSpec extends AnyFunSuite {
  import TestSession._

  test("events.ts loads as TimestampType regardless of on-disk encoding") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType == TimestampType,
      s"Tables.events must normalize ts to TimestampType; got ${df.schema("ts").dataType}. " +
        "The driver likely regenerated testdata with a new parquet timestamp encoding — " +
        "extend the dtype branch in Tables.events.")
    assert(df.limit(1).count() == 1, "events must be readable, not just planable")
  }

  test("events.ts values agree with the raw micros to the microsecond") {
    // DuckDB oracles read the parquet natively; our loader must not
    // shift or truncate differently. Compare against a raw read with
    // timestamps surfaced as micros-since-epoch on both sides.
    import org.apache.spark.sql.functions._
    val viaLoader = Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("us")).orderBy("us").limit(100)
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val rawUs = raw.schema("ts").dataType match {
      case LongType => raw.select(expr("ts div 1000").as("us")) // nanos file
      case _ => raw.select(unix_micros(col("ts").cast(TimestampType)).as("us"))
    }
    val expected = rawUs.orderBy("us").limit(100)
    assert(viaLoader.collect().toSeq == expected.collect().toSeq)
  }

  test("all tables load and expose nonempty schemas") {
    Tables.all.foreach { t =>
      val df = Tables.load(spark, sf, t)
      assert(df.schema.nonEmpty, s"$t has empty schema")
    }
  }

  test("operator-load-bearing column types are pinned across testdata regenerations") {
    // the r10 incident generalized: any driver-side re-encode of a
    // column an operator computes on should fail HERE with the table
    // and column named, not as dozens of downstream analysis errors.
    import org.apache.spark.sql.types._
    def tpe(table: String, col: String) =
      Tables.load(spark, sf, table).schema(col).dataType
    // every datetime encoding the operator tier handles (unix_timestamp /
    // date_format / casts are defined on all three); a regeneration to
    // string or raw long would NOT be handled and must fail here
    def datetimeOk(t: DataType): Boolean = t match {
      case _: DateType | _: TimestampType | _: TimestampNTZType => true
      case _ => false
    }
    assert(datetimeOk(tpe("orders", "o_orderdate")),
      s"o_orderdate read as ${tpe("orders", "o_orderdate")}")
    assert(tpe("lineitem", "l_shipdate") == tpe("orders", "o_orderdate"),
      "l_shipdate and o_orderdate must share an encoding (CDC fixture ts math)")
    assert(tpe("documents", "text") == StringType)
    assert(tpe("documents", "doc_id") == LongType)
    tpe("embeddings", "embedding") match {
      case ArrayType(FloatType | DoubleType, _) =>
      case other => fail(s"embeddings.embedding read as $other — the ANN tier expects a float array")
    }
    assert(tpe("events", "user_id") == LongType)
    assert(tpe("events", "event_type") == StringType)
  }
}
