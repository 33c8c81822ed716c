package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs on sf0.001, returns rows, unique sane columns") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val cols = df.columns.toSeq
      assert(cols.distinct.size == cols.size, s"$name has duplicate columns: $cols")
      assert(cols.forall(c => c.matches("[a-z0-9_]+")), s"$name has unaliased columns: $cols")
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every query with an oracle has matching column sets are aliased") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(qs.contains(k), s"oracle $k has no query")
    }
  }

  test("q1 pricing summary is exact") {
    val row = Relational.q1OnDir(spark, sf)
    assert(row.nonEmpty)
  }
}

/** Tiny indirection so the spec compiles without reflection. */
object Relational {
  def q1OnDir(spark: SparkSession, dir: String): Array[org.apache.spark.sql.Row] =
    graft.operators.Relational.q1PricingSummary(spark, dir).collect()
}
