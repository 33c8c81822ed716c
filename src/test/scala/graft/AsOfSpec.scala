package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

/** As-of join semantics, including the nullable-payload atomicity
  * case (the matched right row must arrive whole, never stitched
  * from different rows). */
class AsOfSpec extends AnyFunSuite {
  import TestSession._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("matched right row is atomic even when its columns are null") {
    import spark.implicits._
    val left = Seq((1L, ts(3), "L1"), (1L, ts(10), "L2"), (2L, ts(5), "L3"))
      .toDF("k", "lts", "lv")
    val right = Seq(
      (1L, ts(1), Option("A"), Option("X")),
      (1L, ts(2), Option("B"), Option.empty[String]), // col2 null in the newest row
      (2L, ts(9), Option("C"), Option("Y")))          // after left's ts -> no match
      .toDF("k", "rts", "c1", "c2")
    val got = AsOf.asOfJoin(left, right, "k", "lts", "rts", Seq("c1", "c2"))
      .select("lv", "c1", "c2")
      .as[(String, Option[String], Option[String])].collect().toSet
    assert(got == Set(
      ("L1", Some("B"), None),   // whole ts=2 row, NOT (B, X)
      ("L2", Some("B"), None),
      ("L3", None, None)))       // nothing at or before ts=5 for key 2
  }

  test("inclusive bound: right row at exactly left ts matches") {
    import spark.implicits._
    val left = Seq((1L, ts(5), "L")).toDF("k", "lts", "lv")
    val right = Seq((1L, ts(5), "R5"), (1L, ts(4), "R4")).toDF("k", "rts", "rv")
    val got = AsOf.asOfJoin(left, right, "k", "lts", "rts", Seq("rv"))
      .select("rv").as[String].collect().toSeq
    assert(got == Seq("R5"))
  }
}
