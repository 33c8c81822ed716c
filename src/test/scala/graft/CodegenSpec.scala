package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExpressions._

/** Two instances of every graft expression in ONE projection over
  * non-nullable children, with codegen fallback disabled. Fixed Java
  * local names in `doGenCode` would emit duplicate declarations here
  * (non-nullable children inline without a block scope), fail janino
  * compilation, and — with fallback on — silently run interpreted.
  * Guards the ctx.freshName discipline across all graft expressions. */
class CodegenSpec extends AnyFunSuite {
  import TestSession._

  test("duplicate graft expressions in one projection survive with codegen fallback off") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val planes = Array.tabulate(8, 4)((p, j) => ((p * 4 + j) % 7).toDouble / 7 - 0.4)
      val centsF = Array(Array(1f, 2f, 3f, 4f), Array(-4f, 3f, -2f, 1f))
      val fa = array(lit(1.0f), lit(2.0f), lit(3.0f), lit(4.0f))
      val fb = array(lit(4.0f), lit(3.0f), lit(2.0f), lit(1.0f))
      val la = array(lit(1L), lit(2L), lit(3L), lit(4L))
      val lb = array(lit(-4L), lit(3L), lit(-2L), lit(1L))
      val sa = array(lit("a"), lit("b"), lit("c"), lit("d"))
      val sb = array(lit("d"), lit("c"), lit("b"), lit("a"))
      val df = spark.range(4).select(
        fnv1a64(concat_ws("_", lit("x"), col("id").cast("string"))).as("f1"),
        fnv1a64(concat_ws("_", lit("y"), col("id").cast("string"))).as("f2"),
        cosineSim(fa, fb).as("c1"), cosineSim(fb, fa).as("c2"),
        dotLong(la, lb).as("d1"), dotLong(lb, la).as("d2"),
        minhashSig(la, 8).as("m1"), minhashSig(lb, 8).as("m2"),
        simhash64(sa).as("s1"), simhash64(sb).as("s2"),
        shingleHashes(sa, 3).as("g1"), shingleHashes(sb, 3).as("g2"),
        hyperplaneBuckets(fa, planes, 4).as("h1"),
        hyperplaneBuckets(fb, planes, 4).as("h2"),
        nearestCentroidsFloat(fa, Array(0, 1), centsF, 1).as("nf1"),
        nearestCentroidsFloat(fb, Array(0, 1), centsF, 2).as("nf2"),
        segmentTokens(lit("Apple 手机壳")).as("t1"),
        segmentTokens(lit("redmi k40")).as("t2"),
        bloomMightContainLong(col("id"), CodegenSpec.testBloom).as("b1"),
        bloomMightContainLong(col("id") + 100L, CodegenSpec.testBloom).as("b2"))
      val rows = df.collect()
      assert(rows.length == 4)
      assert(rows.head.getAs[Long]("d1") == (1 * -4 + 2 * 3 + 3 * -2 + 4 * 1))
      assert(rows.head.getAs[Long]("f1") != rows.head.getAs[Long]("f2"))
      assert(rows.head.getAs[scala.collection.Seq[Int]]("nf2").length == 2)
      assert(rows.forall(_.getAs[Boolean]("b1")), "bloom must contain 0..3")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}

object CodegenSpec {
  /** Shared 0..3 filter so both probe instances reference one object. */
  val testBloom: org.apache.spark.util.sketch.BloomFilter = {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(4, 0.01)
    (0L until 4L).foreach(bf.putLong)
    bf
  }
}
