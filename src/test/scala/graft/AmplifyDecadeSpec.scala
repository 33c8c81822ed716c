package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GmallDwdDb

/** Pins the invariants the decade measurements rest on (SCALE.md's
  * second/third measured decades use [[AmplifyDecade]] as the data
  * synthesizer). If the amplifier welded copies together or skewed the
  * envelope mix, the recorded exponents would be artifacts of the
  * synthesis rather than properties of the operators — so the
  * structure-preservation claims get regression pins here, on a
  * sf0.001 amplification cheap enough for the suite.
  */
class AmplifyDecadeSpec extends AnyFunSuite {
  import TestSession._

  private lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("amp-spec").toString
    AmplifyDecade.amplify(spark, sf, dir)
    dir
  }

  test("facts scale exactly x10 with fully disjoint keys; dims verbatim") {
    for (t <- Seq("orders", "lineitem", "documents", "events")) {
      val src = spark.read.parquet(s"$sf/$t.parquet").count()
      val amp = spark.read.parquet(s"$out/$t.parquet").count()
      assert(amp == src * AmplifyDecade.Copies, s"$t count")
    }
    // keys stay unique after shifting — copies land in disjoint ranges
    for ((t, k) <- Seq("orders" -> "o_orderkey", "documents" -> "doc_id",
                       "events" -> "event_id")) {
      val df = spark.read.parquet(s"$out/$t.parquet")
      assert(df.select(countDistinct(col(k))).head().getLong(0) == df.count(),
        s"$t.$k uniqueness")
    }
    // dims copy verbatim (bit-identical content, not just count)
    for (t <- Seq("nation", "part", "customer")) {
      val src = spark.read.parquet(s"$sf/$t.parquet")
      assert(src.exceptAll(spark.read.parquet(s"$out/$t.parquet")).isEmpty &&
        spark.read.parquet(s"$out/$t.parquet").exceptAll(src).isEmpty, t)
    }
  }

  test("envelope row mix reproduces per copy: order slices x10, user x1") {
    def mix(dir: String) = GmallDwdDb.envelopeJson(spark, dir)
      .select(get_json_object(col("value"), "$.table").as("table"),
        get_json_object(col("value"), "$.type").as("type"))
      .groupBy("table", "type").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val (src, amp) = (mix(sf), mix(out))
    assert(amp.keySet == src.keySet, "slice sets differ")
    src.foreach { case (k, n) =>
      // every order-derived slice multiplies with the fact load; the one
      // customer-derived slice (user_info registrations, c%3==0) stays
      // flat because dims copy verbatim — fixed user population, 10x
      // activity, the realistic amplification shape
      val want = if (k == ("user_info", "insert")) n else n * AmplifyDecade.Copies
      assert(amp(k) == want, s"slice $k")
    }
  }

  test("flagship join output scales x10 — key multiplicities preserved") {
    val src = SparkEntry.queries("dwd_trade_order_detail")(spark, sf).count()
    val amp = SparkEntry.queries("dwd_trade_order_detail")(spark, out).count()
    assert(amp == src * AmplifyDecade.Copies, s"flagship $src -> $amp")
  }

  test("LSH near-dup pairs scale x10 — zero cross-copy welds") {
    val src = SparkEntry.queries("dedup_minhash_lsh")(spark, sf).count()
    val amp = SparkEntry.queries("dedup_minhash_lsh")(spark, out).count()
    // exact duplicates of the corpus would weld each doc into a
    // 10-clique (pairs x45); token suffixing must keep it at x10
    assert(amp == src * AmplifyDecade.Copies, s"lsh pairs $src -> $amp")
  }

  test("vocabulary grows x10 — the per-copy token suffix is injective") {
    def vocab(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("t"))
      .filter(col("t") =!= "").select(countDistinct(col("t"))).head().getLong(0)
    val (src, amp) = (vocab(sf), vocab(out))
    // t+k = u+k iff t = u, and the trailing digit identifies the copy,
    // so distinct-token count multiplies exactly
    assert(amp == src * AmplifyDecade.Copies, s"vocab $src -> $amp")
  }
}
