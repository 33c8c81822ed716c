package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Tokenizer

/** U1: keyword tokenizer (IK-analyzer substitute). */
class TokenizerSpec extends AnyFunSuite {
  import TestSession._

  test("segments latin, digits, and CJK bigrams") {
    assert(Tokenizer.segment("Apple iPhone13 手机壳") ==
      Seq("apple", "iphone13", "手机", "机壳"))
    assert(Tokenizer.segment("大数据") == Seq("大数", "数据"))
    assert(Tokenizer.segment("中") == Seq("中"))
    assert(Tokenizer.segment("hello, world!") == Seq("hello", "world"))
    assert(Tokenizer.segment("") == Seq.empty)
    assert(Tokenizer.segment(null) == Seq.empty)
  }

  test("null text tokenizes to an empty array; SQL function is registered") {
    import spark.implicits._
    // wrapper contract: size() is 0 on null, not NULL (the historical
    // UDF behavior downstream filters may rely on)
    val sizes = Seq(Option.empty[String], Some("a b")).toDF("t")
      .select(size(Tokenizer.tokenize($"t")).as("n")).as[Int].collect().toSeq
    assert(sizes == Seq(0, 2))
    // raw expression is reachable from SQL under its advertised name
    val viaSql = spark.sql("SELECT graft_segment_tokens('Apple 手机壳') AS toks")
      .select(explode($"toks")).as[String].collect().toSeq
    assert(viaSql == Seq("apple", "手机", "机壳"))
  }

  test("fixture invariant: documents.text is ASCII-only (keyword-oracle parity)") {
    // The keyword DWS tokenizes with Tokenizer.segment (letter/digit runs
    // + CJK bigrams) while its DuckDB oracle splits on [^a-z0-9]+ — the
    // two only coincide on pure-ASCII text. CJK handling is proven above
    // on inline fixtures; this guard makes a non-ASCII documents fixture
    // fail HERE, at the source of the assumption, instead of as an
    // opaque oracle hash mismatch.
    import spark.implicits._
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val nonAscii = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .filter(not($"text".rlike("^[\\x00-\\x7F]*$"))).count()
      assert(nonAscii == 0L,
        s"$sf/documents has $nonAscii non-ASCII texts; keyword DWS oracle " +
          "(GmallDws.dws2Cte) assumes ASCII — update it alongside the fixture")
    }
  }

  test("column form explodes one row per token (the LATERAL TABLE shape)") {
    import spark.implicits._
    val got = Seq("苹果 手机", "redmi k40").toDF("keyword")
      .select($"keyword", explode(Tokenizer.tokenize($"keyword")).as("word"))
      .as[(String, String)].collect().toSet
    assert(got == Set(("苹果 手机", "苹果"), ("苹果 手机", "手机"),
      ("redmi k40", "redmi"), ("redmi k40", "k40")))
  }
}
