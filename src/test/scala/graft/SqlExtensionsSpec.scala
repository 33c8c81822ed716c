package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL registry forms of the native expressions must match the Column
  * API forms. */
class SqlExtensionsSpec extends AnyFunSuite {
  import TestSession._

  test("graft_* functions are callable from SQL and equal the Column API") {
    import spark.implicits._
    Seq("hello world", "图 graph 引擎").toDF("s").createOrReplaceTempView("ext_t")
    val sql = spark.sql(
      """SELECT graft_fnv1a64(s) AS h,
        |       graft_simhash64(split(s, ' ')) AS sh,
        |       graft_shingle_hashes(split(s, ' '), 2) AS sg,
        |       graft_minhash_sig(graft_shingle_hashes(split(s, ' '), 2), 4) AS mh
        |FROM ext_t ORDER BY s""".stripMargin)
      .as[(Long, Long, Seq[Long], Seq[Long])].collect().toSeq
    val api = spark.table("ext_t")
      .select(
        graft.functions.GraftExpressions.fnv1a64($"s").as("h"),
        graft.functions.GraftExpressions.simhash64(split($"s", " ")).as("sh"),
        graft.functions.GraftExpressions.shingleHashes(split($"s", " "), 2).as("sg"),
        graft.functions.GraftExpressions.minhashSig(
          graft.functions.GraftExpressions.shingleHashes(split($"s", " "), 2), 4).as("mh"))
      .orderBy($"h")
    assert(sql.map(_._1).toSet == api.select("h").as[Long].collect().toSet)
    assert(sql.map(_._2).toSet == api.select("sh").as[Long].collect().toSet)
  }

  test("graft_minhash_set_agg from SQL in GROUP BY = scalar signature of the group set") {
    import spark.implicits._
    Seq(("a", 1L), ("a", 2L), ("a", 1L), ("b", 3L))
      .toDF("g", "x").createOrReplaceTempView("ext_agg_t")
    val got = spark.sql(
      "SELECT g, graft_minhash_set_agg(x, 4) AS sig FROM ext_agg_t GROUP BY g ORDER BY g")
      .as[(String, Seq[Long])].collect().toMap
    val want = spark.table("ext_agg_t").groupBy($"g")
      .agg(collect_set($"x").as("xs"))
      .select($"g", graft.functions.GraftExpressions.minhashSig($"xs", 4).as("sig"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got == want)
  }

  test("graft_cms_sketch_agg from SQL = Column-API sketch") {
    import spark.implicits._
    Seq(1L, 2L, 1L, 3L, 1L).toDF("x").createOrReplaceTempView("ext_cms_t")
    val got = spark.sql(
      "SELECT graft_cms_sketch_agg(x, 2, 16) AS sk FROM ext_cms_t")
      .as[Seq[Long]].head()
    val want = spark.table("ext_cms_t")
      .agg(graft.functions.GraftExpressions.cmsSketchAgg($"x", 2, 16).as("sk"))
      .as[Seq[Long]].head()
    assert(got == want && got.sum == 10) // 5 elements × 2 rows
  }

  test("mistyped input fails analysis instead of returning garbage") {
    val e1 = intercept[Exception](
      spark.sql("SELECT graft_dot_long(array(1, 2), array(3, 4))").collect())
    assert(e1.getMessage.contains("array<bigint>"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_simhash64('not an array')").collect())
    assert(e2.getMessage.contains("array<string>"), e2.getMessage)
    val e3 = intercept[Exception](spark.sql("SELECT graft_fnv1a64()").collect())
    assert(e3.getMessage.contains("argument"), e3.getMessage)
  }

  test("graft_cosine_sim and graft_dot_long from SQL") {
    val r = spark.sql(
      """SELECT graft_cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                        array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        |       graft_dot_long(array(2L, 3L), array(4L, 5L)) AS d""".stripMargin)
      .collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getLong(1) == 23L)
  }
}
