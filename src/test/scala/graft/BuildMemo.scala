package graft

/** Builds the shared near-dup pair memo (`dedup_ngram_pairs`) under a
  * PARQUET memo root so per-query debugging runs don't each pay the
  * decade-scale inverted-index build.
  * Usage: runMain graft.BuildMemo <sfdir> <memoroot>
  */
object BuildMemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.conf.set(graft.operators.Memo.LevelConf, "PARQUET")
    spark.conf.set(graft.operators.Memo.DirConf, args(1))
    val n = graft.operators.Memo(spark, args(0), "dedup_ngram_pairs")(
      graft.operators.Dedup.ngramJaccard(spark, args(0))).count()
    println(s"[buildmemo] dedup_ngram_pairs rows=$n under ${args(1)}")
    spark.stop()
  }
}
