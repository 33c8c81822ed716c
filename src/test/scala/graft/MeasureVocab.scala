package graft

import org.apache.spark.sql.functions._

/** One-off decade measurement for the vocabulary-proportional paths
  * (r15 verdict task 5): per dir, token mass, distinct vocabulary,
  * mean token length, and the byte sizes that decide the
  * broadcast-vs-shuffle transitions in `text_token_ids` /
  * `search_incremental_postings` — the arithmetic SCALE.md's analysis
  * rests on. Usage: runMain graft.MeasureVocab <dir> [dir...]
  */
object MeasureVocab {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    args.foreach { dir =>
      val toks = graft.operators.Curation.tokensOf(
        graft.sources.Tables.spread(spark, graft.sources.Tables.documents(spark, dir)))
      val m = toks.agg(count(lit(1)).as("mass"), avg(length(col("token"))).as("len"))
        .collect()(0)
      val v = toks.select(col("token")).distinct().count()
      println(f"[vocab] dir=$dir mass=${m.getLong(0)} vocab=$v avg_token_len=${m.getDouble(1)}%.2f " +
        f"ids_table_mb=${v * (m.getDouble(1) + 8 + 16) / 1e6}%.1f " +
        f"token_stream_mb=${m.getLong(0) * (m.getDouble(1) + 16) / 1e6}%.1f")
    }
    spark.stop()
  }
}
