package graft

import org.apache.spark.sql.functions._

/** Cross-JVM exerciser for the PARQUET memo store's commit protocol
  * (r15 verdict task 7): two of these processes started together on
  * the SAME memo root and key race `Memo.materialize` for real —
  * the in-JVM MemoSpec hammer can't reach the `FileContext`
  * fail-on-existing rename path, because same-JVM races serialize on
  * the per-key build lock. `tools/run_memo_race.sh` launches the
  * pair, then asserts ONE winner (exactly one committed dir, no
  * `.tmp.*` residue, no nested-tmp duplication) and that both
  * processes read identical data.
  *
  * The build is made slow enough (~seconds: a 2·10⁸-row aggregate)
  * that both processes are mid-build simultaneously; the barrier file
  * handed in argv aligns their start. Prints one RACE line with the
  * frame's row count and checksum.
  *
  * Usage: RaceMemo <memoRoot> <barrierFile>
  */
object RaceMemo {
  def main(args: Array[String]): Unit = {
    val memoRoot = args(0)
    val barrier = java.nio.file.Paths.get(args(1))
    val spark = GraftSession.get()
    spark.conf.set(graft.operators.Memo.LevelConf, "PARQUET")
    spark.conf.set(graft.operators.Memo.DirConf, memoRoot)
    // barrier: both JVMs finish session init (the variable-cost part),
    // then spin until the driver script creates the file
    while (!java.nio.file.Files.exists(barrier)) Thread.sleep(20)
    val df = graft.operators.Memo(spark, "/race/dir", "race_probe") {
      spark.range(0, 200000000L)
        .select((col("id") % 100000L).as("k"), col("id"))
        .groupBy(col("k")).agg(sum(col("id")).as("s"), count(lit(1)).as("c"))
    }
    val row = df.agg(count(lit(1)), sum(col("s")), sum(col("c"))).collect()(0)
    println(s"RACE rows=${row.getLong(0)} sum=${row.get(1)} cnt=${row.get(2)}")
    spark.stop()
  }
}
