package graft

/** r17 probe: how much of a warm-memo query's wall time is DRIVER-side
  * plan work (analysis + cache-lookup + optimization + physical
  * planning) versus execution? Queries that compose several memoized
  * frames carry logical trees with hundreds of nodes (the printed
  * plans show 100–300 Exchange nodes including memo interiors), and
  * Catalyst re-walks the whole tree on every fresh Dataset — guide
  * §7.3 names large plans as a driver bottleneck.
  *
  * Method: warm every memo the query touches (one untimed noop run),
  * then loop: build a FRESH frame (new Dataset, same shape the bench
  * times), time `.queryExecution.executedPlan` materialization
  * (planning only — no job), then time the noop write (execution,
  * which re-plans internally; the bench pays plan+exec per run).
  * Reports min-of-2 like the bench.
  *
  * Usage: runMain graft.MeasurePlanning <sfDir> <query>[,<query>...]
  */
object MeasurePlanning {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(',').toSeq
                else Seq("dwd_trade_pay_detail_suc")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm memos
      def once(): (Double, Double) = {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.queryExecution.executedPlan // forces analyze+optimize+plan
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val (p1, e1) = once(); val (p2, e2) = once()
      println(f"[plan-probe] $n%-45s plan=${math.min(p1, p2)}%.3fs exec=${math.min(e1, e2)}%.3fs (runs: plan $p1%.3f/$p2%.3f exec $e1%.3f/$e2%.3f)")
    }
    spark.stop()
  }
}
