package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression protection for EVERY named query (r9 ask #6,
  * r10 verdict #2): one dynamically-registered test per
  * `SparkEntry.queries` entry, so coverage is per-query isolated — a
  * single broken loader (the r10 events incident) fails exactly the
  * affected queries' tests with their names, not the whole sweep as a
  * block.
  *
  * Pinned invariants, per query:
  *   - the plan BUILDS (analysis + physical planning succeed);
  *   - no `CartesianProduct` — at 100 TB an unbroadcast cross join is
  *     always a bug, except the explicitly-allowlisted oracle
  *     baselines below;
  *   - no lambda fallback (`MapPartitions`/`DeserializeToObject`) —
  *     every shipped path stays inside whole-stage codegen.
  *
  * BroadcastNestedLoopJoin is allowed: the engine's 1-row scalar
  * attaches (corpus stats, decile cuts, model frames) plan as BNLJ by
  * design and stay O(rows) at any scale.
  */
class PlanPinSpec extends AnyFunSuite {
  import TestSession._

  /** Queries whose cross join is the documented ground-truth oracle
    * baseline, never the shipped scale path (VERDICT r10 "weak-by-rule,
    * accepted by design"). */
  private val cartesianOk: Set[String] = Set("sim_neardup_pairs")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"plan pin: $name") {
      val df = fn(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      if (!cartesianOk(name))
        assert(!plan.contains("CartesianProduct"),
          s"$name plan has an unbroadcast cartesian join:\n$plan")
      assert(!plan.contains("MapPartitions") && !plan.contains("DeserializeToObject"),
        s"$name plan fell out of codegen into lambda execution:\n$plan")
    }
  }

  test("sweep covers every named query (and stays in sync with oracleSql)") {
    assert(SparkEntry.queries.nonEmpty)
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle $k has no query")
    }
  }
}
