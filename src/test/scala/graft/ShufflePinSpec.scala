package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-budget pins for representative heavy queries: the number of
  * `ShuffleExchangeExec` nodes each query plans must not grow — every
  * exchange is a full materialize-and-repartition of the stream, the
  * dominant cost at 100 TB, and a refactor that silently adds one
  * (a lost broadcast, a mis-keyed window, a stray repartition) is
  * invisible to the correctness gate.
  *
  * Counted on the prepared `executedPlan`, through AQE wrappers and
  * into memoized (`InMemoryRelation`) interiors — the cold-build cost
  * of the query. Pinned as an UPPER bound that is exact on a cold
  * session: once a shared frame materializes, its output partitioning
  * is known and EnsureRequirements legitimately skips downstream
  * exchanges (the warm-cache benefit), so a query planned after its
  * memo executed can count lower — never higher. Any growth is a
  * conscious, reviewed decision.
  */
class ShufflePinSpec extends AnyFunSuite {
  import TestSession._

  /** name → planned ShuffleExchangeExec count (-1 = discovery mode:
    * print the actual and pass). */
  private val pins: Map[String, Int] = Map(
    "q1_pricing_summary" -> 2,     // partial→final agg + range sort
    "j1_inner_join_agg" -> 3,      // distinct-expand agg ×2 + range sort (join broadcasts)
    "j4_star_chain" -> 3,          // agg ×2 + sort; all 4 dim joins broadcast
    "j7_full_outer_join" -> 3,     // full outer on pre-agged sides
    "dwd_trade_order_detail" -> 31, // cold build: envelope memo + dim memos + wide join
    "dws_trade_order_window" -> 6,
    "ads_trademark_stats" -> 12,
    "ads_category_stats" -> 12,
    "dedup_minhash_lsh" -> 7,
    "dedup_components" -> 4,       // per-iteration joins hide behind localCheckpoint
    "sim_ann_ivf" -> 4,
    "search_bm25_topk" -> 10,  // +1: the workload-sized distinct that
                               // restricts tdf to query terms before
                               // its broadcast (r13 vocab-hint fix)
    "text_token_ids" -> 11,        // three-level rank decomposition, shared token explode
    "text_pack_shards" -> 10,      // two prefix-sum levels + memoized token counts
    "mm_phash_neardup" -> 6,
    "gov_skew_report" -> 8)

  /** Exchanges are inserted by plan preparation (EnsureRequirements),
    * so they exist only in `executedPlan` — under AQE that is an
    * `AdaptiveSparkPlanExec` whose initial tree hangs off `inputPlan`.
    * InMemoryTableScan IS expanded (most queries memoize their shared
    * frames, some memoize the whole query — the interior is the plan
    * that actually executes on first build), so the pin is the cost
    * of computing the query from cold parquet. Each distinct cached
    * plan counts ONCE no matter how many scans reference it (`seen`
    * below) — matching physical reality: a persisted frame
    * materializes a single time per session. */
  private def countShuffles(root: SparkPlan): Int = {
    // each cached plan counts ONCE no matter how many scans reference
    // it — that is what executes (a persisted frame materializes a
    // single time per session); per-reference re-expansion would let
    // nested memos inflate the count combinatorially. Reference-
    // identity set: identityHashCode alone can collide and silently
    // undercount.
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def go(p: SparkPlan): Int =
      p.collectWithSubqueries {
        // initialPlan, not inputPlan (predates EnsureRequirements — no
        // exchanges at all) and not executedPlan (mutates as AQE
        // re-plans at runtime: a shared memo executed by an earlier
        // suite would make the count order-dependent)
        case a: AdaptiveSparkPlanExec => go(a.initialPlan)
        // a materialized AQE stage wraps its exchange behind a leaf
        case qs: QueryStageExec => go(qs.plan)
        case im: InMemoryTableScanExec =>
          if (seen.add(im.relation.cachedPlan)) go(im.relation.cachedPlan)
          else 0
        case _: ShuffleExchangeExec => 1
      }.sum
    go(root)
  }

  pins.toSeq.sortBy(_._1).foreach { case (name, pinned) =>
    test(s"shuffle pin: $name") {
      val df = SparkEntry.queries(name)(spark, sf)
      val n = countShuffles(df.queryExecution.executedPlan)
      if (pinned < 0) info(s"DISCOVERY $name shuffles=$n")
      else assert(n <= pinned,
        s"$name plans $n shuffle exchanges, pinned $pinned — every extra " +
          s"exchange re-materializes the stream at scale; if intentional, " +
          s"update the pin:\n${df.queryExecution.executedPlan}")
    }
  }
}
