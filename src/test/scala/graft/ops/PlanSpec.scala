package graft.ops

import graft.{SparkSpec, SparkEntry}

/** Plan-shape assertions: the physical properties the engine's 100 TB
  * posture depends on (SURVEY.md §4) must not silently regress.
  */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf("sf0.001"))
      .queryExecution.executedPlan.treeString

  test("q01: shipdate filter and column pruning reach the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey"), "pruned columns must not be read")
  }

  test("q11: all dimension joins are broadcast") {
    val p = plan("q11_nation_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"),
      "no sort-merge join expected at this scale with broadcast dims")
  }

  test("q01/q07: aggregation is two-phase (partial before the shuffle)") {
    Seq("q01_pricing_summary", "q07_events_by_type").foreach { q =>
      val p = plan(q)
      val firstAgg = p.indexOf("HashAggregate")
      assert(firstAgg >= 0, s"$q should hash-aggregate")
      assert(p.indexOf("HashAggregate", firstAgg + 1) > firstAgg,
        s"$q should have partial+final HashAggregate")
    }
  }

  test("q57: top_k_by aggregate has partial merge (map-side combine)") {
    val p = plan("q57_topk_per_user")
    assert(p.contains("partial_top_k_by") || p.contains("ObjectHashAggregate"),
      s"expected partial aggregation:\n${p.take(1200)}")
  }
}
