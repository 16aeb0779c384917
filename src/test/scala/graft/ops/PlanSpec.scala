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

  test("q64: non-equi band join is a broadcast nested-loop, not a shuffle") {
    val p = plan("q64_band_range_join")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "interval dimension must broadcast (a shuffle theta-join would be pathological)")
    assert(!p.contains("CartesianProduct"), "must not fall back to a cartesian product")
  }

  test("q27: prefix-filtered join — candidates from df-ranked prefixes, then verify") {
    // r7: the default path is the PPJoin scaffold. The candidate join must
    // run between PREFIX projections (each side filtered by the rn <=
    // prefix-length predicate downstream of a Window over (df, shid)),
    // never between two full postings sides — that shape is the hot-
    // shingle d² blowup this replaced. Verification joins on doc_id are
    // expected; sizes still ride along on the shingle rows (no
    // corpus-sized size-lookup join).
    val p = plan("q27_jaccard_pairs")
    assert(p.contains("Window"), "df-rank window must exist (prefix filter)")
    assert("Join".r.findAllIn(p).length >= 3,
      "candidate + verify joins expected")
    assert(!p.contains("CartesianProduct"), "no all-pairs fallback")
  }

  test("q75: full outer join sees pre-aggregated sides (no raw-table join)") {
    val p = plan("q75_full_outer_recon")
    assert(p.contains("SortMergeJoin") && p.contains("FullOuter"),
      s"full outer should sort-merge (unbroadcastable):\n${p.take(1200)}")
    // both inputs to the join must already be HashAggregates (per-key
    // totals), shrinking the join to |keys| rows
    val joinIdx = p.indexOf("SortMergeJoin")
    val after = p.substring(joinIdx)
    assert("HashAggregate".r.findAllIn(after).length >= 4,
      "join sides must be aggregated before the full outer join")
  }

  test("q66: range-frame window runs over a single user_id exchange") {
    val p = plan("q66_purchase_context")
    assert(p.contains("Window"), "expected a window operator")
    // one shuffle for the window partitioning; the purchase filter happens
    // after the frame so it must NOT be pushed into the scan
    assert(p.split("Exchange").length - 1 <= 2,
      s"too many exchanges:\n${p.take(1500)}")
  }

  test("q85: bloom pre-filter sits on the fact scan side, join is broadcast") {
    val p = plan("q85_bloom_prune")
    val joinIdx = p.indexOf("BroadcastHashJoin")
    assert(joinIdx >= 0, s"dim side should broadcast:\n${p.take(1200)}")
    // treeString prints children below their parent: the UDF bloom probe
    // must appear between the join node and the lineitem scan, i.e. as a
    // filter INSIDE the join's fact-side subtree, not above the join
    val factScanIdx = p.indexOf("lineitem.parquet")
    assert(factScanIdx > joinIdx, "fact scan must be a child of the join")
    val probeIdx = p.indexOf("UDF(", joinIdx)
    assert(probeIdx >= 0 && probeIdx < factScanIdx,
      s"bloom UDF probe must filter the fact scan before the join:\n${p.take(1500)}")
  }

  test("q89: session_window is a merging session aggregation, not a row window") {
    val p = plan("q89_session_window")
    assert(p.toLowerCase.contains("session"),
      s"expected session-window physical operators:\n${p.take(1200)}")
    assert(!p.contains("Window "),
      "builtin session windows must not fall back to a per-row window function")
  }

  test("q92: sliding window expands rows scan-side (no self-join)") {
    val p = plan("q92_sliding_window")
    assert(p.contains("Expand") || p.contains("explode"),
      s"expected scan-side row-to-window expansion:\n${p.take(1200)}")
    assert(!p.contains("Join"), "sliding windows must not join")
    // still a two-phase aggregation over the expanded rows
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstAgg >= 0 && p.indexOf("HashAggregate", firstAgg + 1) > firstAgg)
  }

  test("q110: as-of range probe broadcasts the intervalized dimension") {
    val p = plan("q110_asof_join")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the fact side must probe a broadcast interval list, never shuffle")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q112: top-k tokens is a TakeOrdered, not a global sort") {
    val p = plan("q112_zipf_curve")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject:\n${p.take(1200)}")
  }

  test("q122: semi join is broadcast and ships only the key column") {
    val p = plan("q122_semi_join")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"))
    assert(!p.contains("c_mktsegment], Batched") || p.contains("ReadSchema: struct<c_custkey:bigint,c_mktsegment:string>"),
      "dim scan should read only the key + filter columns")
  }

  test("q103: levenshtein probe side is spread by an explicit repartition") {
    val p = plan("q103_edit_distance_pairs")
    assert(p.contains("REPARTITION_BY_NUM"),
      s"probe repartition must pin partition count (AQE would coalesce):\n${p.take(1500)}")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q142: digest stage is pinned-width and bucket rollup adds no second exchange") {
    val p = plan("q142_table_diff")
    assert(p.contains("REPARTITION_BY_NUM"),
      s"digest repartition must pin width:\n${p.take(1500)}")
    // single-pass shape: both manifests project from ONE scan, so the
    // whole query carries exactly one hashpartitioning exchange (the
    // pinned digest repartition — the grouped rollup reuses it) and no
    // join operator at all
    val exchanges = "Exchange hashpartitioning\\(bucket".r
      .findAllIn(p).length
    assert(exchanges == 1,
      s"expected exactly the one pinned repartition on bucket:\n${p.take(1500)}")
    assert(!p.contains("Join"),
      s"manifest compare must not join (one-pass aggregate):\n${p.take(1500)}")
  }

  test("q129: zorder value is plain shift/mask arithmetic inside codegen") {
    val p = plan("q129_zorder_layout")
    assert(p.contains("shiftleft") || p.contains("<<"),
      "z-value must be computed by builtin bit ops")
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("Invoke"),
      "no UDF/invoke in the z-order path")
  }

  test("q145: calendar side of the band join is broadcast") {
    val p = plan("q145_rolling_uniques")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"calendar × user-days band join must broadcast the calendar:\n${p.take(1200)}")
  }

  test("q151: skyline is the sort-based prefix-min sweep — no pairwise dominance join") {
    val p = plan("q151_skyline_parts")
    // the r11 shape broadcast a corpus-proportional manifest into an
    // O(|parts|^2) BNLJ anti-join; the sweep form must keep every join
    // hash-based (the prefix table + the manifest equi-join back)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"quadratic dominance join resurfaced:\n${p.take(1200)}")
    assert(p.contains("BroadcastHashJoin"),
      s"prefix-min stitch + manifest join must stay hash joins:\n${p.take(1200)}")
  }

  test("q158: each stats leg prunes its scan to the single profiled column") {
    val p = plan("q158_column_stats")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint>"),
      "l_orderkey leg must read exactly one column")
    assert(p.contains("ReadSchema: struct<l_returnflag:string>"),
      "l_returnflag leg must read exactly one column")
  }

  test("q171: basket pairs expand in-task — exactly one corpus aggregate, no self-join") {
    val p = plan("q171_basket_lift")
    // the only Join nodes are the tiny freq/total enrichments (broadcast);
    // the corpus itself is never self-joined
    assert(!p.contains("SortMergeJoin"),
      s"pair expansion must not shuffle-join the corpus:\n${p.take(1500)}")
    assert(p.contains("Generate explode") || p.contains("Generate posexplode"),
      "pairs must come from in-array expansion")
  }

  test("q181: the CMS recount scan pushes the probe-set filter down") {
    val p = plan("q181_cms_heavy")
    assert(p.contains("PushedFilters: [IsNotNull(l_partkey), LessThan(l_partkey"),
      s"probe-set bound must reach the parquet scan:\n${p.take(1500)}")
  }

  test("q177: a snapshot scan reads only that version's live files") {
    // v1 = one file set (f_open): the first union leg's scan must list
    // exactly one path root; the retired f_filled path must not appear
    // anywhere after v2 (it is removed at v3, and v1 predates it)
    val li = SparkEntry.queries("q177_time_travel")(spark, sf("sf0.001"))
    val p = li.queryExecution.executedPlan.treeString
    assert(!p.contains("f_filled") ||
      "f_filled".r.findAllIn(p).length == 1,
      "the retired file may appear in at most the v2 snapshot leg")
  }

  test("q188: the sampled side aggregates partially before the final combine") {
    val p = plan("q188_systematic_sample")
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstAgg >= 0 && p.indexOf("HashAggregate", firstAgg + 1) > firstAgg,
      "per-stratum sample audit must two-phase aggregate")
  }

  test("q270: power-iteration half-steps broadcast the 64-row vector, not the corpus") {
    // the t half-steps carry v as a broadcast 1-row ARRAY column (a
    // broadcast nested-loop join against one row — the whole-array fold
    // shape); nothing may shuffle the corpus to meet the vector side
    val p = plan("q270_power_iteration")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the vector side must broadcast")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"),
      s"no corpus shuffle join in the half-steps:\n${p.take(1200)}")
  }

  test("q267: RAKE word-statistics join broadcasts the vocabulary side") {
    val p = plan("q267_rake_keywords")
    assert(p.contains("BroadcastHashJoin"),
      "per-source vocabulary stats must broadcast onto the occurrence scan")
    assert(!p.contains("CartesianProduct"))
  }

  test("q269: density-outlier bucket histogram broadcasts back onto the scan") {
    val p = plan("q269_density_outliers")
    assert(p.contains("BroadcastHashJoin"),
      "the 2^bits bucket-size frame must broadcast, never shuffle the corpus")
  }

  test("q264: weighted sampling is one window pass — no join, no corpus self-shuffle") {
    val p = plan("q264_poisson_sample")
    assert(!p.contains("Join"), "priority sampling must not join")
    assert(p.contains("Window"), "per-source top-k via window rank")
  }

  test("q284: the Markov fixed-point iterates on the transition rollup, not the corpus") {
    // after the one corpus pass (checkpointed rollup), each iteration
    // joins |types|-sized frames; no scan of events may appear twice
    val p = plan("q284_markov_stationary")
    assert("Scan parquet".r.findAllIn(p).length <= 1,
      "the corpus is scanned at most once (rollup is checkpointed)")
  }

  test("q129/q188/q346/q368/q388: no corpus-sized unpartitioned window survives") {
    // These five previously funneled the whole corpus through ONE
    // partition via a global-order window. After the q195/q196 two-level
    // decomposition, the only unpartitioned windows left must be the
    // bucket-prefix windows — frames of bucket cardinality (corpus/64k or
    // a few thousand rows), whose order key is exactly the bucket column.
    def unpartitionedWindows(df: org.apache.spark.sql.DataFrame) = {
      val root = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      root.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }
    }
    Seq("q129_zorder_layout", "q188_systematic_sample",
        "q346_lateness_audit", "q368_cvm_ad").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf("sf0.001"))
      val bad = unpartitionedWindows(df).filterNot(
        _.orderSpec.flatMap(_.child.references.toSeq).map(_.name).forall(n => n == "bkt" || n == "__bkt"))
      assert(bad.isEmpty,
        s"$q still has a global window not over the bucket table: " +
          bad.map(_.orderSpec.mkString(",")).mkString("; "))
    }
    // q388 localCheckpoints the lateness frame (plan truncation), so pin
    // the shared helper it consumes directly.
    val late = Warehouse.arrivalLatenessUs(
      graft.Tables.events(spark, sf("sf0.001")))
    val bad = unpartitionedWindows(late).filterNot(
      _.orderSpec.flatMap(_.child.references.toSeq).map(_.name).forall(n => n == "bkt" || n == "__bkt"))
    assert(bad.isEmpty, "arrivalLatenessUs must keep its corpus window partitioned")
  }

  test("q118: VARIANT is parsed once — five variant_gets share one parse_json") {
    // CollapseProject must NOT inline the non-cheap parseJson into each
    // consuming variant_get (5x re-parse per row otherwise)
    val p = plan("q118_variant_suite")
    assert("parseJson".r.findAllIn(p).length == 1,
      s"expected exactly one parse_json evaluation:\n${p.take(1500)}")
    assert("variant_get".r.findAllIn(p).length >= 4,
      "the typed path extractions consume the shared variant column")
  }
}
