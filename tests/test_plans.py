"""Plan-quality regression tests: lock in the physical-plan properties
documented in PLANS.md (pushdown, pruning, broadcast, top-k without sort)."""

from __future__ import annotations

from ps_datalake_spark.registry import all_queries

SPECS = all_queries()


def _formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    plan = _formatted_plan(SPECS["b10_tpch_q1"].build(spark, sf_dir))
    assert "LessThanOrEqual(l_shipdate" in plan, "shipdate filter must reach the scan"
    # pruned read schema: the unused FK columns must not be scanned
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]
    assert "HashAggregate" in plan, "partial+final hash aggregation expected"


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = _formatted_plan(SPECS["b05_join_inner_4way"].build(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, "nation/region must broadcast"
    assert "SortMergeJoin" not in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _formatted_plan(SPECS["b18_topk"].build(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, "top-k must not plan a global sort"


def test_cosine_neardup_has_no_cartesian(spark, sf_dir):
    """b36_cosine_neardup must plan a keyed shuffle (block-GEMM), never a
    cartesian/nested-loop join (round-1 'What's wrong' #2)."""
    for name in ("b36_cosine_neardup", "b36_cosine_neardup_lsh"):
        plan = _formatted_plan(SPECS[name].build(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_range_join_plans(spark, sf_dir):
    """b08_range_join aggregates via a RANGE-frame window (no join node);
    the pair-producing variant joins on the (user_id, bin) equi-key, never a
    nested loop."""
    agg_plan = _formatted_plan(SPECS["b08_range_join"].build(spark, sf_dir))
    assert "Join" not in agg_plan
    assert "Window" in agg_plan
    pairs_plan = _formatted_plan(SPECS["b08_range_join_pairs"].build(spark, sf_dir))
    assert "CartesianProduct" not in pairs_plan
    assert "BroadcastNestedLoopJoin" not in pairs_plan


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Both join sides are bucketed on the join key, so the sort-merge join
    must consume the bucketed distribution directly — no hash-partitioning
    exchange anywhere in the join subtree (broadcast disabled to force the
    merge path)."""
    from ps_datalake_spark.queries.relational import _bucketed_join_tables

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _formatted_plan(_bucketed_join_tables(spark, sf_dir))
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_tfidf_ml_stays_jvm_side(spark, sf_dir):
    """b37_tfidf_ml's vector norm must be a JVM expression (vector_to_array +
    aggregate), not a row-at-a-time Python UDF (round-1 'What's wrong' #3)."""
    plan = _formatted_plan(SPECS["b37_tfidf_ml"].build(spark, sf_dir))
    assert "BatchEvalPython" not in plan


def test_semi_anti_join_operators(spark, sf_dir):
    semi = _formatted_plan(SPECS["b07_semi_join"].build(spark, sf_dir))
    anti = _formatted_plan(SPECS["b07_anti_join"].build(spark, sf_dir))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_q5_broadcast_chain_no_fact_shuffle(spark, sf_dir):
    """At broadcastable dimension sizes, Q5 must be a single pass over
    lineitem through broadcast joins: no SortMergeJoin, no Exchange of the
    lineitem scan, and the date filter pushed into the orders scan. Guards
    the round-4 rewrite (transitive ASIA pushdown + size-aware build sides)
    against the static planner regressing to broadcasting the FACT side."""
    plan = _formatted_plan(SPECS["b05_tpch_q5"].build(spark, sf_dir))
    assert "SortMergeJoin" not in plan, "fact table must not be shuffle-joined at small SF"
    assert plan.count("BroadcastHashJoin") >= 3
    assert "GreaterThanOrEqual(o_orderdate" in plan, "date filter must reach the orders scan"


def test_clustered_skip_pushes_range_filter(spark, sf_dir):
    """b50_clustered_skip's scan of the ts-clustered copy must carry the
    pushed-down range predicate — that is what turns the clustered layout
    into file/row-group skipping via parquet min/max stats."""
    plan = _formatted_plan(SPECS["b50_clustered_skip"].build(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(ts" in plan, "ts lower bound must reach the scan"
    assert "LessThan(ts" in plan, "ts upper bound must reach the scan"


def test_zorder_skip_pushes_both_dimensions(spark, sf_dir):
    """b52_zorder_skip: the conjunction over user_id AND ts must reach the
    clustered-copy scan — 2-D pruning is the point of the Morton layout."""
    plan = _formatted_plan(SPECS["b52_zorder_skip"].build(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(user_id,100)" in plan
    assert "LessThanOrEqual(user_id,140)" in plan
    assert "GreaterThanOrEqual(ts" in plan


def test_tpch_completion_pack_plan_shapes(spark, sf_dir):
    """The round-5 TPC-H completion pack (b55_*) must keep lineitem as the
    probe stream: no cartesian/nested-loop anywhere, and the fact table never
    appears as a broadcast build side (scan order in a BroadcastExchange
    subtree). Correlated subqueries must be planned as aggregates joined
    back, never per-row."""
    for q in ("q2", "q7", "q8", "q9", "q11", "q13", "q15", "q16", "q17", "q20", "q21"):
        plan = _formatted_plan(SPECS[f"b55_tpch_{q}"].build(spark, sf_dir))
        assert "CartesianProduct" not in plan, q
        # the 1-row scalar-threshold attaches (q11/q15/q20) broadcast a
        # single-row relation; anything else nested-loop is a plan bug
        if f"b55_tpch_{q}" not in ("b55_tpch_q11", "b55_tpch_q15", "b55_tpch_q20"):
            assert "BroadcastNestedLoopJoin" not in plan, q


def test_q21_exists_shapes(spark, sf_dir):
    """Q21's correlated EXISTS / NOT-EXISTS must plan as left-semi and
    left-anti hash joins on the order key."""
    plan = _formatted_plan(SPECS["b55_tpch_q21"].build(spark, sf_dir))
    low = plan.lower()
    assert "leftsemi" in low or "left semi" in low, "EXISTS must be a semi join"
    assert "leftanti" in low or "left anti" in low, "NOT EXISTS must be an anti join"


def test_q2_correlated_max_is_window_not_self_join(spark, sf_dir):
    """Q2's per-part max must be a single Window pass over the candidate
    relation (one scan), not a re-aggregated self-join that scans twice."""
    plan = _formatted_plan(SPECS["b55_tpch_q2"].build(spark, sf_dir))
    assert "Window" in plan


def _scan_count(plan: str) -> int:
    """Number of distinct parquet scans in a formatted plan.  The formatted
    mode prints every scan twice (tree line + numbered detail block), so
    count the per-scan `Location:` detail lines instead of the node name."""
    return plan.count("Location: InMemoryFileIndex")


def test_new_pack_plan_shapes(spark, sf_dir):
    """Round-5 pack (PLANS.md 'Round-5 new-pack plan audits'): the tuned
    shapes must not regress — single-scan sweep line, triangle enumeration
    on the checkpointed edge list via broadcast joins, no cartesians."""
    sweep = _formatted_plan(SPECS["b57_sweep_concurrency"].build(spark, sf_dir))
    assert _scan_count(sweep) == 1, "sweep line must scan events once"
    assert "Generate" in sweep and "explode(array" in sweep, (
        "endpoints must explode from one pass"
    )

    tri = _formatted_plan(SPECS["b61_triangle_count"].build(spark, sf_dir))
    assert "CartesianProduct" not in tri
    assert _scan_count(tri) == 0, (
        "edge list must be checkpointed — a parquet scan means the fact "
        "pipeline re-executes per consumer branch"
    )
    assert tri.count("BroadcastHashJoin") >= 2, "bounded self-joins must broadcast"

    gap = _formatted_plan(SPECS["b57_gap_fill"].build(spark, sf_dir))
    assert _scan_count(gap) == 0, "hourly rollup must be checkpointed"
    assert "CartesianProduct" not in gap

    unp = _formatted_plan(SPECS["b63_unpivot"].build(spark, sf_dir))
    assert "Expand" in unp, "unpivot must plan Expand, not a UNION re-scan"
    assert _scan_count(unp) == 1


def test_retrieval_pack_plan_shapes(spark, sf_dir):
    """b64 pack: BM25's four consumer branches must all hang off the ONE
    checkpointed (doc, term, tf) postings relation (zero parquet re-scans
    above it); the profiler is one scan + Expand (never a per-column pass);
    negative sampling's grid is dimension-cross-dimension off the one
    materialized positives set."""
    bm25 = _formatted_plan(SPECS["b64_bm25_topk"].build(spark, sf_dir))
    assert _scan_count(bm25) == 0, "corpus must tokenize/aggregate once"
    assert "CartesianProduct" not in bm25

    prof = _formatted_plan(SPECS["b64_profile_table"].build(spark, sf_dir))
    assert _scan_count(prof) == 1, "profiler must be a single scan"
    assert "Expand" in prof, "multi-column ndv plans one Expand, not N passes"

    neg = _formatted_plan(SPECS["b64_negative_sampling"].build(spark, sf_dir))
    assert _scan_count(neg) == 0, "positives must materialize once"
    assert "CartesianProduct" not in neg


def test_curation_pack_plan_shapes(spark, sf_dir):
    """b65 pack: mixture reweighting materializes the per-source aggregate
    once (zero re-scans above it); deciles window on the language KEY (a
    global-order ntile would execute single-partition at scale); the
    covariance matrix is one aggregate over one scan — moment partials,
    never a vector shuffle."""
    mix = _formatted_plan(SPECS["b65_domain_mixture"].build(spark, sf_dir))
    assert _scan_count(mix) == 0, "per-source aggregate must materialize once"

    dec = _formatted_plan(SPECS["b65_quality_deciles"].build(spark, sf_dir))
    assert _scan_count(dec) == 1
    assert "ntile(10) windowspecdefinition(lang" in dec, (
        "decile window must partition on the language key"
    )

    cov = _formatted_plan(SPECS["b65_embedding_covariance"].build(spark, sf_dir))
    assert _scan_count(cov) == 1, "covariance must be one pass of moment partials"
    assert "BatchEvalPython" not in cov


def test_session4_pack_plan_shapes(spark, sf_dir):
    """Plan shapes for the session-4 operators: phrase search and line
    dedup must never plan a cartesian/nested-loop; the weighted sample's
    global top-k must be a TakeOrdered, not a full sort; BFS rounds join
    broadcast; incremental-agg merge contains no join at all (pure
    union + re-aggregate)."""
    for name in ("b64_phrase_search", "b69_line_dedup"):
        plan = _formatted_plan(SPECS[name].build(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    sample_plan = _formatted_plan(
        SPECS["b67_weighted_sample_topk"].build(spark, sf_dir)
    )
    assert "TakeOrderedAndProject" in sample_plan
    inc_plan = _formatted_plan(SPECS["b44_incremental_agg"].build(spark, sf_dir))
    assert "Join" not in inc_plan, "partial-agg merge must be union+agg, not a join"
    assert "Union" in inc_plan
    mau_plan = _formatted_plan(SPECS["b45_rolling_mau"].build(spark, sf_dir))
    assert "CartesianProduct" not in mau_plan
    assert "Generate" in mau_plan, "rolling MAU must use the explode rewrite"
    bfs_plan = _formatted_plan(SPECS["b61_bfs_hops"].build(spark, sf_dir))
    assert "CartesianProduct" not in bfs_plan


def test_line_dedup_anti_join_regimes(spark, sf_dir, monkeypatch):
    """b69_line_dedup's boilerplate anti-join is size-gated (r5 verdict): a
    small high-DF set broadcasts; past the gate (100 TB corpus, where the
    repeated-line set can exceed the driver's broadcast limit) the SAME
    semantics run as a keyed shuffle-hash anti-join."""
    import ps_datalake_spark.queries._util as U

    plan = _formatted_plan(SPECS["b69_line_dedup"].build(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, (
        "small regime must broadcast the boiler set"
    )

    real = U.table_bytes
    monkeypatch.setattr(
        U,
        "table_bytes",
        lambda d, t: (1 << 30) if t == "documents" else real(d, t),
    )
    big_plan = _formatted_plan(SPECS["b69_line_dedup"].build(spark, sf_dir))
    assert "ShuffledHashJoin" in big_plan and "LeftAnti" in big_plan, (
        "large regime must anti-join via keyed shuffle-hash"
    )


def test_topk_large_regime(spark, sf_dir, monkeypatch):
    """b18_topk past the broadcast gate (r5 verdict #6): the large regime
    must return EXACTLY the broadcast-join path's rows, plan the keyed
    shuffle-hash join, and pre-partition orders by the group key before the
    aggregate (the scattered-key partial agg reduces only ~1.3x at the
    1000x probe; co-locating first measured 11.2 s -> 7.7 s there)."""
    import ps_datalake_spark.queries._util as U

    base = [tuple(r) for r in SPECS["b18_topk"].build(spark, sf_dir).collect()]
    real = U.table_bytes
    monkeypatch.setattr(
        U,
        "table_bytes",
        lambda d, t: (1 << 30) if t == "customer" else real(d, t),
    )
    big = SPECS["b18_topk"].build(spark, sf_dir)
    assert [tuple(r) for r in big.collect()] == base
    plan = _formatted_plan(big)
    assert "ShuffledHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "hashpartitioning(o_custkey" in plan, (
        "orders must be key-partitioned below the aggregate"
    )


def test_r6_pack_plan_shapes(spark, sf_dir):
    """Round-6 pack scale shapes: the DSIR ratio table (bounded at 65536
    rows) must broadcast onto the postings; the k-means distance pass is an
    intentional k-row broadcast nested loop (bounded by k, never a
    cartesian over the corpus)."""
    plan = _formatted_plan(SPECS["b70_dsir_importance"].build(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, "ratio table must broadcast"

    kplan = _formatted_plan(SPECS["b71_kmeans_step"].build(spark, sf_dir))
    assert "CartesianProduct" not in kplan
    assert "BroadcastNestedLoopJoin" in kplan, (
        "centroid distance pass must be the k-row broadcast nested loop"
    )


def test_semantic_pack_plans(spark, sf_dir):
    """Round-6 semantic-curation pack plan properties: no unbounded
    cartesians anywhere (the only nested-loop joins are against BOUNDED
    broadcast relations: k centroids / 1-row corpus total), the OOV
    vocabulary and z-score stats attach via BroadcastHashJoin (the
    corpus-proportional side never shuffles for them), and no row-at-a-time
    Python anywhere (semdedup's pairwise stage is an Arrow-batched grouped
    map — asserted separately below; everything else is pure JVM)."""
    for name in (
        "b72_semdedup",
        "b72_domain_kl",
        "b72_oov_rate",
        "b73_substring_dedup",
        "b73_zscore_normalize",
    ):
        plan = _formatted_plan(SPECS[name].build(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
    for name in ("b72_oov_rate", "b73_zscore_normalize"):
        plan = _formatted_plan(SPECS[name].build(spark, sf_dir))
        assert "BroadcastHashJoin" in plan, name
    # the SemDeDup within-cluster pairwise stage is ONE grouped-map GEMM per
    # cluster (the b36 block-GEMM shape) — a cluster-keyed shuffle into
    # FlatMapGroupsInPandas, never a pair self-join (the zip_with pair join
    # evaluated ~25M interpreted lambdas at 10x sf0.1) and never a nested
    # loop over the corpus (the only NL joins are the k-row centroid passes)
    plan = _formatted_plan(SPECS["b72_semdedup"].build(spark, sf_dir))
    assert "FlatMapGroupsInPandas" in plan
    for frag in plan.split("BroadcastNestedLoopJoin")[1:]:
        # every nested-loop site joins the bounded centroid build side
        assert "BuildRight" in frag.split("\n", 2)[0] or "cid" in frag[:400], frag[:200]


def test_ngram_dedup_dupset_join_never_broadcasts(spark, sf_dir):
    """b73_substring_dedup / b70_memorization_rate: the dup-gram relation is
    corpus-proportional and was auto-broadcast on a size misestimate (driver
    OOM at 10x sf0.1) — the shuffle_hash hint must hold so the gram-keyed
    join NEVER broadcasts, at any size estimate."""
    for name in ("b73_substring_dedup", "b70_memorization_rate"):
        plan = _formatted_plan(SPECS[name].build(spark, sf_dir))
        assert "ShuffledHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_eval_pack_plan_shapes(spark, sf_dir):
    """Round-7 eval pack scale shapes.  b77_roc_auc's two rank windows use
    the min+max rank identity precisely so both partition by `source` —
    ONE hash exchange must feed the windows AND the downstream
    groupBy(source) (re-sorts are fine, re-shuffles are not).  The ECE and
    quota queries reduce the corpus in one map-side-combined aggregation;
    quota's corpus total attaches as a broadcast."""
    auc = _formatted_plan(SPECS["b77_roc_auc"].build(spark, sf_dir))
    assert "CartesianProduct" not in auc
    assert "BatchEvalPython" not in auc
    assert auc.count("hashpartitioning(source") == 1, (
        "rank windows + groupBy must share one source-partitioned exchange"
    )
    for name in ("b77_calibration_ece", "b77_quota_allocation"):
        plan = _formatted_plan(SPECS[name].build(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
    quota = _formatted_plan(SPECS["b77_quota_allocation"].build(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in quota, (
        "1-row corpus total must attach as a broadcast"
    )


def test_bitmap_distinct_avoids_expand(spark, sf_dir):
    """b60_bitmap_distinct's whole point: exact NDV through constant-size
    bitmap partials instead of count_distinct's Expand plan — the bitmap
    aggregates must partial-combine map-side (HashAggregate) with no Expand
    node anywhere, and the rollup path re-merges without re-scanning more
    than the two branches' scans."""
    plan = _formatted_plan(SPECS["b60_bitmap_distinct"].build(spark, sf_dir))
    assert "Expand" not in plan, "bitmap NDV must not plan count_distinct's Expand"
    assert "HashAggregate" in plan


def test_sketch_pack_plan_shapes(spark, sf_dir):
    """Sketch-pack scale shapes: the 4096-cell CMS grid and the <=8192-row
    Bloom bit relation are BOUNDED build sides that must broadcast onto the
    probe stream (never shuffle it), everything stays JVM-side, and no
    unbounded nested loop exists anywhere."""
    for name in ("b75_countmin_heavy", "b75_bloom_filter"):
        plan = _formatted_plan(SPECS[name].build(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "BroadcastHashJoin" in plan, f"{name}: bounded sketch side must broadcast"


def test_ks_test_cumsum_is_two_level(spark, sf_dir):
    """b76_ks_test's whole point vs the naive SQL: the cumulative counts
    must come from the PER-BUCKET window (partitioned, parallel), with the
    bounded offset/total relations attached by broadcast — never a single
    global-ordering window over the full value distribution."""
    plan = _formatted_plan(SPECS["b76_ks_test"].build(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the data-proportional window must be bucket-partitioned: its required
    # child distribution hashpartitions on bkt (a global window would show
    # an Exchange SinglePartition feeding it)
    assert "hashpartitioning(bkt" in plan, "cumsum window must partition by bucket"
    assert "BroadcastHashJoin" in plan, "bucket offsets must broadcast"


def test_winsorize_boundary_relation_broadcasts(spark, sf_dir):
    """b76_winsorized_stats: the per-group clip bounds (two rows per group)
    and counts are bounded relations — the events stream must receive them
    via BroadcastHashJoin, and the rank pass must be the only data-
    proportional window."""
    plan = _formatted_plan(SPECS["b76_winsorized_stats"].build(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_sql_udf_inlines_jvm_side(spark, sf_dir):
    """b40_sql_udf's SQL-defined scalar/table functions must be INLINED by
    Catalyst — no Python evaluation node anywhere (the whole point vs a
    Python UDF)."""
    plan = _formatted_plan(SPECS["b40_sql_udf"].build(spark, sf_dir))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan


def test_heavy_hitters_merge_single_corpus_exchange(spark, sf_dir):
    """b84: ONE corpus-proportional exchange — the (shard, term) count.
    The shard-total and candidate relations must broadcast onto the
    vocabulary relation (never shuffle it again), nothing drops to Python,
    and after execution AQE must REUSE the corpus exchange across the
    derived aggregation passes instead of re-scanning documents."""
    df = SPECS["b84_heavy_hitters_merge"].build(spark, sf_dir)
    static = _formatted_plan(df)
    assert "CartesianProduct" not in static
    assert "BatchEvalPython" not in static
    assert "BroadcastHashJoin" in static
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final, (
        "derived passes must reuse the (shard, term) exchange"
    )


def test_kmv_merge_probes_are_take_ordered(spark, sf_dir):
    """b85: both k-minima probes (merged summaries AND the full-stream
    witness) must plan TakeOrderedAndProject — per-partition top-k with a
    bounded driver merge — never a global Sort feeding a Limit, and the
    scalar assembly must stay broadcast-side."""
    plan = _formatted_plan(SPECS["b85_kmv_distinct_merge"].build(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("TakeOrderedAndProject") >= 2, (
        "k-minima probes must be TakeOrdered"
    )


def test_kmv_merge_single_corpus_exchange(spark, sf_dir):
    """b85 r10 retune: the day/count branches derive from one groupBy(key)
    corpus exchange and downstream exchanges are reused (the r9 draft paid
    five corpus-sized distinct exchanges for the same relations; the
    witness branch's pruned distinct-key subtree is a measured, documented
    exception — PLANS.md round-10)."""
    df = SPECS["b85_kmv_distinct_merge"].build(spark, sf_dir)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final, (
        "derived branches must reuse shared exchanges"
    )


def test_kmv_incremental_refresh_plan(spark, sf_dir):
    """b86: the base/delta/full/count branches must all consume ONE
    groupBy(key) corpus exchange (the vacuous-conjunct pruning barriers
    keep their subtrees identical — without them column pruning builds
    four divergent corpus exchanges, measured 13% slower at 10x), every
    summary probe must be TakeOrdered, and nothing may fall to a
    cartesian or a Python eval."""
    df = SPECS["b86_kmv_incremental_refresh"].build(spark, sf_dir)
    plan = _formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("TakeOrderedAndProject") >= 3, (
        "base/delta/full k-minima probes must be TakeOrdered"
    )
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert final.count("ReusedExchange") >= 3, (
        "all four branches must reuse the one groupBy(key) exchange"
    )


def test_kmv_set_ops_plan(spark, sf_dir):
    """b87: same scaffold discipline as b86 — one groupBy(key) corpus
    exchange reused by all five branches (pruning barriers), TakeOrdered
    summary probes, no cartesian, no Python eval, all estimator algebra
    broadcast-side."""
    df = SPECS["b87_kmv_set_ops"].build(spark, sf_dir)
    plan = _formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("TakeOrderedAndProject") >= 2, (
        "A/B summary probes must be TakeOrdered"
    )
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert final.count("ReusedExchange") >= 4, (
        "the five branches must reuse the one groupBy(key) exchange"
    )


def test_priority_sample_plan(spark, sf_dir):
    """b88: the (k+1) probe must be TakeOrdered (never a corpus Sort+Limit),
    the estimator algebra broadcast-side, and no corpus shuffle may exist —
    the only exchanges allowed are the single-partition merges of the
    bounded aggregates."""
    df = SPECS["b88_priority_sample"].build(spark, sf_dir)
    plan = _formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan, (
        "the k+1 probe must be TakeOrdered"
    )
    assert "Exchange hashpartitioning" not in plan, (
        "b88 must not shuffle the corpus — no hash exchange belongs here"
    )


def test_stream_kmv_batch_summary_plan(spark, sf_dir):
    """b89: the per-micro-batch maintenance plan (_kmv_batch_summary, the
    exact relation foreachBatch writes) must be one map-side-combined
    distinct over the batch plus a TakeOrdered — never a global
    Sort+Limit, no cartesian, no Python eval.  This is the plan that runs
    once per arriving batch at 100 TB, so its shape is the scale claim."""
    from ps_datalake_spark.io import load_table
    from ps_datalake_spark.queries.sketch_pack import (
        _KMV_K,
        _kmv_batch_summary,
    )

    batch = load_table(spark, sf_dir, "events")
    df = _kmv_batch_summary(batch, _KMV_K)
    plan = _formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan, (
        "the k-minima probe must be TakeOrdered"
    )
    assert "rangepartitioning" not in plan.lower(), (
        "a global range sort of the batch must not exist"
    )
    assert "HashAggregate" in plan, (
        "the batch distinct must be a (map-side combined) hash aggregate"
    )


def test_stream_hh_batch_summary_plan(spark, sf_dir):
    """b91: the per-micro-batch maintenance plan (_hh_batch_summary, the
    exact relation foreachBatch writes) must be one map-side-combined
    per-term count over the batch with a broadcast 1-row total attached —
    no global sort, no cartesian of data relations, no Python eval.  This
    is the plan that runs once per arriving batch at 100 TB."""
    from ps_datalake_spark.io import load_table
    from ps_datalake_spark.queries.sketch_pack import _HH_T, _hh_batch_summary

    batch = load_table(spark, sf_dir, "documents")
    df = _hh_batch_summary(batch, _HH_T)
    plan = _formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "rangepartitioning" not in plan.lower(), (
        "a global range sort of the batch must not exist"
    )
    assert "HashAggregate" in plan, (
        "the per-term batch count must be a (map-side combined) hash aggregate"
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, (
        "the 1-row batch total must attach via broadcast"
    )


def test_incremental_neardup_batch_plan(spark, sf_dir, tmp_path):
    """b92: the per-batch emission plan (_incr_batch_pairs, the exact
    relation foreachBatch writes) must equi-join the arriving batch's
    banded signatures against the persisted index — no cartesian product,
    and NO scan of any prior shard's documents (the index and the batch
    are its only inputs).  This is the 100 TB claim: dedup an arriving
    shard against the accumulated corpus without re-reading it."""
    from pyspark.sql import functions as F

    from ps_datalake_spark.queries.llm_ops import _incr_batch_pairs

    sigs = spark.createDataFrame(
        [(1, list(range(64))), (2, list(range(64)))], "doc long, sig array<long>"
    )
    idx_path = str(tmp_path / "idx.parquet")
    spark.createDataFrame(
        [(0, 0, 12345)], "doc long, band_idx int, band_hash long"
    ).write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)
    _, pairs = _incr_batch_pairs(sigs, idx)
    plan = _formatted_plan(pairs)
    assert "CartesianProduct" not in plan
    assert "documents" not in plan, (
        "the per-batch plan must never rescan prior shards' documents"
    )
    assert "BroadcastNestedLoopJoin" not in plan, (
        "the band probe must be an equi-join on (band_idx, band_hash)"
    )
