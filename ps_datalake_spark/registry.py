"""Query registry: the single source of truth for the declared operator
inventory (SURVEY.md §2).

Each operator is registered once with a Spark DataFrame builder and (when
SQL-expressible) the equivalent DuckDB oracle SQL. ``__spark_entry__.py``
exposes this registry to the driver; the local test harness
(tests/test_oracle.py) replays the same comparison the driver performs.

Conventions (FIXTURES.md "determinism"):
  * every query ends in a total ORDER BY over its output columns;
  * aggregate/computed columns are aliased identically on both sides;
  * ambiguous result types are cast explicitly (BIGINT/DOUBLE) on both sides;
  * doubles that sum many terms are rounded (2dp) on both sides so the
    driver's 6dp canonical rounding can never straddle an ulp.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # None → driver does a rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    """Decorator registering a query builder under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, build=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


# Queries already fully driver-verified (green hash_match row) in round 1's
# CORRECTNESS_r01.json.  The round-1 driver only consumed the first 50
# registry entries, so ``all_queries()`` rotates these to the BACK: the 48
# never-checked queries plus the two round-1 red rows (b10_collect_agg,
# b25_array_setops) — exactly 50 — come first and land inside the driver's
# verification window this round.
_DRIVER_GREEN_R01 = frozenset(
    {
        "b01_scan_parquet", "b01_scan_csv_roundtrip", "b01_scan_json_roundtrip",
        "b02_sink_parquet_partitioned", "b03_projection", "b04_filter_battery",
        "b05_join_inner_4way", "b05_join_left", "b05_join_full",
        "b06_broadcast_join", "b07_semi_join", "b07_anti_join",
        "b08_range_join", "b09_cross_join", "b10_tpch_q1", "b10_agg_minmax",
        "b10_stats_agg", "b11_distinct", "b11_count_distinct",
        "b12_approx_count_distinct", "b13_rollup", "b13_cube",
        "b14_rank_windows", "b15_lag_lead", "b16_window_frames",
        "b17_sort_nulls", "b18_topk", "b18_topk_per_group", "b19_union",
        "b20_setops", "b21_strings", "b22_dates", "b23_math",
        "b24_conditional", "b13_pivot", "b12_approx_percentile",
        "b22_dates_ext", "b24_try_funcs", "b21_strings_ext", "b23_bitwise",
        "b04_tpch_q6", "b10_tpch_q3", "b05_tpch_q5", "b14_rank_ext",
        "b23_trig", "b25_explode_outer", "b43_stratified_sample",
        "b43_train_val_test_split",
    }
)


# Queries first registered in round 2 (kept for provenance only — like
# _CONVERTED_IN_R03 below, no code path consults this set anymore; the
# historical round-2 ordering rule it implemented is superseded by the
# evidence-age ranks in all_queries()).
_NEW_IN_R02 = frozenset(
    {
        "b36_cosine_neardup_lsh",
        "b08_range_join_pairs",
        "b32_late_data",
        "b39_resize_edges",
        "b47_contamination",
        "b47_pii_scrub",
        "b47_repetition",
        "b01_orc_roundtrip",
        "b48_bucketed_join",
        "b48_salted_skew_join",
        "b32_stream_stream_join",
        "b49_merge_upsert",
        "b33_custom_stateful",
        "b38_compact_vacuum",
        "b40_sql_grouping_sets",
        "b10_tpch_q10",
        "b10_tpch_q18",
        "b38_stream_ingest",
    }
)


# Queries with a green (rows+schema+hash) driver row in round 2's
# CORRECTNESS_r02.json.  Rotated behind the r1-greens for round 3: the r1
# evidence is now two rounds old, the r2 evidence one round old.
_DRIVER_GREEN_R02 = frozenset(
    {
        "b10_collect_agg", "b25_array_setops", "b44_rollup_cascade",
        "b45_histogram", "b45_funnel", "b45_cohort_retention", "b40_sql_cte",
        "b40_sql_correlated", "b25_array_explode", "b25_array_funcs",
        "b25_array_construct", "b25_zip_with", "b26_maps", "b27_json",
        "b26_maps_ext", "b28_pandas_udf", "b29_apply_in_pandas",
        "b30_tumbling_window", "b30_tumbling_stream", "b31_sliding_window",
        "b31_session_window", "b46_asof_join", "b32_dedup", "b32_dedup_stream",
        "b33_stateful_agg_stream", "b34_exact_dedup", "b35_jaccard_pairs",
        "b36_cosine_topk", "b36_cosine_neardup", "b37_token_stats",
        "b37_lang_id", "b37_fingerprint", "b37_tfidf_top", "b35_dedup_clusters",
        "b41_doc_chunking", "b42_llm_pipeline", "b39_multimodal_decode",
        "b39_feature_pipeline", "b38_put_dedup", "b38_content_addressing",
        "b38_federation", "b38_roundtrip",
    }
)

# Round-2 driver rows that were declared rows-only (`err: no_oracle`) and are
# NOT being converted to oracle-checked this round: they already have their
# rows-only evidence, so they rotate to the back rather than consuming one of
# the 50 verification slots.
_CHECKED_R02_ROWS_ONLY = frozenset(
    {
        "b35_minhash_lsh",
        "b35_simhash",
        "b35_minhash_ml",
        "b37_tfidf_ml",
        "b39_frame_sample",
    }
)

# Round-3 priority: queries converted from rows-only to oracle-checked that
# round (kept for provenance; superseded by the r3 driver rows below).
_CONVERTED_IN_R03 = frozenset(
    {
        "b36_ann_lsh",
        "b36_ivf_topk",
        "b33_update_mode_stream",
    }
)

# The 50 queries with a green (rows+schema+hash) driver row in round 3's
# CORRECTNESS_r03.json — the NEWEST evidence, rotated to the back for round 4.
_DRIVER_GREEN_R03 = frozenset(
    {
        "b01_orc_roundtrip", "b01_scan_csv_roundtrip", "b01_scan_json_roundtrip",
        "b01_scan_parquet", "b02_sink_parquet_partitioned", "b03_projection",
        "b04_filter_battery", "b05_join_full", "b05_join_inner_4way",
        "b05_join_left", "b06_broadcast_join", "b07_anti_join", "b07_semi_join",
        "b08_range_join", "b08_range_join_pairs", "b09_cross_join",
        "b10_agg_minmax", "b10_stats_agg", "b10_tpch_q1", "b10_tpch_q10",
        "b10_tpch_q18", "b11_count_distinct", "b11_distinct",
        "b12_approx_count_distinct", "b13_cube", "b13_rollup",
        "b14_rank_windows", "b15_lag_lead", "b16_window_frames",
        "b17_sort_nulls", "b18_topk", "b32_late_data",
        "b32_stream_stream_join", "b33_custom_stateful",
        "b33_update_mode_stream", "b36_ann_lsh", "b36_cosine_neardup_lsh",
        "b36_ivf_topk", "b38_compact_vacuum", "b38_stream_ingest",
        "b38_waterfall", "b39_decode_real", "b39_resize_edges",
        "b40_sql_grouping_sets", "b47_contamination", "b47_pii_scrub",
        "b47_repetition", "b48_bucketed_join", "b48_salted_skew_join",
        "b49_merge_upsert",
    }
)

# Round-4 priority: queries that were rows-only (`err: no_oracle`) through
# round 3 and gain a deterministic oracle this round (planted exact
# duplicates / pure-Python XXH64 prediction) — they need a fresh driver row
# to prove the new oracle hash-matches.
_CONVERTED_IN_R04 = frozenset(
    {
        "b35_minhash_lsh",
        "b35_simhash",
        "b35_minhash_ml",
        "b39_frame_sample",
    }
)

# The 50 queries with a green (rows+schema+hash) driver row in round 4's
# CORRECTNESS_r04.json — the NEWEST evidence, rotated to the back for round 5.
_DRIVER_GREEN_R04 = frozenset(
    {
        "b04_tpch_q6", "b05_tpch_q5", "b10_collect_agg", "b10_tpch_q3",
        "b12_approx_percentile", "b13_pivot", "b14_rank_ext",
        "b18_topk_per_group", "b19_union", "b20_setops", "b21_strings",
        "b21_strings_ext", "b22_dates", "b22_dates_ext", "b23_bitwise",
        "b23_math", "b23_trig", "b24_conditional", "b24_try_funcs",
        "b25_array_construct", "b25_array_explode", "b25_array_funcs",
        "b25_array_setops", "b25_explode_outer", "b25_zip_with", "b26_maps",
        "b27_json", "b35_minhash_lsh", "b35_minhash_ml", "b35_simhash",
        "b37_token_count_bpe", "b39_decode_png", "b39_frame_sample",
        "b40_sql_correlated", "b40_sql_cte", "b43_stratified_sample",
        "b43_train_val_test_split", "b44_rollup_cascade",
        "b45_cohort_retention", "b45_funnel", "b45_histogram",
        "b50_clustered_skip", "b51_embedding_quant", "b52_zorder_skip",
        "b53_tpch_q12", "b53_tpch_q14", "b53_tpch_q19", "b53_tpch_q22",
        "b53_tpch_q4", "b54_fuzzy_name_match",
    }
)

# Round-5 priority: b37_tfidf_ml — the last rows-only query — gains a
# value-level oracle this round (planted fixed corpus with a hardcoded
# vocabulary verified collision-free under HashingTF, so the ML pipeline's
# norms equal the textbook TF-IDF formula DuckDB can compute).
_CONVERTED_IN_R05 = frozenset({"b37_tfidf_ml"})

# Round-5 retunes: data-proportional queries whose decorative final ORDER BY
# was dropped on BOTH sides (rows are compared as sorted multisets, and a
# range sort's boundary-sampling pass re-executes the whole upstream plan).
# The query/oracle pair changed, so each needed a fresh driver row (granted
# green in round 5).
_RETUNED_IN_R05 = frozenset(
    {
        "b16_window_frames",
        "b31_session_window",
        "b34_exact_dedup",
        "b37_token_stats",
    }
)

# The 49 queries with a green (rows+schema+hash) driver row in round 5's
# CORRECTNESS_r05.json — the NEWEST evidence, rotated to the back for round
# 6.  The round's one red row (b67_weighted_sample_topk, a cross-libm ln()
# ulp magnified across a round() half-boundary) is NOT here: its key
# discipline was rewritten (ln quantised to an exact shared BIGINT grid
# before the magnifying division) and it re-enters the window via
# _RETUNED_IN_R06.
_DRIVER_GREEN_R05 = frozenset(
    {
        "b10_argmax_quantiles", "b10_regression_agg", "b16_window_frames",
        "b28_udtf_chunks", "b31_session_window", "b34_exact_dedup",
        "b37_tfidf_ml", "b37_token_stats", "b39_audio_features",
        "b39_decode_jpeg", "b44_incremental_agg", "b45_batch_sessionize",
        "b45_chi_square", "b45_event_transitions", "b45_isotonic",
        "b45_market_basket", "b45_naive_bayes", "b45_rolling_mau",
        "b48_skew_report", "b55_tpch_q11", "b55_tpch_q13", "b55_tpch_q15",
        "b55_tpch_q16", "b55_tpch_q17", "b55_tpch_q2", "b55_tpch_q20",
        "b55_tpch_q21", "b55_tpch_q7", "b55_tpch_q8", "b55_tpch_q9",
        "b56_bigram_stats", "b56_epoch_shuffle", "b56_sequence_packing",
        "b56_temperature_sampling", "b56_unigram_logprob", "b57_ewma",
        "b57_exact_percentiles", "b57_gap_fill", "b57_resample_ohlc",
        "b57_sweep_concurrency", "b58_cdc_latest_state", "b58_scd2_dimension",
        "b59_gopher_quality", "b60_hll_merge", "b61_triangle_count",
        "b62_schema_evolution", "b63_stream_static_join", "b63_unpivot",
        "b68_dedup_within_watermark",
    }
)

# Round-6 retunes: queries whose Spark/oracle pair changed this round and
# therefore need a fresh hash-verified driver row even though a historical
# row exists.
_RETUNED_IN_R06 = frozenset({"b67_weighted_sample_topk"})

# The 50 queries with a green (rows+schema+hash) driver row in round 6's
# CORRECTNESS_r06.json — the NEWEST evidence, rotated to the back for round 7.
_DRIVER_GREEN_R06 = frozenset(
    {
        "b10_mode_listagg", "b27_variant", "b27_xml", "b37_pmi_collocations",
        "b37_stemming", "b37_wordpiece", "b38_time_travel",
        "b40_sql_groupby_all", "b40_sql_lateral", "b40_sql_params",
        "b40_sql_pipe", "b40_sql_recursive", "b40_sql_udf",
        "b58_integrity_audit", "b58_snapshot_diff", "b60_bitmap_distinct",
        "b61_bfs_hops", "b64_bm25_topk", "b64_negative_sampling",
        "b64_phrase_search", "b64_posexplode", "b64_profile_table",
        "b65_dedup_keep_best", "b65_domain_mixture",
        "b65_embedding_covariance", "b65_quality_deciles", "b66_pagerank",
        "b67_fixed_k_per_group", "b67_mad_outliers", "b67_weighted_sample_topk",
        "b68_bpe_apply", "b68_bpe_train", "b68_char_entropy", "b69_line_dedup",
        "b69_text_normalize", "b70_dsir_importance", "b70_memorization_rate",
        "b70_token_budget_fill", "b71_kmeans_step", "b72_domain_kl",
        "b72_oov_rate", "b72_semdedup", "b73_substring_dedup",
        "b73_zscore_normalize", "b74_video_frames", "b75_bloom_filter",
        "b75_countmin_heavy", "b76_gini_concentration", "b76_ks_test",
        "b76_winsorized_stats",
    }
)

# Round-7 retunes: queries whose Spark/oracle pair changed this round and
# therefore need a fresh hash-verified driver row even though a historical
# row exists.  Both b76 entries moved their overflow-prone BIGINT
# intermediates to DECIMAL(38,0) (advisor round-6 items — Spark wrapped in
# non-ANSI mode past ~3M samples while DuckDB promoted to INT128); values at
# fixture scale are unchanged but the changed pair earns a fresh row.
_RETUNED_IN_R07 = frozenset(
    {
        "b76_gini_concentration",
        "b76_ks_test",
        # gram/shingle keys collapse to xxhash64 before the checkpoint (the
        # 10x-probe width fix) — Spark-side plan changed, oracle unchanged.
        "b73_substring_dedup",
        "b70_memorization_rate",
    }
)

# The 50 queries with a green (rows+schema+hash) driver row in round 7's
# CORRECTNESS_r07.json — the NEWEST evidence, rotated to the back for round 8
# (50/50 green: the 15 new/retuned r7 queries plus the 35 stalest r2 rows).
_DRIVER_GREEN_R07 = frozenset(
    {
        "b01_orc_roundtrip", "b01_scan_csv_roundtrip",
        "b01_scan_json_roundtrip", "b01_scan_parquet",
        "b02_sink_parquet_partitioned", "b03_projection", "b04_filter_battery",
        "b05_join_inner_4way", "b26_maps_ext", "b28_pandas_udf",
        "b29_apply_in_pandas", "b30_tumbling_stream", "b30_tumbling_window",
        "b31_sliding_window", "b32_dedup", "b32_dedup_stream",
        "b33_stateful_agg_stream", "b35_dedup_clusters", "b35_jaccard_pairs",
        "b36_cosine_neardup", "b36_cosine_topk", "b37_fingerprint",
        "b37_lang_id", "b37_tfidf_top", "b38_content_addressing",
        "b38_federation", "b38_put_dedup", "b38_roundtrip",
        "b39_feature_pipeline", "b39_multimodal_decode", "b40_sql_collation",
        "b40_sql_variables", "b41_doc_chunking", "b42_llm_pipeline",
        "b46_asof_join", "b48_bucketed_join", "b48_salted_skew_join",
        "b70_memorization_rate", "b73_substring_dedup",
        "b76_gini_concentration", "b76_ks_test", "b77_calibration_ece",
        "b77_quota_allocation", "b77_roc_auc", "b78_pslake_source",
        "b78_pslake_stream", "b79_observe_metrics", "b80_jsonl_gz_ingest",
        "b81_image_ahash_dedup", "b82_udtf_polymorphic",
    }
)

# Round-8 retunes: queries whose Spark/oracle pair changed this round and
# therefore need a fresh hash-verified driver row even though a historical
# row exists.
_RETUNED_IN_R08 = frozenset(
    {
        # b82's Spark-side tokenizer moved from str.split() (all Unicode
        # whitespace) to an explicit ASCII-whitespace regex so both sides of
        # the oracle pin the same character class (advisor r7 item).
        "b82_udtf_polymorphic",
        # b75's probe side went shuffle-free (k broadcast joins of one reused
        # bits subtree instead of explode+regroup; 3.9 s -> 1.24 s at 10x) —
        # Spark-side plan changed, oracle unchanged.
        "b75_bloom_filter",
        # b76's per-type count folded into the rank window's exchange (two
        # WindowExecs, one shuffle; drops a third scan of events + a
        # broadcast join; 0.93 s -> 0.75 s at 10x) — plan changed, oracle
        # unchanged.
        "b76_winsorized_stats",
        # q5's composite join key (l_orderkey, s_nationkey) packed into one
        # bigint (key*32 + nationkey, injective for nationkey < 32): the
        # join runs on the single-long hashed relation (8.5 s -> 7.2 s at
        # 1000x) — plan changed, oracle unchanged.
        "b05_tpch_q5",
    }
)


# The 50 queries with a green (rows+schema+hash) driver row in round 8's
# CORRECTNESS_r08.json — the NEWEST evidence, rotated to the back for round
# 9 (50/50 green: the 4 new + 4 retuned r8 queries plus the stalest
# r3/r4-evidence rows).  Generated from the artifact's keys verbatim.
_DRIVER_GREEN_R08 = frozenset(
    {
        "b05_join_full", "b05_join_left", "b05_tpch_q5",
        "b06_broadcast_join", "b07_anti_join", "b07_semi_join",
        "b08_range_join", "b08_range_join_pairs", "b09_cross_join",
        "b10_agg_minmax", "b10_stats_agg", "b10_tpch_q1", "b10_tpch_q10",
        "b10_tpch_q18", "b11_count_distinct", "b11_distinct",
        "b12_approx_count_distinct", "b13_cube", "b13_rollup",
        "b14_rank_windows", "b15_lag_lead", "b17_sort_nulls", "b18_topk",
        "b18_topk_per_group", "b32_late_data", "b32_stream_stream_join",
        "b33_custom_stateful", "b33_update_mode_stream", "b36_ann_lsh",
        "b36_cosine_neardup_lsh", "b36_ivf_topk", "b38_compact_vacuum",
        "b38_stream_ingest", "b38_waterfall", "b39_decode_real",
        "b39_resize_edges", "b40_sql_grouping_sets", "b47_contamination",
        "b47_pii_scrub", "b47_repetition", "b49_merge_upsert",
        "b50_clustered_skip", "b52_zorder_skip", "b75_bloom_filter",
        "b76_winsorized_stats", "b78_pslake_lookup", "b78_pslake_sink",
        "b78_pslake_stream_sink", "b82_udtf_polymorphic",
        "b83_quantile_sketch_merge",
    }
)

# Round-9 retunes: queries whose Spark/oracle pair changed this round and
# therefore need a fresh hash-verified driver row even though a historical
# row exists.
_RETUNED_IN_R09 = frozenset(
    {
        # The whitespace tokenizer class dropped \v (\x0b) so the Spark-side
        # regex matches RE2's \s ([\t\n\f\r ]) exactly, and the oracle trims
        # the same ASCII whitespace set (advisor r8 item) — both sides of
        # the pair changed.
        "b82_udtf_polymorphic",
        # b75_countmin's Spark-side tokenizer moved from Java \s+ (includes
        # \v) to the explicit RE2-\s class [ \t\n\r\f]+ the oracle uses —
        # the same character-class pin as b82 (values at fixture scale
        # unchanged; the changed pair earns a fresh row).
        "b75_countmin_heavy",
        # NOTE b75_bloom_filter is NOT here: the r8-verdict-#4 single-pass
        # fold of its two build-side distinct exchanges was measured and
        # REJECTED (2.20 s folded vs 1.35 s chained at 10x — explode before
        # distinct multiplies the corpus-proportional partial-agg input by
        # k+1), so its r8 plan and green row stand; the 10x floor is now a
        # recorded bench artifact row instead (bench.py SCALE_QUERIES).
    }
)


# The 50 queries with a green (rows+schema+hash) driver row in round 9's
# CORRECTNESS_r09.json — the NEWEST evidence, rotated to the back for round
# 10 (50/50 green: the 3 new + 2 retuned r9 queries plus the stalest
# r4/r5-evidence rows).  Generated from the artifact's keys verbatim.
_DRIVER_GREEN_R09 = frozenset(
    {
        "b04_tpch_q6", "b10_collect_agg", "b10_tpch_q3",
        "b12_approx_percentile", "b13_pivot", "b14_rank_ext", "b19_union",
        "b20_setops", "b21_strings", "b21_strings_ext", "b22_dates",
        "b22_dates_ext", "b23_bitwise", "b23_math", "b23_trig",
        "b24_conditional", "b24_try_funcs", "b25_array_construct",
        "b25_array_explode", "b25_array_funcs", "b25_array_setops",
        "b25_explode_outer", "b25_zip_with", "b26_maps", "b27_json",
        "b35_minhash_lsh", "b35_minhash_ml", "b35_simhash",
        "b37_token_count_bpe", "b39_frame_sample", "b40_sql_correlated",
        "b40_sql_cte", "b43_stratified_sample", "b43_train_val_test_split",
        "b44_rollup_cascade", "b45_cohort_retention", "b45_funnel",
        "b45_histogram", "b51_embedding_quant", "b53_tpch_q12",
        "b53_tpch_q14", "b53_tpch_q19", "b53_tpch_q22", "b53_tpch_q4",
        "b54_fuzzy_name_match", "b75_countmin_heavy", "b78_pslake_sql",
        "b82_udtf_polymorphic", "b84_heavy_hitters_merge",
        "b85_kmv_distinct_merge",
    }
)

# Round-10 retunes: queries whose Spark/oracle pair changed this round and
# therefore need a fresh hash-verified driver row even though a historical
# row exists.
_RETUNED_IN_R10 = frozenset(
    {
        # b85's five corpus-sized distinct exchanges folded down to the
        # groupBy(key) family (the key embeds the hour, so min(d) is
        # exact distinct(d,key) and exact_d a free count; 0.70 -> 0.60 s
        # at 10x) — Spark-side plan changed, oracle unchanged.
        "b85_kmv_distinct_merge",
    }
)


# The 50 queries with a green (rows+schema+hash) driver row in round 10's
# CORRECTNESS_r10.json (50/50 green) — newest evidence, rotated to the back
# for round 11.  Generated from the artifact's keys verbatim.
_DRIVER_GREEN_R10 = frozenset(
    {
        "b10_argmax_quantiles", "b10_regression_agg", "b16_window_frames",
        "b28_udtf_chunks", "b31_session_window", "b34_exact_dedup",
        "b37_tfidf_ml", "b37_token_stats", "b39_audio_features",
        "b39_decode_jpeg", "b39_decode_png", "b44_incremental_agg",
        "b45_batch_sessionize", "b45_chi_square", "b45_event_transitions",
        "b45_isotonic", "b45_market_basket", "b45_naive_bayes",
        "b45_rolling_mau", "b48_skew_report", "b55_tpch_q11",
        "b55_tpch_q13", "b55_tpch_q15", "b55_tpch_q16", "b55_tpch_q17",
        "b55_tpch_q2", "b55_tpch_q20", "b55_tpch_q21", "b55_tpch_q7",
        "b55_tpch_q8", "b55_tpch_q9", "b56_bigram_stats",
        "b56_epoch_shuffle", "b56_sequence_packing",
        "b56_temperature_sampling", "b56_unigram_logprob", "b57_ewma",
        "b57_exact_percentiles", "b57_gap_fill", "b57_resample_ohlc",
        "b57_sweep_concurrency", "b58_cdc_latest_state",
        "b58_scd2_dimension", "b59_gopher_quality", "b60_hll_merge",
        "b68_dedup_within_watermark", "b85_kmv_distinct_merge",
        "b86_kmv_incremental_refresh", "b87_kmv_set_ops",
        "b88_priority_sample",
    }
)

# Round-11 retunes: queries whose Spark/oracle pair changed this round and
# therefore need a fresh hash-verified driver row even though a historical
# row exists.
_RETUNED_IN_R11 = frozenset(
    {
        # r10 advisor items, both sides of each pair changed symmetrically
        # (values at fixture scale unchanged; the changed pair earns a
        # fresh row):
        # b86/b87: event_id IS NOT NULL added to Spark AND oracle so the
        # side-membership flags are provably non-null and the vacuous-
        # conjunct pruning barriers provably row-preserving.
        "b86_kmv_incremental_refresh",
        "b87_kmv_set_ops",
        # b88: weight capped at least(n_chars, 1e6) in Spark AND oracle so
        # w * 2^32 provably stays under 2^63 on both engines.
        "b88_priority_sample",
    }
)


# The 50 queries with a green (rows+schema+hash) driver row in round 11's
# CORRECTNESS_r11.json (50/50 green) — newest evidence, rotated to the back
# for round 12.  Generated from the artifact's keys verbatim.
_DRIVER_GREEN_R11 = frozenset(
    {
        "b10_mode_listagg", "b27_variant", "b27_xml", "b37_pmi_collocations",
        "b37_stemming", "b37_wordpiece", "b40_sql_groupby_all",
        "b40_sql_lateral", "b40_sql_params", "b40_sql_pipe",
        "b40_sql_recursive", "b40_sql_udf", "b58_integrity_audit",
        "b58_snapshot_diff", "b60_bitmap_distinct", "b61_bfs_hops",
        "b61_triangle_count", "b62_schema_evolution", "b63_stream_static_join",
        "b63_unpivot", "b64_bm25_topk", "b64_negative_sampling",
        "b64_phrase_search", "b64_posexplode", "b64_profile_table",
        "b65_dedup_keep_best", "b65_domain_mixture", "b65_embedding_covariance",
        "b65_quality_deciles", "b66_pagerank", "b67_fixed_k_per_group",
        "b67_mad_outliers", "b67_weighted_sample_topk", "b68_bpe_apply",
        "b68_bpe_train", "b68_char_entropy", "b69_line_dedup",
        "b69_text_normalize", "b70_dsir_importance", "b70_token_budget_fill",
        "b71_kmeans_step", "b72_domain_kl", "b72_oov_rate", "b72_semdedup",
        "b74_video_frames", "b86_kmv_incremental_refresh", "b87_kmv_set_ops",
        "b88_priority_sample", "b89_stream_kmv_maintain",
        "b90_stream_priority_maintain",
    }
)

# Round-12 retunes: queries whose Spark-side behavior changed this round and
# therefore need a fresh hash-verified driver row even though a historical
# row exists.
_RETUNED_IN_R12 = frozenset(
    {
        # r11 advisor items 1-3: b89/b90's stream staging moved to a shared
        # helper (pmod grouping + a staged-counts-sum-to-source assertion so
        # a NULL/negative-key fixture row can never silently fall out of the
        # stream while the witness and oracle keep it), and the per-run
        # summary/checkpoint scratch dirs are now cleaned up via try/finally
        # on ALL exit paths.  Oracle pairs unchanged; the changed Spark side
        # earns a fresh row (and lands b90's r12-verdict-#4 re-check).
        "b89_stream_kmv_maintain",
        "b90_stream_priority_maintain",
    }
)

# Evidence-age chain consumed by all_queries() AND the window-invariant test
# (tests/test_oracle.py) so code and test share ONE ordering (r11 advisor
# item 4: the old rank() collapsed R01/R02 into one rank while the test
# compared last-green rounds directly — a tie-rank boundary split could
# false-fail).  rank(name) == the round of its freshest green driver row.
GREEN_ROUNDS: dict[int, frozenset] = {
    1: _DRIVER_GREEN_R01,
    2: _DRIVER_GREEN_R02,
    3: _DRIVER_GREEN_R03,
    4: _DRIVER_GREEN_R04,
    5: _DRIVER_GREEN_R05,
    6: _DRIVER_GREEN_R06,
    7: _DRIVER_GREEN_R07,
    8: _DRIVER_GREEN_R08,
    9: _DRIVER_GREEN_R09,
    10: _DRIVER_GREEN_R10,
    11: _DRIVER_GREEN_R11,
}

# The current round's retune set, under a stable name so the invariant test
# doesn't hard-code a round number.
RETUNED_CURRENT = _RETUNED_IN_R12


def evidence_rank(name: str) -> int:
    """0 = must be (re-)verified this round (never green, or retuned);
    otherwise the round number of the freshest green driver row — the
    window sorts ascending, so stalest evidence re-verifies first."""
    if name in RETUNED_CURRENT:
        return 0
    return max((r for r, s in GREEN_ROUNDS.items() if name in s), default=0)


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules on first access so the registry is populated.
    from . import queries as _  # noqa: F401

    # Driver contract: only the FIRST 50 entries get a CORRECTNESS row.
    # Round-12 window = rank 0 (new b91/b92 + the b89/b90 staging retunes)
    # followed by the queries whose freshest green evidence is OLDEST (after
    # r11 refreshed the r6-evidence rows, the stalest survivors are the
    # round-7-evidence scans/UDF/streaming/lake rows), newest (r11) at the
    # back.  Every query is driver-green at least once (r6-r11 verdicts), so
    # the window purely rotates the oldest evidence forward.
    idx = {n: i for i, n in enumerate(_REGISTRY)}
    names = sorted(_REGISTRY, key=lambda n: (evidence_rank(n), idx[n]))
    return {n: _REGISTRY[n] for n in names}
