"""Query registry: every implemented operator from SURVEY.md §2 gets a
named query (facade-API Spark plan) plus, where SQL-expressible, a
DuckDB oracle SQL string. The driver runs both sides at sf0.01 and
hash-compares (see repo-root __spark_entry__.py).

Float outputs are rounded identically on both sides so the
order-insensitive value-hash is stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Queries that already have a green (or no_oracle) row in CORRECTNESS_r01.json.
# The driver validates only the first 50 registry entries per round, so
# already-validated queries rotate to the BACK of the registry, giving every
# not-yet-checked query a row in the next CORRECTNESS file.  Once all queries
# have been validated at least once, the rotation keeps cycling so regressions
# still surface within two rounds.
VALIDATED = frozenset({
    # round 1 (CORRECTNESS_r01.json)
    "q1_pricing_summary", "q3_shipping_priority", "q5_revenue_by_nation",
    "q6_forecast_revenue", "join_broadcast_part", "join_semi", "join_anti",
    "join_outer", "q4_priority_late", "q10_returned_revenue",
    "q14_type_revenue_ratio", "q15_top_suppliers", "q18_large_orders",
    "q19_or_predicates", "q7_nation_volume", "q8_market_share",
    "q9_profit_by_nation", "q12_late_priority_counts",
    "q13_customer_distribution", "q16_supplier_variety",
    "q17_small_quantity_revenue", "q21_waiting_supplier", "q22_idle_customers",
    "filter_isin_between", "case_when_buckets", "string_ops", "date_ops",
    "value_counts_flag", "distinct_pairs", "nunique_by_group", "topk_orders",
    "fillna_mask", "union_concat", "pivot_status", "minmax_by_group",
    "quantiles_exact", "stats_var_std", "corr_cov", "transform_pct_of_group",
    "expanding_running_share", "categorize_segments", "drop_dup_keep_first",
    "combine_first_balances", "string_ops2", "date_ops2",
    "approx_distinct_parts", "approx_quantiles_price", "sample_orders",
    "loc_orderkey_slice", "series_map_status",
    # round 2 (CORRECTNESS_r02.json — the 43 hash-green rows; the 7
    # no_oracle rows stay OUT so they lead the round-3 window with
    # their new containment / state-check oracles)
    "melt_measures", "rollup_revenue", "cube_priority_status",
    "except_inactive_customers", "intersect_active_parts",
    "dummies_by_nation", "window_shift_diff", "window_cumsum_user",
    "window_rolling_mean", "window_rank_latest", "resample_hourly",
    "window_user_sessions", "asof_purchase_click", "window_ffill_gaps",
    "rolling_time_window", "sliding_window_counts", "funnel_stages",
    "weekly_retention", "json_props_stats", "text_stats_by_lang",
    "text_quality_buckets", "text_token_frequencies",
    "text_fingerprint_dups", "text_lang_id", "text_chunking",
    "pipeline_clean_corpus", "dedup_exact_docs", "dedup_ngram_jaccard",
    "ann_cosine_topk", "ann_centroids", "multimodal_decode",
    "dedup_embedding_cosine", "stream_stateful_totals",
    "stats_skew_kurt", "rolling_moments_daily", "pivot_table_priority",
    "idxmax_per_priority", "daily_growth", "rolling_median_rev",
    "rank_priority_totals", "split_train_val", "stratified_sample_docs",
    "global_shuffle_head",
})


# ROUND-4 CHECKLIST (same maintenance step as round 3): once
# CORRECTNESS_r03.json lands, add its green names to VALIDATED — the
# round-3 window leads with queries/round3.py (19 queries incl.
# rolling_weighted_triang, expanding_median_global, cat_codes_explicit,
# pack_sequences_2048, dedup_connected_groups), queries/round3b.py (17
# queries flipping previously pytest-only §2 rows: mode, describe,
# groupby head/get_group/rolling/expanding, concat axis=1, query/eval,
# ufunc, dot, combine, is_monotonic, CSV/JSON round-trips, custom
# reduction, map_partitions, map_overlap), the 7 oracle-upgraded
# ex-rows-only queries (dedup_minhash_lsh, dedup_simhash,
# ann_lsh_bucketed, ann_ivf_topk, ann_int8_topk, stream_tumbling_counts,
# stream_session_counts), the 4 late-r3 additions (text_lm_perplexity,
# text_bm25_search, mix_sources_target, stream_interval_join), and ~3
# rotated r1 reconfirmations. The upgraded approx_* queries (tolerance
# oracles since r3) re-enter with the r1 rotation. NOTE: every
# registry query was ALSO swept locally vs DuckDB at sf0.01 this round
# (0 failures), so names outside the driver window are not stale.


def collect_queries() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    from . import approx, dedup, events, ops, relational, round3, round3b, round3c, sampling_q, similarity, stats, streaming_q, text, tpch, tpch2, tpch3, windows

    out: dict = {}
    for mod in (round3, round3b, round3c, tpch, tpch2, tpch3, ops, approx, relational, windows, events, text, dedup, similarity, streaming_q, stats, sampling_q):
        for name, pair in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name {name}")
            out[name] = pair
    # Rotation: not-yet-validated queries first (stable within each class).
    ordered = {n: out[n] for n in out if n not in VALIDATED}
    ordered.update({n: out[n] for n in out if n in VALIDATED})
    return ordered
