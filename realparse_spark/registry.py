"""Central query/oracle registry.

Each operator module exposes ``QUERIES`` (name -> callable(spark, sf_dir) ->
DataFrame) and ``ORACLES`` (name -> DuckDB SQL with identical column
aliases).  Names missing from ORACLES get the driver's weaker rows-only
check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = (
    "realparse_spark.operators.report",
    "realparse_spark.operators.parse_queries",
    "realparse_spark.operators.log_report",
    "realparse_spark.operators.load_query",
    "realparse_spark.operators.streaming_query",
    "realparse_spark.operators.text",
    "realparse_spark.operators.dedup",
    "realparse_spark.operators.similarity",
    "realparse_spark.operators.multimodal",
    "realparse_spark.operators.pipeline_ops",
    "realparse_spark.operators.advanced",
    "realparse_spark.operators.privacy",
    "realparse_spark.operators.analytics",
    "realparse_spark.operators.inference",
    "realparse_spark.operators.tpch_extra",
    "realparse_spark.operators.tpch_partsupp",
    "realparse_spark.operators.dq",
    "realparse_spark.operators.scale",
    "realparse_spark.operators.compact",
    "realparse_spark.operators.linkage",
    "realparse_spark.operators.graph",
    "realparse_spark.operators.layout",
)

# The driver's CORRECTNESS run caps at the first 50 registered queries, so
# registration order decides which queries earn a hard driver-verified row
# each round.  Names listed here are emitted FIRST (in this order); everything
# else follows in module order.  Rotate per round so every query accumulates
# driver rows.  The round-6 window (EXACTLY 50 names): the 22 round-5
# second-session additions that registered after the r5 window filled (all
# in-repo-green via tests/test_oracle_parity.py / recall gates), the 10
# entries deferred from the r5 comment plan (driver-green in r1-r3,
# parity-covered in-repo since), the 10 queries NEW in round 6 (partsupp
# TPC-H shapes, PNG decode, the stateful-session lifecycle, compaction,
# schema evolution, salted join), and 8 re-verification slots for flagship
# queries whose newest driver row is r4 (watermark_incremental and
# top2_files yield their slots — F1 is independently re-verified through
# load_e2e's r5 row and the in-repo parity suite).  Deferred to the round-7 window: everything with an r5 row
# (q12/q14/q15/q17/q22/q4/q13, stream_join_e2e, rollup_merge, trend_slopes,
# gap_fill, dq_checks, doc_weighted_sample, multimodal_audio/video/decode,
# sim_ann_lsh_batch, emb_knn_join_ivf, the parse/text/load families,
# sim_ann_lsh — all re-verified in-repo every session) plus the queries
# added after this round's window filled, every one tri-scale
# (sf0.001/0.01/0.1) parity-green in-repo: dq_profile,
# doc_stratified_take, text_tfidf_cosine, fuzzy_match_parts,
# pagerank_parts, pagerank_weighted, skew_profile, join_size_profile,
# market_basket, zorder_key, table_diff, k_anonymity, text_bm25,
# emb_threshold_sweep, time_weighted_avg, event_ohlc, event_gaps,
# event_cusum, dedup_prefix_jaccard, cms_user_counts, vocab_build,
# text_oov_rate, interval_coverage, event_mad_outliers, graph_triangles,
# graph_khop, hist_quantiles, corr_matrix, grouping_sets_agg,
# bloom_prune_join, interval_overlap_join, crosstab_chi2,
# ols_price_model, weighted_median, daily_autocorr, ks_statistic,
# l_diversity, clamped_balance, benford_digits, gini_revenue,
# snm_linkage, and the round-6 in-session additions (all sf0.001+sf0.01
# parity-green at add time): poisson_bootstrap_ci, event_attribution,
# seasonal_dow, dp_group_counts, doc_decontaminate, linkage_clusters,
# line_dedup, epoch_shuffle, bpe_pair_counts, token_budget_mix,
# dedup_incremental_minhash, error_budget, ab_test, word_pmi,
# stream_enrich_e2e, graph_common_neighbors, linear_attribution,
# funnel_steps, graph_adamic_adar.
_PRIORITY = (
    # round-5 additions still without a driver row
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q19_disjunct_revenue",
    "q21_waiting_supplier",
    "scd2_build",
    "scd2_lookup",
    "daily_new_users",
    "rfm_segments",
    "stream_dedup_e2e",
    "stream_session_e2e",
    "window_distribution",
    "multimodal_resize",
    "multimodal_resample",
    "emb_pq",
    "sim_ann_pq",
    "sim_ann_ivf_pq",
    "approx_distinct_merge",
    "approx_topk_users",
    "approx_audience_overlap",
    "dq_embeddings",
    "salted_agg",
    # deferred from the round-5 plan (last driver row r1-r3)
    "approx_distinct",
    "approx_quantiles",
    "datetime_roundtrip",
    "sql_interface",
    "set_ops",
    "percentile_metrics",
    "sliding_window",
    "window_rank",
    "top_terms",
    "funnel_conversion",
    # new in round 6
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_important_stock",
    "q16_supplier_counts",
    "q20_promotable_stock",
    "multimodal_png",
    "stream_custom_state_e2e",
    "maintenance_compact",
    "schema_evolution",
    "salted_join",
    # flagship re-verification (newest driver row is r4)
    "customer_report",
    "pricing_summary",
    "dedup_minhash_lsh",
    "sim_topk_cosine",
    "tumbling_window",
    "like_pattern_join",
    "surrogate_keys",
    "report_formatted",
)


def _load():
    import importlib

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        for name, fn in getattr(mod, "QUERIES", {}).items():
            assert name not in queries, f"duplicate query name: {name}"
            queries[name] = fn
        for name, sql in getattr(mod, "ORACLES", {}).items():
            assert name not in oracles, f"duplicate oracle name: {name}"
            oracles[name] = sql

    missing = [n for n in _PRIORITY if n not in queries]
    assert not missing, f"_PRIORITY names not registered: {missing}"
    orphans = sorted(set(oracles) - set(queries))
    assert not orphans, f"oracles without a registered query: {orphans}"
    ordered = {n: queries[n] for n in _PRIORITY}
    ordered.update((n, f) for n, f in queries.items() if n not in ordered)
    return ordered, oracles


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _load()[0]


def all_oracles() -> dict[str, str]:
    return _load()[1]
