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
# driver rows.  The round-7 window (EXACTLY 50 names): registry growth is
# FROZEN this round (per the round-6 verdict) and the window is drawn
# entirely from the 60 registered queries that have never earned a driver
# CORRECTNESS row (r1-r6 union) — the text/dedup/pipeline batch, the
# analytics/statistics batch, the inference/privacy batch, the linkage and
# graph families, and the scale/layout profilers.  All 60 are
# tri-scale (sf0.001/0.01/0.1) parity-green in-repo via
# tests/test_oracle_parity.py (the driver-identical DuckDB check).  The 10
# deferred to the round-8 window (shapes already driver-proven through
# sibling queries, re-verified in-repo every session): doc_stratified_take,
# grouping_sets_agg, time_weighted_avg, event_ohlc, event_gaps,
# interval_coverage, event_mad_outliers, hist_quantiles, clamped_balance,
# dedup_incremental_minhash (rows-only).  Round-8 should spend its
# remaining ~40 slots on flagship re-verification (oldest rows now r4-r5:
# q12/q14/q15/q17/q22/q4/q13, stream_join_e2e, load_e2e, parse family).
_PRIORITY = (
    # text / NLP batch
    "text_bm25",
    "text_tfidf_cosine",
    "doc_decontaminate",
    "bpe_pair_counts",
    "word_pmi",
    "vocab_build",
    "text_oov_rate",
    # dedup / pipeline batch
    "dedup_prefix_jaccard",
    "emb_threshold_sweep",
    "line_dedup",
    "epoch_shuffle",
    "token_budget_mix",
    # streaming
    "stream_enrich_e2e",
    # joins / sketches / privacy
    "interval_overlap_join",
    "cms_user_counts",
    "k_anonymity",
    "l_diversity",
    "dp_group_counts",
    # event analytics batch
    "funnel_steps",
    "market_basket",
    "event_cusum",
    "event_attribution",
    "linear_attribution",
    "seasonal_dow",
    "error_budget",
    # statistics batch
    "corr_matrix",
    "crosstab_chi2",
    "ols_price_model",
    "weighted_median",
    "daily_autocorr",
    "ks_statistic",
    "benford_digits",
    "gini_revenue",
    # inference batch
    "poisson_bootstrap_ci",
    "ab_test",
    # data-quality / scale profilers
    "dq_profile",
    "table_diff",
    "skew_profile",
    "join_size_profile",
    "bloom_prune_join",
    "zorder_key",
    # linkage family
    "fuzzy_match_parts",
    "snm_linkage",
    "linkage_clusters",
    # graph family
    "pagerank_parts",
    "pagerank_weighted",
    "graph_triangles",
    "graph_khop",
    "graph_common_neighbors",
    "graph_adamic_adar",
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
