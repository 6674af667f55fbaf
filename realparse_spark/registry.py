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
    "realparse_spark.operators.corpus_quality",
    "realparse_spark.operators.selection",
    "realparse_spark.operators.spans",
    "realparse_spark.sinks.mail",
)

# The driver's CORRECTNESS run caps at the first 50 registered queries, so
# registration order decides which queries earn a hard driver-verified row
# each round.  Names listed here are emitted FIRST (in this order); everything
# else follows in module order.  Rotate per round so every query accumulates
# driver rows.
#
# The round-11 window (EXACTLY 50 names), per the round-10 verdict tasks 2-7:
# (a) the 11 round-10 additions with no driver row ever (tri-scale
#     parity-green in-repo, TRISWEEP_r10.txt; 50/50 pre-flighted) —
#     never-sampled backlog drains to zero again.
#     stream_quality_route_e2e is oracled like the other nine streaming
#     lifecycles.
# (b) the 4 round-11 additions, registered INSIDE the window while slots
#     are free (no new backlog): retrieval_eval (recall@k/MRR/nDCG,
#     oracled — verdict task 4), dedup_minhash_e2e (the composed fuzzy
#     lifecycle, rows-only + planted-dup gates — task 5), and the two
#     oracled companions that shrink the rows-only ledger (task 6):
#     dedup_minhash_portable (md5-hash MinHash+LSH, hash-verified
#     including the hot-bucket star cutover) and bpe_apply_pinned (the
#     real merge-fold apply path over a pinned vocabulary).
# (c) the full r6 staleness frontier (23 names) deferred per the
#     round-10 rotation note: the 9 rows-only sketch/ANN names get their
#     stale-rotation slot (in-repo gates carry their real guarantees)
#     plus the 14 oracled TPC-H/dq/maintenance rows.
# (d) 12 of the 50 r7-stale names, LLM-pipeline-relevant first (the
#     streaming enrich lifecycle, decontamination, BM25/tf-idf/PMI,
#     privacy aggregates); the remaining 38 r7 names are the round-12
#     stale frontier, all oracled or gate-covered, none never-sampled.
# Post-window additions register AFTER these 50 names; never-sampled
# backlog stays <= one round's driver capacity (the rule that took the
# backlog 60 -> 10 -> 7 -> 0 -> 14 -> 0 -> 11 -> 0).  Round-11 growth
# past the window: retrieval_eval_ann (the ANN probe in the retrieval
# seat, rows-only by design, metric arithmetic shared with the oracled
# retrieval_eval) and dedup_simhash_portable (the SimHash family's
# hash-verified md5 companion, oracled), plus q18_large_volume (the
# aggregate-semi-join-reduction shape that completes the 22-query
# TPC-H suite, oracled) and dedup_eval (precision/recall/F1 of the
# portable LSH detector vs exact shingle-Jaccard truth, oracled) and
# report_mail (the S9 mail sink's compose stage, oracled; delivery is
# the mbox/ SMTP seam in sinks/mail.py) and quality_classifier_train
# (logistic-regression distillation of the short-doc gate, unrolled-GD
# oracle), classifier_calibration (reliability bins + Brier over the
# trained scorer, shared-CTE oracle), and hard_negative_mining
# (per-query top-k wrong-label cosines + margins, scored-stage CTE
# shared with retrieval_eval, oracled) queue for round 12, as do the
# second-session additions text_readability (Flesch reading-ease
# report, oracled) and classifier_pr_curve (precision/recall/F1
# threshold sweep over the trained scorer, shared-CTE oracle), and
# nb_langid_confusion (multinomial naive-Bayes langid trained on the
# %5 split, held-out confusion matrix, oracled), and pca_power_iter
# (matrix-free top principal component by 3 unrolled power steps,
# oracled), bm25_retrieval_eval (sparse BM25 retrieval graded by
# the shared planted-relevance metric rollup, oracled), and
# ivf_balance (IVF quantizer health over the converged deterministic
# k-means partition — the sim_ann_ivf family's oracled companion),
# mmr_diversify (greedy Maximal Marginal Relevance re-rank of the
# retrieval shortlist, unrolled to k exact-decimal steps, oracled),
# stream_topk_e2e (the 11th streaming lifecycle: watermarked
# per-window term counts -> post-sink trending top-k, oracled),
# tokenizer_fertility (chars/words-per-token audit, oracled), and
# span_corruption_plan (T5-style denoising mask layout, md5-placed
# disjoint spans, oracled), csv_quarantine (dirty-CSV landing-zone
# ingest with pruning-proof malformed-row routing, oracled), and
# emb_isotropy (pairwise-cosine embedding-collapse monitor over the
# deterministic probe subset, oracled), and lm_holdout_ppl (held-out
# Laplace unigram-LM perplexity + OOV share per source — the CCNet
# loop with a real train/score split, oracled), and
# doremi_lite_weights (static DoReMi-style excess-loss mixture
# re-weighting sharing the held-out LM stage, oracled), and
# event_ewma (calendar-lag EWMA smoothing with exact 0.5^j decimal
# weights renormalized over present days, oracled), and t_closeness
# (all-integer ordered-EMD release audit completing the
# k-anonymity / l-diversity / t-closeness trio, oracled), and
# emb_dim_variance (per-dimension variance / cumulative-energy
# width-pruning profile — the "why" behind emb_matryoshka_eval's
# recall curve, oracled), and forecast_backtest (seasonal-naive
# MAE/bias/WAPE accuracy table over the daily series, oracled) —
# backlog 26 never-sampled + 38 r7-stale, under capacity.
_PRIORITY = (
    # --- (a) round-10 additions: never-sampled backlog drains to zero ---
    "soft_dedup_weights",
    "lang_mix_temperature",
    "group_safe_split",
    "packing_efficiency",
    "kmeans_train",
    "emb_drift",
    "source_overlap_matrix",
    "doc_language_confusion",
    "stream_quality_route_e2e",
    "curation_pipeline_e2e",
    "corpus_datasheet",
    # --- (b) round-11 additions, in-window (no new backlog) ---
    "retrieval_eval",
    "dedup_minhash_e2e",  # rows-only by design (xxhash64 lifecycle)
    "dedup_minhash_portable",
    "bpe_apply_pinned",
    # --- (c) the r6 staleness frontier: all 23 deferred names ---
    "approx_audience_overlap",  # rows-only (theta sketch)
    "approx_distinct",  # rows-only (HLL)
    "approx_distinct_merge",  # rows-only (HLL blob merge)
    "approx_quantiles",  # rows-only (KLL-ish)
    "approx_topk_users",  # rows-only (frequent items)
    "dedup_minhash_lsh",  # rows-only (xxhash64)
    "dq_embeddings",
    "emb_pq",  # rows-only (KMeans codebooks)
    "maintenance_compact",
    "percentile_metrics",
    "q11_important_stock",
    "q16_supplier_counts",
    "q19_disjunct_revenue",
    "q20_promotable_stock",
    "q21_waiting_supplier",
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q8_market_share",
    "salted_agg",
    "sim_ann_ivf_pq",  # rows-only (composed IVF-PQ probe)
    "sim_ann_pq",  # rows-only (ADC ranking)
    "sliding_window",
    "top_terms",
    # --- (d) 12 r7-stale names, LLM-pipeline-relevant first ---
    "stream_enrich_e2e",
    "doc_decontaminate",
    "text_bm25",
    "text_tfidf_cosine",
    "vocab_build",
    "word_pmi",
    "dedup_prefix_jaccard",
    "line_dedup",
    "epoch_shuffle",
    "token_budget_mix",
    "k_anonymity",
    "dp_group_counts",
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
