"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Timing is per-query wall clock around a full materialization
(count + collect of the aggregate output), after a JVM/session warmup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# keep Spark quiet so stdout is exactly one JSON line
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

HEADLINE = [
    "customer_report",      # broadcast-join + grouped report (flagship)
    "log_report_e2e",       # synth + full style-5 parse + report
    "parse_style5",         # raw parse throughput
    "tumbling_window",      # time-windowed agg
    "sessionize",           # window functions
    "distinct_agg",         # exact distinct
    "json_props",           # JSON extraction
    "like_pattern_join",    # non-equi LIKE join
    "asof_join",            # as-of join (union + running window)
    "rollup_agg",           # grouping sets
    "dedup_exact",          # hash dedup
    "dedup_minhash_lsh",    # MinHash+LSH near-dup (scale path)
    "sim_topk_cosine",      # brute-force ANN baseline
    "text_quality",         # text feature extraction
]

# newer queries benched separately so the headline totals stay comparable
# round-over-round (they are not in bench_baseline.json)
EXTRA = [
    "dedup_ngram_jaccard",  # exact inverted-index near-dup
    "dedup_clusters",       # connected components (iterative joins)
    "dedup_canonical",      # cluster + keep-best selection
    "sim_topk_cosine_arrow",  # Arrow/numpy scoring kernel
    "doc_split",            # deterministic md5 split
    "doc_pack",             # sequence packing (partitioned window)
    "text_winnow",          # rolling-hash winnowing fingerprints
    "emb_quantize",         # int8 vector quantization
    "pricing_summary",      # TPC-H Q1-shape wide decimal agg
    "revenue_by_nation",    # TPC-H Q5-shape 6-table star join
    "doc_pipeline_e2e",     # composed quality->langid->dedup->sample->split
    "anonymize_ips",        # parse + IP pseudonymization
    "text_repetition",      # per-row sorted-run repetition metrics
    "redact_pii",           # shuffle-free PII scrub
    "doc_source_mix",       # source-mix shares + resampling weights
    "text_unigram_logprob", # unigram-LM perplexity-filter score
    "doc_chunk",            # overlapping context-window chunking (narrow)
    "dedup_containment",    # asymmetric shingle containment near-dup
    "events_retention",     # cohort retention triangle
    "q3_shipping_priority", # TPC-H Q3 shape (broadcast dim + TakeOrdered)
    "sim_ann_lsh",          # bucketed LSH probe (cold = index build, warm = pruned lookup)
    "multimodal_decode",    # real PPM/BMP encode->decode round trip (Arrow kernel)
    "sim_ann_lsh_batch",    # many-query probe in ONE equi-join vs the LSH index
    "emb_knn_join_ivf",     # centroid-blocked batch k-NN
    "q12_priority_class",   # TPC-H Q12 shape (big-big equi-join into CASE agg)
    "q14_promo_revenue",    # TPC-H Q14 shape (broadcast dim + conditional ratio)
    "q15_top_supplier",     # TPC-H Q15 shape (argmax via scalar-max join-back)
    "q17_small_qty_revenue",  # TPC-H Q17 shape (per-group avg join-back)
    "q22_idle_balance",     # TPC-H Q22 shape (scalar threshold + anti-join)
    "rollup_merge",         # hourly->daily partial-aggregate merge
    "trend_slopes",         # exact-decimal OLS slope per type
    "multimodal_audio",     # real WAV encode->decode round trip (Arrow kernel)
    "multimodal_video",     # real Y4M per-frame decode (Arrow kernel)
    "q4_late_orders",       # TPC-H Q4 shape (semi-join + date residual)
    "q13_order_counts",     # TPC-H Q13 shape (outer join + double agg)
    "gap_fill",             # dense-grid locf forward fill
    "dq_checks",            # integrity gate (anti-joins + agg union)
    "doc_weighted_sample",  # continuous-weight importance sampling
    "salted_agg",           # two-phase skew-resistant aggregation
    "q6_forecast_revenue",  # TPC-H Q6 shape (pure scan-pushdown agg)
    "q7_nation_volume",     # TPC-H Q7 shape (two dim chains, nation pair)
    "q8_market_share",      # TPC-H Q8 shape (deepest join tree, share ratio)
    "q19_disjunct_revenue", # TPC-H Q19 shape (disjunctive superset pushdown)
    "q21_waiting_supplier", # TPC-H Q21 shape (double EXISTS as one window)
    "scd2_build",           # SCD2 dimension build (two windows, one shuffle)
    # (stream_dedup_e2e is correctness-only, like the other streaming
    # lifecycles: wall time is trigger/checkpoint overhead, not throughput)
    "emb_pq",               # product-quantization encode + quality report
    "sim_ann_pq",           # ADC shortlist + exact re-rank (compressed domain)
    "multimodal_resize",    # real nearest-neighbor resize round trip
    "daily_new_users",      # growth accounting (distinct + first-seen)
    "rfm_segments",         # per-nation RFM quintiles (3 windows, 1 shuffle)
    "scd2_lookup",          # point-in-time dimension join (interval residual)
    "approx_distinct_merge",  # HLL sketch-blob rollup (daily -> total)
    "window_distribution",  # percent_rank/cume_dist/nth_value shared frames
    "multimodal_resample",  # real WAV decimation round trip
    "sim_ann_ivf_pq",       # composed IVF-PQ probe (pruned read + ADC)
    "approx_audience_overlap",  # theta-sketch set algebra (overlap/reach)
    "dq_embeddings",        # vector-table QA (array-expression checks)
    "q2_min_cost_supplier", # TPC-H Q2 shape (min + join-back over partsupp)
    "q9_product_profit",    # TPC-H Q9 shape (composite-key fact join)
    "q11_important_stock",  # TPC-H Q11 shape (scalar-threshold HAVING)
    "q16_supplier_counts",  # TPC-H Q16 shape (NOT-IN anti + count distinct)
    "q20_promotable_stock", # TPC-H Q20 shape (nested semi-joins)
    "multimodal_png",       # real PNG decode (inflate + unfilter + CRC)
    "maintenance_compact",  # fragment -> compact -> row-preserving report
    "schema_evolution",     # two-epoch write -> mergeSchema read -> report
    "salted_join",          # salt-replicated skew join (parity vs plain join)
    "dq_profile",           # per-column profile in one Expand aggregate pass
    "doc_stratified_take",  # exact-n-per-stratum deterministic quota sample
    "text_tfidf_cosine",    # weighted sparse-vector similarity (integer idf)
    "fuzzy_match_parts",    # blocked edit-distance record linkage
    "snm_linkage",          # sorted-neighborhood pass (two-phase global rank)
    "pagerank_parts",       # 3-iteration integer PageRank (co-order graph)
    "skew_profile",         # shuffle-key pre-flight (heavy-key shares)
    "join_size_profile",    # exact join-cardinality pre-flight (O(keys))
    "market_basket",        # frequent-pair support + integer lift
    "zorder_key",           # Morton-key arithmetic (data-skipping layout)
    "table_diff",           # keyed snapshot reconciliation (CDC validation)
    "k_anonymity",          # quasi-identifier equivalence-class audit
    "l_diversity",          # sensitive-attribute diversity audit
    "text_bm25",            # integer-exact Okapi BM25 top-k retrieval
    "time_weighted_avg",    # irregular-sampling TWA (one window shuffle)
    "event_ohlc",           # hourly OHLC bars (shared partitioning)
    "event_gaps",           # data-downtime detection (relative threshold)
    "event_cusum",          # CUSUM change-point (shared-shuffle windows)
    "dedup_prefix_jaccard", # lossless prefix-filtered set-similarity join
    "cms_user_counts",      # count-min sketch build + probe (portable hashes)
    "text_oov_rate",        # vocab build + per-source OOV coverage (ppm)
    "interval_coverage",    # merge overlapping intervals (one window shuffle)
    "event_mad_outliers",   # robust median/MAD outliers (two agg passes)
    "graph_triangles",      # degree-oriented triangle counting (shared snapshot)
    "graph_khop",           # unrolled BFS reach rings (frontier anti-joins)
    "hist_quantiles",       # bounded-state histogram quantiles (oracled)
    "corr_matrix",          # one-pass exact-moment Pearson matrix
    "grouping_sets_agg",    # heterogeneous grains, one Expand + one shuffle
    "bloom_prune_join",     # runtime Bloom prune before the join shuffle
    "interval_overlap_join",# bucket-blocked big-big interval overlap join
    "crosstab_chi2",        # chi-square contingency cells (exact moments)
    "ols_price_model",      # closed-form OLS (one decomposable agg)
    "weighted_median",      # exact weighted median (one window shuffle)
    "daily_autocorr",       # calendar-lag ACF (one join, 7 lags)
    "ks_statistic",         # binned two-sample KS drift test (bounded state)
    "clamped_balance",      # clamp-at-zero balance via cumsum-minus-runmin
    "benford_digits",       # first-digit Benford audit (9-row output)
    "gini_revenue",         # per-nation Gini concentration (rank formula)
    "poisson_bootstrap_ci",  # R-fold Poisson-weight replicate means (one shuffle)
    "event_attribution",    # last-touch credit (one per-user window)
    "seasonal_dow",         # additive decomposition over the daily rollup
    "dp_group_counts",      # discrete-Laplace noisy release (O(groups) noise)
    "doc_decontaminate",    # winnow -> contamination pairs -> keep/drop rollup
    "linkage_clusters",     # fuzzy pairs -> connected components -> entities
    "line_dedup",           # CCNet segment scrub + ordered reassembly
    "epoch_shuffle",        # deterministic epoch permutation -> batch manifest
    "bpe_pair_counts",      # BPE merge-candidate counts off the word table
    "token_budget_mix",     # two-phase bucketed budget fill (no hot reducer)
    "error_budget",         # SLO burn rates over the daily rollup
    "ab_test",              # hash-split two-proportion z-test readout
    "word_pmi",             # doc-level co-occurrence PMI (df-capped pair join)
    "graph_common_neighbors",  # link prediction (cap-bounded in-row wedges)
    "linear_attribution",   # multi-touch equal split (time-band join)
    "funnel_steps",         # ordered 3-step funnel (chained conditional mins)
    "pagerank_weighted",    # weight-proportional rank split (broadcast ranks)
    "graph_adamic_adar",    # degree-damped link prediction (wedge join)
    "vocab_build",          # top-N vocab (TakeOrdered + bounded window)
    "emb_threshold_sweep",  # pair-band cumulative threshold curve
    "dedup_incremental_minhash",  # new-batch probe vs corpus signatures
    "pii_density",          # per-source PII audit (regex at scan speed)
    "vocab_zipf_slope",     # Zipf exponent over the term-frequency head
    "ngram_novelty",        # first-occurrence novelty per document
    "adaptive_length_filter",  # per-source Tukey fences via dist. rank
    "doc_cdc_dedup",        # content-defined chunk partial-dup report
    "dedup_phash",          # DCT perceptual-hash image near-dup pairs
    "dsir_importance",      # target-vs-raw log-ratio importance weights
    "dsir_resample",        # Gumbel-top-k weighted selection off the weights
    "semdedup",             # cluster-blocked semantic dedup audit
    "ccnet_ppl_buckets",    # per-source LM-score tertile split
    "doc_dup_spans",        # ExactSubstr dup-span report (gram join + islands)
    "dup_span_profile",     # per-source duplicated-text rollup
    "bpe_train",            # 8 BPE merges (iterative; snapshot-cached artifact)
    "bpe_apply",            # subword segmentation + compression report
    "mannwhitney_u",        # tie-corrected rank test (distributed avg ranks)
    "theil_sen_trend",      # slope-median robust trend over the daily rollup
    "quality_filter_report",  # C4/Gopher rule ensemble (scan-speed features)
    "doc_span_clip",        # keep-first ExactSubstr clip accounting
    "winsorize_values",     # exact-order-stat clamped means per type
    "emb_matryoshka_eval",  # truncated-width recall curve vs full ground truth
    "soft_dedup_weights",   # SoftDeDup down-weighting (exact micro-unit mass)
    "lang_mix_temperature", # mT5 alpha-temperature language resampling rates
    "group_safe_split",     # leakage-safe dup-group-disjoint split audit
    "kmeans_train",         # 3 Lloyd iterations (broadcast assign + decimal means)
    "emb_drift",            # epoch-over-epoch centroid shift monitor
    "source_overlap_matrix",  # source-pair winnow containment matrix
    "packing_efficiency",   # context-window utilization / waste report
    "doc_language_confusion",  # langid-vs-truth confusion matrix (ppm shares)
    "curation_pipeline_e2e",  # gate -> soft-dedup -> group-safe split, one plan
    "corpus_datasheet",     # per-source datasheet (langs, dup/keep ppm) in one plan
    "retrieval_eval",       # recall@k / MRR / nDCG over planted relevance
    "retrieval_eval_ann",   # same metrics over the pruned LSH probe
    "dedup_minhash_e2e",    # composed signatures->pairs->components->keep-list
    "dedup_minhash_portable",  # md5-portable MinHash+LSH (oracle companion)
    "dedup_simhash_portable",  # md5-portable SimHash (oracle companion)
    "bpe_apply_pinned",     # pinned-vocab merge-fold apply (oracle companion)
    "q18_large_volume",     # classic Q18: explicit broadcast semi-join reduction
    "dedup_eval",           # LSH-vs-exact-Jaccard precision/recall/F1 report
    "report_mail",          # S9 compose: per-customer mail bodies
    "quality_classifier_train",  # 3 unrolled logistic GD steps
    "classifier_calibration",  # reliability bins over the trained scorer
    "hard_negative_mining",  # per-query top-k wrong-label cosines + margins
    "text_readability",     # Flesch reading-ease report (scan-speed regex counts)
    "classifier_pr_curve",  # precision/recall/F1 threshold sweep (integer counts)
    "nb_langid_confusion",  # trained naive-Bayes langid, held-out confusion matrix
    "pca_power_iter",       # matrix-free top principal component (3 power steps)
    "bm25_retrieval_eval",  # lexical retrieval graded by the shared metric rollup
    "ivf_balance",          # IVF quantizer health report (oracled companion)
    "mmr_diversify",        # greedy MMR re-rank of the retrieval shortlist
    "tokenizer_fertility",  # chars/words-per-token audit (scan-speed counts)
    "span_corruption_plan", # T5 denoising mask layout (hash-placed spans)
    "csv_quarantine",       # dirty-CSV landing zone with malformed-row routing
    "emb_isotropy",         # pairwise-cosine collapse monitor (probe subset)
    "lm_holdout_ppl",       # held-out unigram-LM perplexity per source (CCNet loop)
    "doremi_lite_weights",  # excess-loss mixture re-weighting off the shared LM
    "event_ewma",           # calendar-lag EWMA smoothing (exact-decimal weights)
    "t_closeness",          # EMD release audit (all-integer, completes the trio)
    "emb_dim_variance",     # per-dimension variance / width-pruning profile
    "forecast_backtest",    # seasonal-naive MAE/bias/WAPE accuracy table
    "distinct_merge_exact",  # exact twin of the HLL rollup (oracled companion)
    "audience_overlap_exact",  # exact twin of the theta algebra (oracled companion)
    # (the streaming lifecycles — stream_*_e2e — are correctness-only:
    # wall time is trigger/checkpoint overhead, not throughput)
]


def gate_regressions(baseline, sf, warm, extra_warm, remeasure_min):
    """Both regression gates, pure given a `remeasure_min(name, k)`
    callback (min of k fresh re-executions) — unit-testable without
    Spark (tests/test_bench_gate.py exercises the retry paths, which a
    real bench run only hits during an actual drift event).

    Per-query gate: warm > 2x floor + 0.5s (the absolute slack keeps
    sub-second floors from tripping on scheduler noise; observed: a
    loaded host uniformly ~2.5x's every query, including untouched
    ones).  Suspects get a 3-run re-measure — a co-tenant load burst
    does not reproduce, a real plan regression does.  BOTH samples are
    published (`remeasures`: {first, retry_min}) and the recorded
    per-query timing keeps the original protocol's value, so the floor
    ratchet never ingests retry minima.

    Aggregate gate: the per-query slack is blind to a fleet-wide slide
    on sub-second queries (round 6 shipped a uniform 1.5x with
    `regressions: []`), so sum(warm) over every floored query must stay
    within 1.25x sum(floors), with one 1-run re-measure pass
    (min-merged into a SEPARATE total — external load can only inflate)
    before failing.

    A floored query with NO timing this run (errored or dropped from
    the benched set) is itself a regression — without this, a query
    that starts crashing silently exits both gates.

    Returns (regressions, remeasures, agg_ratio)."""
    regressions: list[str] = []
    remeasures: dict[str, dict[str, float]] = {}
    agg_ratio = None
    if sf != baseline.get("sf"):
        return regressions, remeasures, agg_ratio

    def _over(got: float, floor: float) -> bool:
        return got > 2.0 * floor + 0.5

    missing = [
        name
        for section, got_map in (("warm", warm), ("extra_warm", extra_warm))
        for name in baseline.get(section, {})
        if got_map.get(name) is None
    ]
    if missing:
        regressions.append(
            "floored queries absent from this run (errored or dropped): "
            + ", ".join(sorted(missing))
        )

    gated = [
        (name, got_map, floor)
        for section, got_map in (("warm", warm), ("extra_warm", extra_warm))
        for name, floor in baseline.get(section, {}).items()
        if got_map.get(name) is not None
    ]
    for name, got_map, floor in gated:
        if not _over(got_map[name], floor):
            continue
        retry_min = remeasure_min(name, 3)
        remeasures[name] = {"first": got_map[name], "retry_min": retry_min}
        if _over(retry_min, floor):
            regressions.append(
                f"{name}: first {got_map[name]}s, retry {retry_min}s vs "
                f"baseline {floor}s (> 2x + 0.5s, reproduced on re-measure)"
            )

    floor_sum = sum(floor for _, _, floor in gated)
    got_sum = sum(got_map[name] for name, got_map, _ in gated)
    agg_ratio = round(got_sum / floor_sum, 3) if floor_sum else None
    if agg_ratio is not None and agg_ratio > 1.25:
        # min-merge any per-query min-of-3 retry already collected above
        # instead of burning (and trusting) a single fresh run for those
        retry_sum = sum(
            min(
                got_map[name],
                remeasures[name]["retry_min"]
                if name in remeasures
                else remeasure_min(name, 1),
            )
            for name, got_map, _ in gated
        )
        retry_ratio = round(retry_sum / floor_sum, 3)
        remeasures["__aggregate__"] = {"first": agg_ratio, "retry_min": retry_ratio}
        if retry_ratio > 1.25:
            regressions.append(
                f"aggregate warm drift: retry sum {round(retry_sum, 3)}s vs "
                f"floors {round(floor_sum, 3)}s "
                f"(ratio {retry_ratio} > 1.25, reproduced on re-measure)"
            )
        agg_ratio = retry_ratio
    return regressions, remeasures, agg_ratio


def host_probe() -> float:
    """Repo-independent host-speed probe: min-of-3 of a fixed numpy
    matmul.  Reported alongside the timings (and a committed floor in
    bench_baseline.json) so a drift verdict can be read against how fast
    THIS run's host actually was — round 8's first bench overlapped the
    previous round's driver closeout and read agg_ratio 1.306 vs 1.241
    minutes later on the idled host.  Reporting-only: no gate consumes
    it (a code regression can't inflate a repo-independent probe, but
    auto-scaling floors by it would still soften the contract)."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.random((1024, 1024))
    a @ a  # warm BLAS threads
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        a @ a
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def effective_cores() -> float:
    """Sustained-parallelism probe: wall-clock of N CPU-bound processes
    vs one, reported as the effective core count the hypervisor is
    actually delivering.  A co-tenant on the PHYSICAL host steals
    parallel capacity without touching loadavg or short single-core
    probes — observed in round 8: probe_sec/sha-chain identical to the
    morning's clean run while every 32-way Spark stage ran a uniform
    ~1.4x slower; this probe read ~22 of 32.  Reporting-only, like
    host_probe: it explains a drift verdict, it does not excuse one."""
    import multiprocessing as mp

    n = os.cpu_count() or 1
    # spawn, never fork: the post-regression re-probe runs AFTER the Spark
    # JVM gateway and its threads are live, and fork-with-threads can
    # deadlock the probing process right as it is about to report
    ctx = mp.get_context("spawn")

    with ctx.Pool(1) as p:
        p.map(_burn, [0])  # warm the worker, same as the N-process side
        t0 = time.perf_counter()
        p.map(_burn, [1])
        single = time.perf_counter() - t0
    with ctx.Pool(n) as p:
        p.map(_burn, [0] * n)  # warm the workers
        t0 = time.perf_counter()
        p.map(_burn, [1] * n)
        wall = time.perf_counter() - t0
    return round(n * single / wall, 1) if wall > 0 else float(n)


def _burn(flag: int) -> int:
    x = 0
    for i in range(3_000_000 if flag else 1000):
        x += i * i
    return x


def main() -> None:
    # ambient host context BEFORE this run loads the machine (a 1-min
    # load average read at the end would mostly measure the bench itself)
    load_before = round(os.getloadavg()[0], 2)
    # starved-host guard: when the hypervisor is delivering well under
    # the nominal core count (physical-host co-tenant), every Spark
    # stage runs uniformly slower and a drift verdict measures the
    # neighbor, not the code.  Wait (bounded — the driver's per-round
    # run must not hang; 8x60s worst case, raised from 3 after rounds
    # 9-11 all landed on multi-hour co-tenancy windows) for capacity to
    # return; proceed and measure regardless after the last attempt,
    # with the probe values recorded in the output either way.
    eff = effective_cores()
    n_cpu = os.cpu_count() or 1
    for _ in range(8):
        if eff >= 0.8 * n_cpu:
            break
        print(
            f"bench: host delivering ~{eff} of {n_cpu} cores; waiting 60s",
            file=sys.stderr,
        )
        time.sleep(60)
        eff = effective_cores()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    # cold-pass honesty (r11 verdict item 4): the fingerprint-keyed
    # parquet snapshots (LSH/prefix/co-order/BPE indexes) live in /tmp and
    # survive across runs, so a second bench on an unwiped host would
    # report cold times that silently exclude the index builds.  Wipe
    # them BEFORE the session exists (no reader can hold a plan yet) so
    # every cold number includes the build it pays on a fresh host.
    from realparse_spark.cache import wipe_snapshots

    snapshots_wiped = wipe_snapshots()

    from realparse_spark.registry import all_queries
    from realparse_spark.session import get_spark

    spark = get_spark("realparse-bench")
    queries = all_queries()

    # warmup: touch every input table once so first-query timing isn't
    # dominated by JVM classloading / parquet footer reads
    from realparse_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()

    from pyspark.sql import functions as F

    def materialize(df) -> None:
        # count() would let Catalyst prune every column (a parse query
        # would never run its regexes); hashing all output columns forces
        # full evaluation while returning one tiny row
        df.select(F.max(F.hash(*df.columns)).alias("h")).collect()

    def bench_set(names: list[str]) -> tuple[dict[str, float], dict[str, float]]:
        cold: dict[str, float] = {}
        steady: dict[str, float] = {}
        for name in names:
            fn = queries.get(name)
            if fn is None:
                continue
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            cold[name] = round(time.perf_counter() - t0, 3)
            # steady-state: best of two re-executions (codegen/broadcast
            # cached; min damps GC/compaction noise on the shared local JVM)
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                materialize(fn(spark, sf_dir))
                runs.append(time.perf_counter() - t0)
            if min(runs) < 1.0:
                # sub-second queries are dominated by scheduler jitter on a
                # shared host: take the MIN of 5 re-executions.  (r3 used
                # median-of-5 and still flagged two phantom regressions —
                # sustained co-tenant load inflates every sample, so the
                # median tracks the host, not the code.  The min is the
                # achievable latency: a real plan regression raises it too,
                # while external load cannot lower it.)
                for _ in range(3):
                    t0 = time.perf_counter()
                    materialize(fn(spark, sf_dir))
                    runs.append(time.perf_counter() - t0)
                steady[name] = round(min(runs), 3)
            else:
                steady[name] = round(min(runs), 3)
        return cold, steady

    timings, warm = bench_set(HEADLINE)
    extra, extra_warm = bench_set(EXTRA)
    total = round(sum(timings.values()), 3)

    # regression gate: warm timings must stay within 2x of the committed
    # baseline (previous round's driver numbers) at the baseline's sf
    baseline_path = os.path.join(REPO, "bench_baseline.json")
    baseline = {}
    if os.path.exists(baseline_path):
        with open(baseline_path) as fh:
            baseline = json.load(fh)

    def remeasure_min(name: str, k: int) -> float:
        runs = []
        for _ in range(k):
            t0 = time.perf_counter()
            materialize(queries[name](spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 3)

    regressions, remeasures, agg_ratio = gate_regressions(
        baseline, sf, warm, extra_warm, remeasure_min
    )
    # a verdict reached on a capacity-starved host carries its context
    # inline (the gate still fails — the probes explain, they don't
    # excuse; a reader of the archived line sees both).  RE-probe here:
    # the start-of-run reading can't see a co-tenant that arrived
    # mid-run — the exact failure mode being annotated.
    host_note = None
    if regressions:
        eff = min(eff, effective_cores())
        if eff < 0.8 * n_cpu:
            host_note = (
                f"host delivered ~{eff} of {n_cpu} cores around this run "
                "(physical-host co-tenancy; see SCALE.md benchmarking notes)"
            )

    # stdout is EXACTLY one compact JSON line (headline timings, warm
    # totals, regressions) — the driver archives only the tail of stdout
    # (observed: BENCH_r05's single giant line outgrew the 2000-char
    # window and lost the headline totals), so the line must stay well
    # under that.  The full per-query detail goes to BENCH_DETAIL.json,
    # version-tracked in the repo.
    detail = {
        "queries_extra": extra,
        "queries_extra_warm": extra_warm,
        "remeasures": remeasures,
        # scaling-probe honesty (r11 verdict item 2): at this SF a warm
        # query under ~1 s is dominated by fixed per-job overhead
        # (scheduling, codegen cache lookups, collect), so its 8-vs-32
        # core ratio carries no signal about the plan's parallelism —
        # list them so a ≈1 ratio is read as overhead-bound, not as an
        # ignored core count.
        "scaling_overhead_bound": sorted(
            n for n, v in {**warm, **extra_warm}.items() if v < 1.0
        ),
        "snapshots_wiped": snapshots_wiped,
    }
    summary = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_warm": warm,
        "warm_total": round(sum(warm.values()), 3),
        "extra_warm_total": round(sum(extra_warm.values()), 3),
        "extra_count": len(extra_warm),
        "sf": sf,
        "agg_ratio": agg_ratio,
        "regressions": regressions,
        # parallelism contract, self-evidencing (r11 verdict item 2): the
        # session is local[$SPARK_GRAFT_CPUS]; print what the JVM actually
        # resolved so a scaling run can verify the env var was honored
        # without trusting the harness.
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "shuffle_partitions": int(spark.conf.get("spark.sql.shuffle.partitions")),
        # host context for reading drift verdicts (see host_probe)
        "probe_sec": host_probe(),
        "effective_cores": eff,
        "load_avg_start": load_before,
        **({"host_note": host_note} if host_note else {}),
    }
    with open(os.path.join(REPO, "BENCH_DETAIL.json"), "w") as fh:
        json.dump({**summary, **detail}, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(summary))
    if regressions:
        print("BENCH REGRESSION: " + "; ".join(regressions), file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
