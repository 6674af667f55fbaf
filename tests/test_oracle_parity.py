"""Differential tests: every declared query must match its DuckDB oracle at
sf0.01 — the same check the driver runs (CORRECTNESS gate)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_ORACLE
from tests.oracle_harness import compare_query


def _pairs():
    from realparse_spark.registry import all_oracles, all_queries

    q = all_queries()
    o = all_oracles()
    return [(name, q[name], o[name]) for name in sorted(q) if name in o]


_PAIRS = _pairs()


@pytest.mark.parametrize("name,fn,sql", _PAIRS, ids=[p[0] for p in _PAIRS])
def test_query_matches_oracle(spark, duck, name, fn, sql):
    ok, detail = compare_query(spark, duck, fn, sql, SF_DIR_ORACLE)
    assert ok, f"{name}: {detail}"


def test_all_queries_have_oracle_or_reason():
    from realparse_spark.registry import all_oracles, all_queries

    q = all_queries()
    o = all_oracles()
    missing = sorted(set(q) - set(o))
    # rows-only checks must be intentional; keep the allowlist here
    allowed_rows_only = {
        "dedup_minhash_lsh",
        "dedup_minhash_e2e",  # composed xxhash64 lifecycle; planted-dup
        # partition/canonical gates in test_dedup; the hash-verified
        # family row is dedup_minhash_portable (md5 signatures, oracled)
        "dedup_incremental_minhash",  # xxhash64 band keys; batch-equality gate in test_dedup
        "dedup_simhash",
        "sim_ann_lsh",
        "sim_ann_lsh_batch",  # approximate; exact per-query parity gate vs lsh_probe
        "retrieval_eval_ann",  # ANN probe in the retrieval seat; metric
        # arithmetic hash-verified via retrieval_eval's oracle (shared
        # _retrieval_metrics rollup); bounds/consistency gates in
        # test_similarity
        "sim_ann_ivf",
        "emb_knn_join_ivf",  # approximate (block boundaries); recall-gated
        "emb_pq",  # KMeans codebooks not SQL-reproducible; error-bound gate
        "sim_ann_pq",  # compressed-domain ADC ranking; recall-gated
        "sim_ann_ivf_pq",  # composed IVF-PQ probe; recall-gated
        "approx_distinct",
        "approx_distinct_merge",  # HLL blob merge; error gate vs exact in tests
        "approx_topk_users",  # frequent-items sketch; exact-match gate in tests
        "approx_audience_overlap",  # theta set algebra; exact-match gate in tests
        "approx_quantiles",
        "dedup_phash",  # DCT hash not SQL-reproducible; kernel-parity +
        # recall/precision/determinism gates in test_multimodal
        "bpe_train",  # iterative driver loop; pure-Python BPE parity
        # gate in test_spans
        "bpe_apply",  # rides the trained artifact; pure-Python
        # segmentation parity gate in test_spans
    }
    assert set(missing) <= allowed_rows_only, f"queries without oracle: {missing}"
