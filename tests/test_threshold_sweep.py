"""emb_threshold_sweep band accounting: the cumulative column must be a
suffix sum and the bands must partition the pair set."""

from __future__ import annotations

from tests.conftest import SF_DIR

from realparse_spark.plans import explain as X


def test_sweep_suffix_sum_and_total(spark):
    from realparse_spark.operators.dedup import embedding_near_dup, q_emb_threshold_sweep
    from realparse_spark.sources.tables import load_table

    rows = q_emb_threshold_sweep(spark, SF_DIR).collect()
    # suffix-sum invariant: n_pairs_ge(band) = n_pairs(band) + n_pairs_ge(next band)
    by_band = sorted(rows, key=lambda r: r["band"], reverse=True)
    running = 0
    for r in by_band:
        running += r["n_pairs"]
        assert r["n_pairs_ge"] == running, r
    # the 0.35 cut sits inside band 3 [0.3, 0.4): the exact pair count is
    # bracketed by the cumulative counts at bands 4 (cos >= 0.4, subset)
    # and 3 (cos >= 0.3, superset)
    ge_04 = next((r["n_pairs_ge"] for r in rows if r["band"] == 4), 0)
    ge_03 = next((r["n_pairs_ge"] for r in rows if r["band"] == 3), 0)
    exact = embedding_near_dup(
        load_table(spark, SF_DIR, "embeddings"), threshold=0.35
    ).count()
    assert ge_04 <= exact <= ge_03


def test_sweep_jvm_side(spark, sf_dir):
    from realparse_spark.registry import all_queries

    df = all_queries()["emb_threshold_sweep"](spark, sf_dir)
    assert X.python_eval_nodes(df) == 0
    assert "CartesianProduct" not in X.executed_plan(df)
