"""ANN quality: the LSH-bucketed top-k must achieve high recall against the
exact brute-force top-k on the real fixture embeddings."""

from __future__ import annotations

from realparse_spark.operators.similarity import ann_lsh_topk, topk_cosine
from realparse_spark.sources.tables import load_table


def test_ann_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = [r.vec_id for r in topk_cosine(emb, query_vec_id=0, k=10).collect()]
    approx = [r.vec_id for r in ann_lsh_topk(emb, query_vec_id=0, k=10, radius=6).collect()]
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.5, (recall, exact, approx)


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    from realparse_spark.operators.similarity import ann_ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    exact = [r.vec_id for r in topk_cosine(emb, query_vec_id=0, k=10).collect()]
    approx = [r.vec_id for r in ann_ivf_topk(emb, query_vec_id=0, k=10, n_probe=6).collect()]
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.5, (recall, exact, approx)


def test_ann_scores_match_exact_for_common_hits(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {r.vec_id: r.cos for r in topk_cosine(emb, query_vec_id=0, k=10).collect()}
    approx = {r.vec_id: r.cos for r in ann_lsh_topk(emb, query_vec_id=0, k=10, radius=6).collect()}
    for vid in set(exact) & set(approx):
        assert exact[vid] == approx[vid]  # same re-rank metric, same value
