"""BM25 ranking semantics: term-frequency gain, length normalization,
rare-term weighting — the three properties that define the scorer."""

from __future__ import annotations

from realparse_spark.operators.text import bm25_topk
from realparse_spark.plans import explain as X


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_tf_gain_and_saturation(spark):
    docs = _docs(
        spark,
        [
            (1, "spark alpha beta gamma"),
            (2, "spark spark alpha beta"),
            (3, "spark spark spark alpha"),
            (4, "alpha beta gamma delta"),
        ],
    )
    out = {r["doc_id"]: r["bm25_scaled"] for r in bm25_topk(docs, ["spark"], k=10).collect()}
    # more occurrences -> higher score, but with diminishing returns
    assert out[3] > out[2] > out[1]
    assert (out[2] - out[1]) > (out[3] - out[2])
    # doc without the term scores nothing (absent from output)
    assert 4 not in out


def test_length_normalization(spark):
    docs = _docs(
        spark,
        [
            (1, "spark alpha"),
            (2, "spark alpha beta gamma delta epsilon zeta eta theta iota"),
        ],
    )
    out = {r["doc_id"]: r["bm25_scaled"] for r in bm25_topk(docs, ["spark"], k=10).collect()}
    # same tf, longer doc -> lower score
    assert out[1] > out[2]


def test_rare_term_outweighs_common(spark):
    rows = [(i, "common alpha") for i in range(1, 11)]
    rows.append((100, "rare alpha"))
    docs = _docs(spark, rows)
    out = bm25_topk(docs, ["common", "rare"], k=1).collect()
    # the one doc holding the rare term wins the ranking
    assert out[0]["doc_id"] == 100


def test_bm25_query_jvm_side(spark, sf_dir):
    from realparse_spark.registry import all_queries

    df = all_queries()["text_bm25"](spark, sf_dir)
    assert X.python_eval_nodes(df) == 0
    assert "CartesianProduct" not in X.executed_plan(df)
    assert "TakeOrderedAndProject" in X.executed_plan(df)
