"""key_skew_profile semantics: shares, the needs_salt verdict, and the
O(top_n) output contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from realparse_spark.operators.scale import key_skew_profile
from realparse_spark.plans import explain as X


def _fixture(spark):
    # 'hot' owns 8/10 of the corpus; the rest is uniform
    rows = [("hot",)] * 8 + [("a",), ("b",)]
    return spark.createDataFrame(rows, ["k"])


def test_shares_and_verdict(spark):
    out = {r["key"]: r for r in key_skew_profile(_fixture(spark), "k", partitions=4).collect()}
    assert out["hot"]["n_rows"] == 8
    assert out["hot"]["share_ppm"] == 800_000
    assert out["hot"]["needs_salt"] is True  # 80% >> 1/4 fair share
    assert out["a"]["share_ppm"] == 100_000
    assert out["a"]["needs_salt"] is False  # 10% < 25% fair share
    # exactly at the fair share is NOT flagged (strict >)
    flat = spark.createDataFrame([("x",), ("y",), ("z",), ("w",)], ["k"])
    assert not any(
        r["needs_salt"] for r in key_skew_profile(flat, "k", partitions=4).collect()
    )


def test_topn_bound_and_plan(spark):
    many = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    df = key_skew_profile(many, "k", top_n=7)
    assert df.count() == 7
    # output bound must come from a per-partition heap, not a global sort
    assert "TakeOrderedAndProject" in X.executed_plan(df)
    assert X.python_eval_nodes(df) == 0
