"""table_diff semantics on a hand-built pair of snapshots."""

from __future__ import annotations

from realparse_spark.operators.dq import table_diff
from realparse_spark.plans import explain as X


def test_table_diff_hand_values(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        ["k", "s", "v"],
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (3, "c", 99), (5, "e", 50)],
        ["k", "s", "v"],
    )
    out = {r["status"]: r["n_rows"] for r in table_diff(old, new, "k", ["s", "v"]).collect()}
    assert out == {
        "added": 1,  # k=5
        "removed": 1,  # k=4
        "changed": 2,  # k=2 (s), k=3 (v)
        "unchanged": 1,  # k=1
        "changed:s": 1,
        "changed:v": 1,
    }


def test_table_diff_null_safe_comparison(spark):
    # NULL -> NULL is unchanged; NULL -> value and value -> NULL are changes
    old = spark.createDataFrame([(1, None), (2, "x"), (3, None)], ["k", "s"])
    new = spark.createDataFrame([(1, None), (2, None), (3, "y")], ["k", "s"])
    out = {r["status"]: r["n_rows"] for r in table_diff(old, new, "k", ["s"]).collect()}
    assert out["unchanged"] == 1 and out["changed"] == 2 and out["changed:s"] == 2


def test_table_diff_query_jvm_side(spark, sf_dir):
    from realparse_spark.registry import all_queries

    df = all_queries()["table_diff"](spark, sf_dir)
    assert X.python_eval_nodes(df) == 0
    assert "CartesianProduct" not in X.executed_plan(df)
