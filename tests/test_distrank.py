"""rank_distributed: dense-rank semantics + the zero-single-partition
plan invariant, on synthetic inputs with known total orders."""

from __future__ import annotations

import pyspark.sql.functions as F

from realparse_spark.operators.distrank import rank_distributed
from realparse_spark.plans import explain as X


def test_flat_rank_is_dense_and_ordered(spark):
    df = spark.range(10_000).select(
        (F.col("id") * 37 % 9973).alias("k"), F.col("id").alias("tiebreak")
    )
    got = rank_distributed(df, ["k", "tiebreak"], n_ranges=7).orderBy("rn").collect()
    exp = sorted((r.k, r.tiebreak) for r in df.collect())
    assert [(r.k, r.tiebreak) for r in got] == exp
    assert [r.rn for r in got] == list(range(1, 10_001))


def test_partitioned_rank_restarts_per_group(spark):
    df = spark.range(3_000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") * 17 % 997).alias("k"),
        F.col("id").alias("t"),
    )
    out = rank_distributed(
        df, ["k", "t"], rank_col="rank", partition_cols=("g",), n_ranges=5
    )
    by_g: dict[int, list] = {}
    for r in out.orderBy("g", "rank").collect():
        by_g.setdefault(r.g, []).append((r.rank, r.k, r.t))
    assert set(by_g) == {0, 1, 2}
    for g, rows in by_g.items():
        assert [a for a, _, _ in rows] == list(range(1, len(rows) + 1)), g
        assert [(k, t) for _, k, t in rows] == sorted((k, t) for _, k, t in rows)


def test_rank_matches_single_partition_window_reference(spark):
    from pyspark.sql import Window

    df = spark.range(500).select(
        (F.col("id") * 13 % 101).alias("k"), F.col("id").alias("t")
    )
    ref = {
        (r.k, r.t): r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("k", "t"))
        ).collect()
    }
    got = {(r.k, r.t): r.rn for r in rank_distributed(df, ["k", "t"]).collect()}
    assert got == ref


def test_rank_plan_has_no_single_partition_nodes(spark):
    """The helper's whole point: no unpartitioned window, no
    Exchange SinglePartition anywhere in its plan."""
    df = spark.range(1_000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("t")
    )
    out = rank_distributed(df, ["k", "t"])
    assert X.unpartitioned_windows(out) == 0
    assert "Exchange SinglePartition" not in X.executed_plan(out)


def test_all_rows_and_columns_pass_through(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("payload")
    )
    out = rank_distributed(df, ["k"])
    assert set(out.columns) == {"k", "payload", "rn"}
    rows = out.collect()
    assert len(rows) == 100
    assert all(r.payload == r.k * 2 for r in rows)


def test_rank_property_random_multisets(spark):
    """Hypothesis property: for ANY multiset of (key, uniquifier) rows —
    duplicates in the key, adversarial clustering, tiny and lopsided
    inputs — rank_distributed equals the position in the sorted total
    order, for several n_ranges including more ranges than rows."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        keys=st.lists(st.integers(-5, 5), min_size=1, max_size=60),
        n_ranges=st.sampled_from([1, 2, 7, 64]),
    )
    def prop(keys, n_ranges):
        rows = [(k, i) for i, k in enumerate(keys)]
        df = spark.createDataFrame(rows, "k int, t int")
        got = sorted(
            (r.rn, r.k, r.t)
            for r in rank_distributed(df, ["k", "t"], n_ranges=n_ranges).collect()
        )
        exp = [
            (i + 1, k, t) for i, (k, t) in enumerate(sorted((k, t) for k, t in rows))
        ]
        assert got == exp

    prop()
