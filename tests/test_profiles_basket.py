"""Hand-computed semantics for the pre-flight join profiler and the
market-basket pair/lift arithmetic."""

from __future__ import annotations

from realparse_spark.operators.scale import join_size_profile
from realparse_spark.plans import explain as X


def test_join_size_profile_hand_values(spark):
    left = spark.createDataFrame([(1,), (1,), (2,), (3,)], ["k"])
    right = spark.createDataFrame([(1,), (2,), (2,), (9,)], ["j"])
    (r,) = join_size_profile(left, "k", right, "j", "t").collect()
    assert r["left_rows"] == 4 and r["n_keys_left"] == 3
    assert r["right_rows"] == 4 and r["n_keys_right"] == 3
    assert r["matched_keys"] == 2  # keys 1 and 2
    # key 1: 2*1, key 2: 1*2 -> out 4, max single-key contribution 2
    assert r["out_rows"] == 4
    assert r["max_key_out"] == 2
    # sanity: matches the actually-executed join size
    assert left.join(right, left["k"] == right["j"]).count() == r["out_rows"]


def test_join_size_profile_disjoint_keys(spark):
    left = spark.createDataFrame([(1,)], ["k"])
    right = spark.createDataFrame([(2,)], ["j"])
    (r,) = join_size_profile(left, "k", right, "j", "t").collect()
    assert r["matched_keys"] == 0
    # empty agg over no matches: sums/max are NULL, count is 0 — the
    # profile must still produce a row (the answer IS "output is empty")
    assert r["out_rows"] is None and r["max_key_out"] is None


def test_market_basket_hand_values(spark, tmp_path):
    import realparse_spark.operators.analytics as A

    # orders: o1={10,20,30}, o2={10,20}, o3={10,20}, o4={30}
    rows = [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 10), (3, 20),
        (4, 30),
    ]
    li = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    # the query rides the co-order snapshot, which stats+reads
    # <sf_dir>/lineitem.parquet — hand it a real fixture dir
    li.coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    out = {
        (r["part_a"], r["part_b"]): r
        for r in A.q_market_basket(spark, str(tmp_path)).collect()
    }
    # only pair with support >= 2 is (10,20): n_ab=3
    assert list(out) == [(10, 20)]
    r = out[(10, 20)]
    assert (r["n_ab"], r["n_a"], r["n_b"]) == (3, 3, 3)
    # lift_ppm = 3 * 4 orders * 1e6 div (3*3) = 1333333
    assert r["lift_ppm"] == 1_333_333


def test_profiles_stay_jvm_side(spark, sf_dir):
    from realparse_spark.registry import all_queries

    q = all_queries()
    for name in ("join_size_profile", "market_basket", "skew_profile"):
        df = q[name](spark, sf_dir)
        assert X.python_eval_nodes(df) == 0, name
        assert "CartesianProduct" not in X.executed_plan(df), name
