"""partsupp-backed TPC-H shapes (Q2/Q9/Q11/Q16/Q20): synthesis
properties + plan-quality gates.  Differential correctness vs DuckDB is
covered by test_oracle_parity.py (the registry picks the module up
automatically); these tests pin what the oracle cannot see — the
synthesis invariants and the physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realparse_spark.operators.tpch_partsupp import synth_partsupp
from realparse_spark.plans import explain as X
from realparse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def queries():
    from realparse_spark.registry import all_queries

    return all_queries()


def test_synth_partsupp_invariants(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    ps = synth_partsupp(part, supplier).cache()
    try:
        n_part = part.count()
        n_supp = supplier.count()
        # exactly 4 DISTINCT suppliers per part (the stride q = S div 4
        # guarantees no collisions for S >= 4)
        per_part = ps.groupBy("ps_partkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("ps_suppkey").alias("nd"),
        )
        assert per_part.filter("n <> 4 OR nd <> 4").count() == 0
        assert ps.count() == 4 * n_part
        # every suppkey is a real supplier (referential integrity)
        orphans = ps.join(
            supplier, ps.ps_suppkey == supplier.s_suppkey, "left_anti"
        )
        assert orphans.count() == 0
        # value ranges from the synthesis arithmetic
        bad = ps.filter(
            (F.col("ps_availqty") < 1)
            | (F.col("ps_availqty") > 9999)
            | (F.col("ps_supplycost") < 1.0)
            | (F.col("ps_supplycost") > 1001.0)
        )
        assert bad.count() == 0
        assert n_supp >= 4  # stride precondition at every fixture scale
    finally:
        ps.unpersist()


def test_synth_partsupp_is_shuffle_free(spark, sf_dir):
    # the synthesized table = part scan + 4-way explode + 1-row broadcast
    # scalar; the ONLY exchange allowed is the scalar count's 1-row
    # SinglePartition agg — the part rows themselves must never shuffle
    ps = synth_partsupp(
        load_table(spark, sf_dir, "part"), load_table(spark, sf_dir, "supplier")
    )
    plan = X.executed_plan(ps)
    assert "Exchange hashpartitioning" not in plan
    # count_shuffles also matches the BroadcastExchange of the scalar
    assert X.count_shuffles(ps) <= 2
    assert X.python_eval_nodes(ps) == 0


def test_q2_broadcasts_dims_and_joins_back(spark, queries):
    df = queries["q2_min_cost_supplier"](spark, SF)
    plan = X.executed_plan(df)
    # region→nation→supplier chain and the part filter are broadcast;
    # only the min + join-back shuffles
    assert X.broadcast_join_count(df) >= 3
    assert "CartesianProduct" not in plan
    assert X.python_eval_nodes(df) == 0


def test_q9_composite_key_join_prunes_fact(spark, queries):
    df = queries["q9_product_profit"](spark, SF)
    # the part-name filter must reach the part scan; supplier/nation ride
    # as broadcast tags
    assert X.has_pushed_filter(df, "p_name")
    assert X.broadcast_join_count(df) >= 2
    assert X.python_eval_nodes(df) == 0


def test_q11_threshold_is_broadcast_scalar(spark, queries):
    df = queries["q11_important_stock"](spark, SF)
    plan = X.executed_plan(df)
    # the HAVING threshold is a 1-row broadcast, never a shuffled join
    assert "BroadcastNestedLoopJoin" in plan or X.broadcast_join_count(df) >= 1
    assert "CartesianProduct" not in plan
    assert X.python_eval_nodes(df) == 0


def test_q16_exclusion_is_broadcast_anti(spark, queries):
    df = queries["q16_supplier_counts"](spark, SF)
    plan = X.executed_plan(df)
    assert "LeftAnti" in plan
    assert X.broadcast_join_count(df) >= 2
    assert X.python_eval_nodes(df) == 0


def test_q20_date_filter_reaches_scan(spark, queries):
    df = queries["q20_promotable_stock"](spark, SF)
    # the 1997 window prunes the lineitem scan before the aggregate
    assert X.has_pushed_filter(df, "l_shipdate")
    plan = X.executed_plan(df)
    assert "LeftSemi" in plan
    assert X.python_eval_nodes(df) == 0
