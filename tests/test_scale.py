"""Scale-utility tests: bucketed joins must be exchange-free; salted
aggregation must be result-identical to the direct groupBy."""

from __future__ import annotations

from pyspark.sql import functions as F

from realparse_spark.operators.scale import colocated_join, salted_groupby, write_bucketed
from realparse_spark.plans import explain as X
from realparse_spark.sources.tables import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    write_bucketed(lineitem.withColumnRenamed("l_orderkey", "k"), "b_lineitem", ["k"], 8)
    write_bucketed(orders.withColumnRenamed("o_orderkey", "k"), "b_orders", ["k"], 8)

    joined = spark.table("b_lineitem").hint("merge").join(spark.table("b_orders"), "k")
    agg = joined.groupBy("k").agg(F.count("*").alias("n"))
    try:
        plan = X.executed_plan(agg.filter(F.col("n") >= 0))
        # bucketed layout: the sort-merge join and the groupBy both reuse the
        # bucket partitioning — zero shuffle exchanges in the whole plan
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan
        assert joined.count() == lineitem.count()
        assert colocated_join(spark, "b_lineitem", "b_orders", "k").count() == lineitem.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_salted_groupby_matches_direct(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    direct = {
        (r.event_type,): (r.n, r.mx)
        for r in events.groupBy("event_type")
        .agg(F.count("value").alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        (r.event_type,): (r.n, r.mx)
        for r in salted_groupby(
            events,
            keys=["event_type"],
            aggs=[("count", "value", "n"), ("max", "value", "mx")],
            salt_n=8,
            salt_source="event_id",
        ).collect()
    }
    assert direct == salted


def test_salted_groupby_rejects_avg(spark, sf_dir):
    import pytest

    events = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        salted_groupby(events, ["event_type"], [("avg", "value", "a")])
