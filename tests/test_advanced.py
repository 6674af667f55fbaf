"""Accuracy bound for the approximate-distinct sketch (rows-only at the
driver, so the quality gate lives here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realparse_spark.operators.advanced import q_approx_distinct
from realparse_spark.sources.tables import load_table

ORACLE_SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_rsd(spark):
    approx = {r.event_type: r.approx_users for r in q_approx_distinct(spark, ORACLE_SF).collect()}
    exact = {
        r.event_type: r.u
        for r in load_table(spark, ORACLE_SF, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("u"))
        .collect()
    }
    for et, e in exact.items():
        assert abs(approx[et] - e) / e < 0.1, (et, approx[et], e)
