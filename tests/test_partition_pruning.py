"""Partitioned-sink + partition-pruning test: the 100 TB access-table
layout (SURVEY.md §4.3 'partition access by date + server_type') must make
time/family predicates prune at plan time."""

from __future__ import annotations

from pyspark.sql import functions as F

from realparse_spark.plans import explain as X
from realparse_spark.sources.tables import load_table


def test_date_partitioned_events_prune(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_part")
    (
        events.withColumn("event_date", F.to_date("ts"))
        .write.partitionBy("event_date")
        .parquet(out)
    )
    dates = [r.event_date for r in spark.read.parquet(out).select("event_date").distinct().collect()]
    assert len(dates) > 1

    one_day = spark.read.parquet(out).filter(F.col("event_date") == F.lit(dates[0]))
    plan = X.full_explain(one_day)
    # the date predicate must land in PartitionFilters (plan-time pruning),
    # NOT in PushedFilters (row-level filtering after reading every file)
    import re

    pf = re.search(r"PartitionFilters: \[[^\]]*event_date[^\]]*\]", plan)
    assert pf, plan[-2000:]
    day_rows = one_day.count()
    all_rows = spark.read.parquet(out).count()
    assert 0 < day_rows < all_rows
