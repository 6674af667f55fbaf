"""Upsert (MERGE emulation) + compressed-log ingestion tests."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from realparse_spark.operators.upsert import upsert_parquet
from tests.test_load_pipeline import style5_line


def test_upsert_latest_wins(spark, tmp_path):
    path = str(tmp_path / "t")
    first = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10)], "k long, v string, ver long"
    )
    assert upsert_parquet(spark, first, path, ["k"], "ver") == 2

    second = spark.createDataFrame(
        [(2, "b2", 20), (3, "c", 20)], "k long, v string, ver long"
    )
    assert upsert_parquet(spark, second, path, ["k"], "ver") == 3
    got = {r.k: (r.v, r.ver) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10), 2: ("b2", 20), 3: ("c", 20)}

    # stale replay (older version) must NOT clobber
    stale = spark.createDataFrame([(2, "bOLD", 5)], "k long, v string, ver long")
    assert upsert_parquet(spark, stale, path, ["k"], "ver") == 3
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got[2] == "b2"


def test_gzip_log_ingestion(spark, tmp_path):
    """Rotated logs arrive gzipped in practice; spark.read.text handles
    .gz transparently, so the whole load pipeline works unchanged."""
    from realparse_spark.operators.load import load_style5, read_warehouse_table

    d = tmp_path / "gzlogs"
    d.mkdir()
    line = style5_line("10.0.0.1", "12/Oct/2002:09:00:00", "/m/zipped.rm")
    with gzip.open(d / "rmaccess.log.1.gz", "wt") as fh:
        fh.write(line + "\n")
    wh = str(tmp_path / "gzwh")
    counts = load_style5(spark, str(d), wh)
    assert counts["access"] == 1
    assert read_warehouse_table(spark, wh, "file").collect()[0].name == "zipped.rm"
