"""Quarantine + compaction maintenance tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from realparse_spark.operators.compact import compact_table, table_file_stats
from realparse_spark.operators.load import load_style5, read_warehouse_table
from tests.test_load_pipeline import style5_line


def test_malformed_lines_quarantined(spark, tmp_path):
    d = tmp_path / "qlogs"
    d.mkdir()
    good = style5_line("10.0.0.1", "12/Oct/2002:09:00:00", "/m/ok.rm")
    (d / "rmaccess.log.1").write_text(
        "\n".join(
            [
                good,
                "totally garbage line with no timestamp",
                '10.0.0.2 - - [NOT/A/DATE:xx:yy:zz -0800] "GET /m/bad.rm RTSP/1.0" 200 1 [] [] 1 2 3 4 5 6',
            ]
        )
        + "\n"
    )
    wh = str(tmp_path / "qwh")
    counts = load_style5(spark, str(d), wh)
    assert counts["access"] == 1
    assert counts["quarantine"] == 2
    q = read_warehouse_table(spark, wh, "quarantine")
    assert q.count() == 2
    assert q.filter(F.col("value").contains("garbage")).count() == 1
    # re-run: same files re-read -> quarantine grows (no watermark for bad
    # rows by design: triage table, dedupe on ingestion into tooling)
    load_style5(spark, str(d), wh)
    assert read_warehouse_table(spark, wh, "access").count() == 1


def test_compact_table(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    path = str(tmp_path / "frag")
    # simulate many tiny appends
    for i in range(6):
        events.limit(100).write.mode("append").parquet(path)
    before_n = spark.read.parquet(path).count()
    b, a = compact_table(spark, path, target_file_bytes=10**9)
    assert b > a == 1
    assert spark.read.parquet(path).count() == before_n
    assert table_file_stats(spark, path)[0] == 1
