"""Small-file compaction for append-heavy parquet tables.

The incremental load appends a few files per run; after thousands of cron
runs (the reference ran per-day forever) a table becomes millions of tiny
files and listing/open costs dominate every scan — the classic small-files
problem.  `compact_table` rewrites a table into ~target-sized files with
the same atomic directory swap as the upsert (readers see old or new,
never partial).

Partitioned tables are compacted per partition directory so partition
pruning keeps working on the result.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def table_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet table path."""
    n = 0
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> tuple[int, int]:
    """Rewrite `path` into max(1, total_bytes // target_file_bytes) files
    (per partition when `partition_by` given).  Returns (files_before,
    files_after)."""
    before, total = table_file_stats(spark, path)
    n_files = max(1, total // target_file_bytes)

    df = spark.read.parquet(path)
    staging = path.rstrip("/") + ".__compact__"
    writer = df.coalesce(int(n_files)) if not partition_by else df.repartition(int(n_files), *partition_by)
    w = writer.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)

    backup = path.rstrip("/") + ".__old__"
    shutil.rmtree(backup, ignore_errors=True)
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup, ignore_errors=True)
    after, _ = table_file_stats(spark, path)
    return before, after
