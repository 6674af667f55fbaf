"""JDBC source/sink (SURVEY.md §2.1 S6/S7 in their original form).

The reference reads/writes MySQL via DBI (real_parse.pl:39, per-row
INSERTs at :96-177).  The Spark equivalents below are thin, but the
semantics they fix matter:

- reads push a WHERE clause + column list down to the database and
  parallelize with `partitionColumn` bounds — never a single-connection
  full-table pull;
- writes are batched appends (`batchsize`), replacing the reference's 6-9
  round-trips per log line with one bulk insert per partition.

Exercised two ways in tests/test_jdbc.py: option-plumbing recorder tests
(the exact map handed to the public `spark.read/write.format('jdbc')`
API), and a LIVE round-trip against the Apache Derby engine embedded in
Spark's own classpath — create + batched append + partitioned parallel
read-back against a real database.  A production MySQL deployment differs
only in URL + driver jar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
    **options: str,
) -> DataFrameReader:
    """Configured JDBC reader; caller finishes with .load().

    With `partition_column` bounds, Spark issues `num_partitions` range
    queries in parallel; predicates and column pruning push into the DB.
    """
    if partition_column is not None and (lower_bound is None or upper_bound is None):
        raise ValueError(
            "partition_column requires both lower_bound and upper_bound "
            "(Spark would otherwise receive the literal option value 'None')"
        )
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        r = r.option(k, v)
    return r


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    *,
    batch_size: int = 10_000,
    **options: str,
) -> None:
    """Batched append — the S7 sink: one prepared statement per partition,
    `batch_size` rows per round-trip (vs the reference's 1)."""
    w = (
        df.write.format("jdbc")
        .mode("append")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    for k, v in options.items():
        w = w.option(k, v)
    w.save()
