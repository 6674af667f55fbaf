"""Scale utilities: bucketing for co-located joins, salting for skew.

These are the knobs SURVEY.md §4.3 and the 100 TB design points call for
when AQE alone isn't enough:

- **bucketing**: pre-shuffle the big fact tables once at write time so
  every subsequent equi-join/groupBy on the bucket key is exchange-free.
  The access/file star-schema tables join on access_id constantly — at
  100 TB that's the single biggest shuffle eliminated.
- **salting**: decompose a skewed aggregation into partial (key, salt)
  then final (key) phases; the hot key's rows spread over `salt_n`
  reducers instead of one straggler.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DECOMPOSABLE = {"sum", "count", "max", "min"}


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed parquet table.
    Joins/groupBys on `bucket_cols` between tables bucketed the same way
    run with NO Exchange (asserted in tests/test_scale.py)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def salted_groupby(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    salt_n: int = 16,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Two-phase skew-resistant aggregation.

    `aggs` is (func, col, alias) with func in {sum,count,max,min} — the
    decomposable set (partial and final combine with the same function,
    except count whose final combine is sum).  `salt_source` defaults to a
    hash of the whole row via xxhash64 of all non-key columns' first —
    pass an explicit high-cardinality column when available.
    """
    bad = [f for f, _, _ in aggs if f not in DECOMPOSABLE]
    if bad:
        raise ValueError(f"non-decomposable aggs for salting: {bad}")

    if salt_source is None:
        non_key = [c for c in df.columns if c not in keys]
        salt_source = F.xxhash64(*non_key[:3]) if non_key else F.spark_partition_id()
    elif isinstance(salt_source, str):
        salt_source = F.col(salt_source)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(salt_source), F.lit(salt_n)))

    partial = salted.groupBy(*keys, "_salt").agg(
        *[getattr(F, f)(c).alias(a) for f, c, a in aggs]
    )
    final_aggs = []
    for f, _, a in aggs:
        combine = "sum" if f in ("count", "sum") else f
        final_aggs.append(getattr(F, combine)(a).alias(a))
    out = partial.groupBy(*keys).agg(*final_aggs)
    # counts come back as sum(bigint) -> bigint already; keep schema stable
    return out


def colocated_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planner emits
    SortMergeJoin with zero Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key)
