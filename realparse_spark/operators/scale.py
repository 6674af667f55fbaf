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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join by salt-replication — the technique for a
    hot join key that AQE's skew-split cannot fix (AQE splits a skewed
    PARTITION, but a single key's rows still hash to one partition when
    the key itself owns the skew and the other side must be replicated to
    meet it).

    The fact side gets a uniform salt in [0, salt_n) from a full-row
    hash; the dim side is replicated salt_n× (one copy per salt value);
    the join runs on (key, salt), so the hot key's probe work spreads
    over salt_n tasks.  Cost: salt_n× the dim shuffle volume — use when
    the dim is too big to broadcast but cheap to replicate (the classic
    middle ground at 100 TB).  Result is EXACTLY the plain join: each
    fact row carries one salt and meets exactly one copy of its dim row.

    Fact-preserving modes only (inner/left/left_semi/left_anti): an
    unmatched DIM row exists salt_n times after replication, so
    right/full outer would emit salt_n null-extended duplicates —
    rejected explicitly rather than silently wrong."""
    fact_preserving = {"inner", "left", "leftouter", "left_outer",
                       "semi", "leftsemi", "left_semi",
                       "anti", "leftanti", "left_anti"}
    if how.lower() not in fact_preserving:
        raise ValueError(
            f"salted_join: how={how!r} is not fact-preserving; the "
            f"replicated dim side would duplicate unmatched rows "
            f"salt_n x (supported: {sorted(fact_preserving)})"
        )
    f = fact.withColumn(
        "_salt_l", F.pmod(F.xxhash64(*fact.columns), F.lit(salt_n))
    )
    d = dim.withColumn(
        "_salt_r",
        F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)).cast("array<bigint>")),
    )
    out = f.join(
        d, (f[fact_key] == d[dim_key]) & (f["_salt_l"] == d["_salt_r"]), how
    )
    return out.drop("_salt_l", "_salt_r")


def colocated_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planner emits
    SortMergeJoin with zero Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key)


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible form of the skew path: the two-phase salted
    aggregation must produce EXACTLY the plain groupBy's answer (same
    decimal sums, same extrema) — the oracle is the unsalted SQL.  The
    salt spreads each event_type's rows over 16 reducers in phase 1, so
    a key owning half the corpus becomes 16 partials instead of one
    straggler task; phase 2 combines |keys|·16 tiny rows."""
    from realparse_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "event_type",
        F.col("value").cast("decimal(18,4)").alias("v"),
        "event_id",
    )
    out = salted_groupby(
        e,
        ["event_type"],
        [("count", "v", "n_events"), ("sum", "v", "sum_v"),
         ("max", "v", "max_v"), ("min", "v", "min_v")],
        salt_n=16,
        salt_source="event_id",
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("sum_v").cast("double").alias("sum_value"),
        F.col("max_v").cast("double").alias("max_value"),
        F.col("min_v").cast("double").alias("min_value"),
    ).orderBy("event_type")


SALTED_AGG_SQL = """
SELECT event_type,
  count(CAST(value AS DECIMAL(18,4))) AS n_events,
  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
  CAST(max(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS max_value,
  CAST(min(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS min_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible form of the salt-replicated join: revenue per brand
    through `salted_join` must EXACTLY equal the plain-join answer — the
    oracle is the unsalted SQL.  The plan shape is the point: the fact's
    hot keys spread over 8 salt buckets while the part dim is replicated
    8×, bounding any task to 1/8 of a hot key's rows."""
    from realparse_spark.sources.tables import load_table

    from realparse_spark.operators.tpch_extra import _rev_dec
    from realparse_spark.sources.tables import load_table

    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(lineitem, part, "l_partkey", "p_partkey", salt_n=8)
    return (
        joined.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_rev_dec()).cast("double").alias("revenue"),
        )
        .orderBy("p_brand")
    )


SALTED_JOIN_SQL = """
SELECT p_brand,
  CAST(count(*) AS BIGINT) AS n_lines,
  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


QUERIES = {"salted_agg": q_salted_agg, "salted_join": q_salted_join}
ORACLES = {"salted_agg": SALTED_AGG_SQL, "salted_join": SALTED_JOIN_SQL}
