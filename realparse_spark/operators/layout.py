"""Data layout for multi-dimensional data skipping: Z-order clustering.

The reference's only layout lever is "one table per log family"
(`real_parse.pl:96-118`); at 100 TB the dominant cost is how much of the
table a scan can SKIP.  Parquet keeps per-file/per-row-group min-max
stats, and Spark prunes files whose stats exclude the predicate — but
min-max pruning only works along the sort order.  A table sorted by
`ts` skips nothing for a `user_id` filter.  Z-ordering (interleaving
the bits of several normalized columns into one sort key — the
Morton curve) makes files compact in EVERY interleaved dimension at
once, so a 2-D box predicate touches O(few) files instead of all of
them.  This is the same technique Delta Lake's OPTIMIZE ZORDER BY and
ClickHouse/Databricks data-skipping layouts use.

Everything here is exact integer arithmetic in JVM expressions
(shiftleft / shiftright / bitwise &, |), so the key itself is oracled
bit-for-bit against DuckDB.  The clustering writer is
`repartitionByRange(z) + sortWithinPartitions(z)` — one range shuffle
at write time buys every future scan its pruning; the skip benefit is
gated in tests/test_layout.py by counting files actually touched by a
box predicate under a Z-ordered vs a time-ordered layout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _norm_expr(value: str, vmin: str, vmax: str, bits: int) -> Column:
    """Map a value into [0, 2^bits) by exact integer min-max scaling:
    (v - min) * (2^bits - 1) div (max - min).  All BIGINT — engine-exact.
    Degenerate range (max == min) maps everything to 0."""
    top = (1 << bits) - 1
    return F.when(F.expr(f"{vmax} = {vmin}"), F.lit(0).cast("bigint")).otherwise(
        F.expr(
            f"CAST(({value} - {vmin}) AS BIGINT) * {top} div CAST(({vmax} - {vmin}) AS BIGINT)"
        )
    )


def zorder_key(norm_cols: Sequence[Column | str], bits: int = 8) -> Column:
    """Interleave the low `bits` bits of the given ALREADY-NORMALIZED
    non-negative integer columns into one Morton key (column 0 owns the
    least-significant interleave slot).  Pure shift/mask/or expressions —
    whole-stage-codegen friendly, no UDF."""
    cols = [F.col(c) if isinstance(c, str) else c for c in norm_cols]
    n = len(cols)
    out = F.lit(0).cast("bigint")
    for bit in range(bits):
        for ci, c in enumerate(cols):
            # bit `bit` of column ci lands at interleaved position
            # bit * n + ci
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c.cast("bigint"), bit).bitwiseAND(F.lit(1)),
                    bit * n + ci,
                )
            )
    return out


def cluster_by_zorder(
    df: DataFrame, z: Column, n_files: int
) -> DataFrame:
    """Shape a DataFrame for a Z-clustered write: range-partition on the
    Morton key (each output file owns a contiguous Z range — i.e. a
    compact region of the multi-dim space) and sort within partitions so
    row-group stats are tight too.  One shuffle at write time."""
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def zorder_shape(
    df: DataFrame, cols: Sequence[str], bits: int = 8, n_files: int = 16
) -> DataFrame:
    """End-to-end Z-shaping of arbitrary numeric columns: compute the
    min/max extrema in one pass (1-row broadcast), normalize each column
    to [0, 2^bits) by exact integer scaling, interleave into the Morton
    key, range-partition + sort.  Layout only — row VALUES are untouched,
    so results of any query over the output are identical; only file
    locality changes.  Doubles are binned via truncating integer casts:
    fine for clustering (stats tightness), irrelevant for correctness."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("bigint")).alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c).cast("bigint")).alias(f"_max_{c}"))
    ext = df.agg(*aggs)
    widened = df.crossJoin(F.broadcast(ext))
    norm = [
        _norm_expr(f"CAST({c} AS BIGINT)", f"_min_{c}", f"_max_{c}", bits)
        for c in cols
    ]
    z = zorder_key(norm, bits=bits)
    helper = [f"_min_{c}" for c in cols] + [f"_max_{c}" for c in cols]
    return cluster_by_zorder(widened, z, n_files=n_files).drop(*helper)


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible form of the Morton key arithmetic: normalize
    (user_id, value) of the events table to 8 bits each by exact
    integer min-max scaling (1-row broadcast extrema), interleave, and
    return the first 100 events in Z order.  The oracle recomputes the
    identical bit arithmetic in SQL, so the key must hash-match."""
    from realparse_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("user_id").cast("bigint").alias("u"),
        # value is a double metric: fix the grid by flooring to integer
        # cents so both engines normalize the same exact integers
        F.floor(F.col("value") * 100).cast("bigint").alias("v"),
    )
    ext = ev.agg(
        F.min("u").alias("umin"),
        F.max("u").alias("umax"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    )
    normed = ev.crossJoin(F.broadcast(ext)).select(
        "event_id",
        _norm_expr("u", "umin", "umax", 8).alias("nu"),
        _norm_expr("v", "vmin", "vmax", 8).alias("nv"),
    )
    return (
        normed.select(
            F.col("event_id").cast("bigint").alias("event_id"),
            "nu",
            "nv",
            zorder_key(["nu", "nv"], bits=8).alias("z"),
        )
        .orderBy("z", "event_id")
        .limit(100)
    )


def _zorder_sql(bits: int = 8) -> str:
    terms = []
    for bit in range(bits):
        terms.append(f"(((nu >> {bit}) & 1) << {bit * 2})")
        terms.append(f"(((nv >> {bit}) & 1) << {bit * 2 + 1})")
    interleave = " | ".join(terms)
    top = (1 << bits) - 1
    return f"""
WITH ev AS (
  SELECT event_id, CAST(user_id AS BIGINT) AS u,
    CAST(floor(value * 100) AS BIGINT) AS v
  FROM events
),
ext AS (
  SELECT min(u) AS umin, max(u) AS umax, min(v) AS vmin, max(v) AS vmax FROM ev
),
normed AS (
  SELECT event_id,
    CASE WHEN umax = umin THEN 0
         ELSE CAST((u - umin) AS BIGINT) * {top} // CAST((umax - umin) AS BIGINT)
    END AS nu,
    CASE WHEN vmax = vmin THEN 0
         ELSE CAST((v - vmin) AS BIGINT) * {top} // CAST((vmax - vmin) AS BIGINT)
    END AS nv
  FROM ev, ext
)
SELECT CAST(event_id AS BIGINT) AS event_id, nu, nv,
  CAST({interleave} AS BIGINT) AS z
FROM normed
ORDER BY z, event_id
LIMIT 100
"""


QUERIES = {"zorder_key": q_zorder_key}
ORACLES = {"zorder_key": _zorder_sql(8)}
