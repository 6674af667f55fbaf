"""Key-based upsert (MERGE emulation) over parquet (SURVEY.md §2.8 note:
'idempotent foreachBatch MERGE' is the streaming-grade alternative to the
strictly-greater watermark).

Parquet has no transactional MERGE; the public pattern is read + combine +
swap.  On a real deployment this is one `MERGE INTO` on a table format
(Delta/Iceberg); the semantics implemented here are the same: latest-wins
per key, insert-or-replace.

Scale shape: the table is stored hash-BUCKETED on the merge keys
(`__bucket = pmod(xxhash64(keys), n_buckets)` as a hive partition dir).
A merge batch touches only the buckets its keys hash into, so the job
reads + rewrites O(batch) partitions, not O(table) — the property that
makes a streaming foreachBatch MERGE sustainable: at 100 TB a trigger
rewrites a few buckets, never restates the table.  Untouched bucket
directories are not opened, rewritten, or renamed (byte-identical,
asserted in tests/test_upsert.py).

Swap protocol: per touched bucket, rename old dir aside then staged dir
in.  A reader never sees a half-written MIX of old and new rows within a
bucket; the brief per-bucket absence window and the cross-bucket
non-atomicity are the documented trade-offs of staying dependency-free —
deployments needing lock-free concurrent readers use a transactional
table format.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from realparse_spark.fs import LOCAL, WarehouseFS

_BUCKET = "__bucket"
_META = "_upsert_meta.json"


def _bucket_expr(keys: list[str], n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast("int")


def _read_meta(path: str, fs: WarehouseFS) -> dict | None:
    p = os.path.join(path, _META)
    if fs.exists(p):
        return json.loads(fs.read_text(p))
    return None


def _write_meta(path: str, n_buckets: int, keys: list[str], fs: WarehouseFS) -> None:
    fs.write_text(os.path.join(path, _META), json.dumps({"n_buckets": n_buckets, "keys": keys}))


def upsert_parquet(
    spark: SparkSession,
    new_df: DataFrame,
    path: str,
    keys: list[str],
    order_col: str | None = None,
    n_buckets: int = 32,
    fs: WarehouseFS = LOCAL,
) -> int:
    """Insert-or-replace by `keys`; when both sides carry a key, the row
    with the greatest `order_col` wins (new side wins ties/absence).
    Returns the resulting row count.

    The stored layout is partitioned by a key-hash bucket; `n_buckets` is
    fixed at table creation (recorded in a sidecar — later calls use the
    recorded value, because re-bucketing would silently split a key across
    buckets and break the merge)."""
    meta = _read_meta(path, fs)
    if meta is not None:
        if meta["keys"] != keys:
            raise ValueError(f"table at {path} was bucketed on keys {meta['keys']}, got {keys}")
        n_buckets = int(meta["n_buckets"])

    data_cols = new_df.columns
    newb = new_df.withColumn(_BUCKET, _bucket_expr(keys, n_buckets))

    if meta is None and not fs.exists(path):
        newb.write.mode("overwrite").partitionBy(_BUCKET).parquet(path)
        _write_meta(path, n_buckets, keys, fs)
        return spark.read.parquet(path).count()

    # pre-bucketing table (no sidecar): one-time full-merge migration into
    # the bucketed layout — the O(table) cost is paid once, not per batch
    legacy = meta is None

    if legacy:
        touched = None
        existing = (
            spark.read.parquet(path)
            .select(*data_cols)
            .withColumn(_BUCKET, _bucket_expr(keys, n_buckets))
        )
    else:
        # buckets present in this batch: tiny distinct collect (<= n_buckets)
        touched = sorted(
            r[_BUCKET] for r in newb.select(_BUCKET).distinct().collect()
        )
        if not touched:
            return spark.read.parquet(path).count()
        existing = (
            spark.read.parquet(path)
            .filter(F.col(_BUCKET).isin(touched))  # partition pruning: O(batch) read
            .select(*data_cols, F.col(_BUCKET).cast("int").alias(_BUCKET))
        )
    tagged_new = newb.withColumn("_src", F.lit(1))
    tagged_old = existing.withColumn("_src", F.lit(0))
    unioned = tagged_new.unionByName(tagged_old)

    order = [F.col(order_col).desc()] if order_col else []
    w = Window.partitionBy(*keys).orderBy(*order, F.col("_src").desc())
    merged = (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )

    staging = path.rstrip("/") + ".__staging__"
    fs.rmtree(staging)
    merged.write.mode("overwrite").partitionBy(_BUCKET).parquet(staging)

    backup = path.rstrip("/") + ".__old__"
    fs.rmtree(backup)
    if legacy:
        # whole-directory swap into the new layout
        fs.rename(path, backup)
        fs.rename(staging, path)
        _write_meta(path, n_buckets, keys, fs)
    else:
        # swap ONLY the touched bucket dirs; untouched dirs stay byte-identical
        fs.makedirs(backup)
        for b in touched:
            src = os.path.join(staging, f"{_BUCKET}={b}")
            dst = os.path.join(path, f"{_BUCKET}={b}")
            if fs.exists(dst):
                fs.rename(dst, os.path.join(backup, f"{_BUCKET}={b}"))
            if fs.exists(src):  # merged always has the batch's rows
                fs.rename(src, dst)
        fs.rmtree(staging)
    fs.rmtree(backup)
    return spark.read.parquet(path).count()


class MergeBackend:
    """MERGE seam (SCALE.md §Maintenance): same contract as a table
    format's ``MERGE INTO`` — insert-or-replace by `keys`, greatest
    `order_col` wins, new side wins ties.  A Delta/Iceberg deployment
    implements this with one SQL statement; the default backend is the
    dependency-free bucketed-parquet implementation above."""

    def merge(
        self,
        spark: SparkSession,
        new_df: DataFrame,
        table: str,
        keys: list[str],
        order_col: str | None = None,
    ) -> int:
        raise NotImplementedError(
            f"{type(self).__name__} does not implement merge(); use the "
            "'parquet' backend (BucketedParquetMerge) or subclass "
            "MergeBackend over your table format's MERGE INTO"
        )


def merge_backend(name: str = "parquet", **kwargs) -> "MergeBackend":
    """Resolve a MERGE backend by name.

    Only the dependency-free ``parquet`` backend ships in this repo; a
    Delta/Iceberg deployment registers its own ``MergeBackend`` subclass
    (one ``MERGE INTO`` statement) and is deliberately not stubbed here —
    those runtimes aren't in this container.
    """
    if name == "parquet":
        return BucketedParquetMerge(**kwargs)
    raise NotImplementedError(
        f"merge backend {name!r} not implemented; use 'parquet' "
        "(BucketedParquetMerge) or provide a MergeBackend subclass "
        "backed by your table format's MERGE INTO"
    )


class BucketedParquetMerge(MergeBackend):
    def __init__(self, n_buckets: int = 32, fs: WarehouseFS = LOCAL) -> None:
        self.n_buckets = n_buckets
        self.fs = fs

    def merge(
        self,
        spark: SparkSession,
        new_df: DataFrame,
        table: str,
        keys: list[str],
        order_col: str | None = None,
    ) -> int:
        return upsert_parquet(
            spark, new_df, table, keys, order_col,
            n_buckets=self.n_buckets, fs=self.fs,
        )
