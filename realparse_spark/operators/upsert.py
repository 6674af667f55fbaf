"""Key-based upsert (MERGE emulation) over parquet (SURVEY.md §2.8 note:
'idempotent foreachBatch MERGE' is the streaming-grade alternative to the
strictly-greater watermark).

Parquet has no transactional MERGE; the public pattern is read + combine +
atomic directory swap.  On a real deployment this is one `MERGE INTO` on a
table format (Delta/Iceberg); the semantics implemented here are the same:
latest-wins per key, insert-or-replace.

The swap is two renames (path -> .__old__, .__staging__ -> path): a reader
never sees a half-written MIX of old and new rows, but there is a brief
window between the renames where the path is absent (a concurrent read
errors cleanly rather than returning wrong data), and a crash inside the
window leaves the data recoverable under `.__old__`.  Deployments that
need lock-free concurrent readers use a transactional table format; this
module keeps the engine dependency-free.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window


def upsert_parquet(
    spark: SparkSession,
    new_df: DataFrame,
    path: str,
    keys: list[str],
    order_col: str | None = None,
) -> int:
    """Insert-or-replace by `keys`; when both sides carry a key, the row
    with the greatest `order_col` wins (new side wins ties/absence).
    Returns the resulting row count."""
    try:
        existing = spark.read.parquet(path)
        has_existing = True
    except Exception:
        existing = None
        has_existing = False

    if not has_existing:
        new_df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path).count()

    tagged_new = new_df.withColumn("_src", F.lit(1))
    tagged_old = existing.select(*new_df.columns).withColumn("_src", F.lit(0))
    unioned = tagged_new.unionByName(tagged_old)

    order = [F.col(order_col).desc()] if order_col else []
    w = Window.partitionBy(*keys).orderBy(*order, F.col("_src").desc())
    merged = (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )

    staging = path.rstrip("/") + ".__staging__"
    merged.write.mode("overwrite").parquet(staging)
    n = spark.read.parquet(staging).count()
    backup = path.rstrip("/") + ".__old__"
    shutil.rmtree(backup, ignore_errors=True)
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup, ignore_errors=True)
    return n
