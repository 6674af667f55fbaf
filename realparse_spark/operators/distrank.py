"""Distributed global rank — the two-phase pattern, shared.

A bare ``row_number().over(Window.orderBy(...))`` funnels the ENTIRE
input through one task (Spark warns ``WindowExec: No Partition
Defined``): fine for a 20-row aggregate, a driver-adjacent bottleneck for
anything corpus-shaped (a shingle vocabulary grows near-linearly with
corpus size — billions of rows at 100 TB).  The distributed equivalent:

1. ``repartitionByRange`` on the total-order key — each executor gets a
   contiguous range slice (boundaries from sampling);
2. per-partition ``row_number`` — O(rows/partitions) window state;
3. broadcast prefix-offset join — partition i adds the row count of
   partitions 0..i-1.  The prefix sum over the O(n_ranges) counts table
   is an explode-to-successors + groupBy (each partition's count is
   emitted once per later partition, O(n_ranges²) tiny rows) rather
   than an unpartitioned window, so the helper contributes ZERO
   single-partition plan nodes — the blanket plan gate can assert the
   invariant with no allowlist entry.

Range-boundary sampling differs run to run, but the result is the
position in a total order, so the output is deterministic as long as the
order keys are UNIQUE (per partition group) — callers must guarantee
that (e.g. by appending a tie-breaker key).

Extracted from the identical inline patterns in ``linkage.py``
(sorted-neighborhood rank) and ``pipeline_ops.py`` (epoch shuffle), and
the fix for the round-6 scale finding: ``dedup._build_prefix_index``
ranked the whole n-gram vocabulary through a single-partition window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_distributed(
    df: DataFrame,
    order_cols: Sequence[str],
    *,
    rank_col: str = "rn",
    partition_cols: Sequence[str] = (),
    n_ranges: int | None = None,
) -> DataFrame:
    """1-based global ``row_number`` over ``order_cols`` (per
    ``partition_cols`` group if given), computed without ever moving the
    input to a single partition.  All other columns pass through.

    ``order_cols`` must be unique within each partition group — the rank
    is otherwise nondeterministic across runs (range cuts move).

    ``n_ranges`` defaults to ``spark.sql.shuffle.partitions`` so rank
    parallelism scales with the cluster instead of pinning a constant (a
    fixed 32 would itself recreate a milder form of the bottleneck this
    helper removes); pass an explicit value only to pin a layout (e.g.
    epoch_shuffle's reproducible 16-range manifest).
    """
    if n_ranges is None:
        n_ranges = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    cols = [*partition_cols, *order_cols]
    ranged = df.repartitionByRange(n_ranges, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    local_w = Window.partitionBy("_pid", *partition_cols).orderBy(*order_cols)
    # ONE materialization shared by the offsets and the rank join: two
    # branches each re-deriving `ranged` would sample range boundaries
    # independently (RangePartitioner seeds per RDD id), making _pid mean
    # different things in the two branches and shifting ranks past the
    # row count (observed as a phantom extra batch in epoch_shuffle's
    # tri-scale sweep before the lineage cut was added).
    local = ranged.withColumn("_lrn", F.row_number().over(local_w)).localCheckpoint(
        eager=False
    )
    counts = local.groupBy("_pid", *partition_cols).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    # prefix sum by scatter: partition i's count lands on every later
    # partition i+1..n_ranges-1 (guard: Spark's sequence(start, stop)
    # COUNTS DOWN when start > stop, so an empty successor set must be
    # NULL, which explode drops)
    succ = F.when(
        F.col("_pid") < n_ranges - 1,
        F.sequence(F.col("_pid") + 1, F.lit(n_ranges - 1)),
    )
    offsets = (
        counts.select(*partition_cols, F.explode(succ).alias("_tgt"), "_cnt")
        .groupBy(F.col("_tgt").alias("_pid"), *partition_cols)
        .agg(F.sum("_cnt").alias("_off"))
    )
    return (
        local.join(F.broadcast(offsets), ["_pid", *partition_cols], "left")
        .withColumn(rank_col, F.col("_lrn") + F.coalesce(F.col("_off"), F.lit(0)))
        .drop("_pid", "_lrn", "_off")
    )
