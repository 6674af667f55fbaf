"""SparkSession factory tuned for the test/bench environment.

Local mode is a single JVM; the settings below are chosen so the same code
is cluster-ready: AQE for runtime re-planning (skew joins, partition
coalescing), explicit shuffle-partition sizing, UTC session timezone so
timestamp semantics match the DuckDB oracle, and Arrow enabled for the few
Pandas-UDF paths (multimodal stubs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "realparse_spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    AQE is on: at 100 TB it re-plans skewed shuffle joins and coalesces
    small post-shuffle partitions; at test scale it keeps task counts sane.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sp = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # scan metadata (PushedFilters/Location) is truncated at 100 chars by
        # default, which hides late-list filters from the plan-quality gates
        .config("spark.sql.maxMetadataStringLength", "1000")
        # events.parquet stores TIMESTAMP(NANOS) which the vectorized reader
        # rejects; read as long and convert in the source layer.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Permissive expression semantics: a malformed log line yields NULL
        # fields instead of aborting the job — required for multi-TB log
        # ingestion where single bad lines are a certainty.
        .config("spark.sql.ansi.enabled", "false")
        # managed (bucketed) tables land outside the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/realparse-warehouse"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
