"""Log-directory sources (SURVEY.md §2.1 S1-S5).

The reference enumerates a log directory, filters names, sorts, and keeps
the two most recent rotated files (real_parse.pl:208-216,28;
web_parse.pl:161-169,27), plus an mtime-based "today's file" pick
(open_log.pl:22-28) and a config-file scalar read (real_parse.pl:218-235).

Spark shape: `spark.read.text` with `pathGlobFilter`; file pruning happens
at planning time (an explicit path list or a `_metadata` filter), so at
100 TB the cluster never opens files outside the incremental window.
"""

from __future__ import annotations

import os
import re
from datetime import date, datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _natural_key(name: str) -> tuple:
    """Split digit runs out so 'log.10' sorts after 'log.9' (plain
    lexicographic order would misorder numeric rotation suffixes)."""
    return tuple(
        int(part) if part.isdigit() else part
        for part in re.split(r"(\d+)", name)
    )


def list_log_files(log_dir: str, prefix: str) -> list[str]:
    """S1 — enumerate + name-filter + sort (real_parse.pl:208-216: drop
    dotfiles, keep `rmaccess*`).  Natural sort: timestamp suffixes behave
    as in the reference; numeric suffixes ('log.9' < 'log.10') order
    correctly too."""
    names = [
        n
        for n in os.listdir(log_dir)
        if not n.startswith(".") and n.startswith(prefix)
    ]
    return [os.path.join(log_dir, n) for n in sorted(names, key=_natural_key)]


def latest_files(log_dir: str, prefix: str, n: int = 2) -> list[str]:
    """S2 — latest-N rotated files (real_parse.pl:28 keeps the last two of
    the name-sorted list)."""
    return list_log_files(log_dir, prefix)[-n:]


def read_log_lines(
    spark: SparkSession,
    log_dir: str,
    prefix: str,
    latest: int | None = 2,
) -> DataFrame:
    """S4 — line-oriented text scan over the pruned file set.  One row per
    line, plus the source file (`input_file_name` equivalent via
    `_metadata.file_path`) for provenance/keying."""
    if latest is not None:
        paths = latest_files(log_dir, prefix, latest)
        if not paths:
            return spark.createDataFrame([], "value string, source_file string")
        df = spark.read.text(paths)
    else:
        df = spark.read.format("text").option("pathGlobFilter", f"{prefix}*").load(log_dir)
    return df.select("value", F.col("_metadata.file_path").alias("source_file"))


def todays_file(spark: SparkSession, log_dir: str, prefix: str, today: date | None = None) -> list[str]:
    """S3 — pick files whose mtime date == today (open_log.pl:22-28).
    Uses the hidden `_metadata.file_modification_time` column so the check
    runs inside the scan, not with driver-side stat() calls per file."""
    today = today or date.today()
    df = (
        spark.read.format("text")
        .option("pathGlobFilter", f"{prefix}*")
        .load(log_dir)
        .select(
            F.col("_metadata.file_path").alias("p"),
            F.to_date(F.col("_metadata.file_modification_time")).alias("d"),
        )
        .filter(F.col("d") == F.lit(today))
        .select("p")
        .distinct()
    )
    return [r.p for r in df.collect()]


_CONFIG_STYLE_RE = re.compile(r'LoggingStyle="([1-5])"')
_CONFIG_MASK_RE = re.compile(r'StatsMask="([1-7])"')


def read_server_config(config_path: str) -> tuple[int | None, int | None]:
    """S5 — rmserver.cfg scalar extraction (real_parse.pl:218-235):
    LoggingStyle in 1-5, StatsMask in 1-7.  Driver-side by design — two
    scalars broadcast into the plan; no reason to spin up a distributed
    scan for a 1 KB config file."""
    style = mask = None
    with open(config_path, encoding="utf-8", errors="replace") as fh:
        for line in fh:
            m = _CONFIG_STYLE_RE.search(line)
            if m:
                style = int(m.group(1))
            m = _CONFIG_MASK_RE.search(line)
            if m:
                mask = int(m.group(1))
    return style, mask
