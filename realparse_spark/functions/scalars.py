"""Scalar column-expression builders (SURVEY.md §2.7 C1-C13).

All of these are built-in-function compositions — they stay inside
whole-stage codegen (no Python UDFs), which is what makes the parse
pipeline viable at 100 TB.

Reference provenance is cited per function (file:line in /root/reference).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Log timestamp grammar 'DD/Mon/YYYY:HH:MM:SS' (real_parse.pl:243-244,
# web_parse.pl:176-177: Date::Manip ParseDate on the bracket-0 token).
CLF_TS_FORMAT = "dd/MMM/yyyy:HH:mm:ss"


def parse_clf_timestamp(col: Column | str) -> Column:
    """C1 — parse common-log-format timestamp to TimestampType.

    Reference: real_parse.pl:243-244 (`ParseDate` on 'DD/Mon/YYYY:HH:MM:SS').
    try_to_timestamp: malformed input -> NULL (quarantine path) under ANY
    session, instead of aborting an ANSI-mode job.
    """
    return F.try_to_timestamp(col, F.lit(CLF_TS_FORMAT))


def epoch_seconds(ts: Column | str) -> Column:
    """C2/C5 — timestamp -> epoch seconds (real_parse.pl:244 `%s`,
    MySQL UNIX_TIMESTAMP at real_parse.pl:47)."""
    return F.unix_timestamp(ts)


def format_datetime(ts: Column | str) -> Column:
    """C3 — 'YYYY-MM-DD HH:MM:SS' display form (real_parse.pl:245)."""
    return F.date_format(ts, "yyyy-MM-dd HH:mm:ss")


def duration_hms(seconds: Column) -> Column:
    """C11 — seconds -> 'H:MM:SS' when >= 1 hour else 'M:SS'.

    Reference: pull_report.pl:178-187 (`formatTime`).  Integer arithmetic
    mirrors the Perl int() division; NULL seconds stays NULL (caller applies
    the F12 'N/A' coalesce).
    """
    s = seconds.cast("long")
    # format_string stringifies NULL args as 'null'; a NULL duration must
    # stay NULL for the F12 coalesce to work.
    return F.when(s.isNull(), F.lit(None).cast("string")).when(
        s >= 3600,
        F.format_string(
            "%d:%02d:%02d",
            (s / 3600).cast("long"),
            ((s % 3600) / 60).cast("long"),
            s % 60,
        ),
    ).otherwise(
        F.format_string("%d:%02d", (s / 60).cast("long"), s % 60)
    )


def default_on_empty(col: Column, default: str = "UNKNOWN") -> Column:
    """C12 — empty-string -> default (real_parse.pl:300,317
    `$audio_format ||= 'UNKNOWN'`); also maps NULL -> default."""
    return F.when((col.isNull()) | (col == ""), F.lit(default)).otherwise(col)
