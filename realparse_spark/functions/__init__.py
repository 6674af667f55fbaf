from realparse_spark.functions.scalars import (
    duration_hms,
    epoch_seconds,
    format_datetime,
    parse_clf_timestamp,
    default_on_empty,
)

__all__ = [
    "duration_hms",
    "epoch_seconds",
    "format_datetime",
    "parse_clf_timestamp",
    "default_on_empty",
]
