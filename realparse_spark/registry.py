"""Central query/oracle registry.

Each operator module exposes ``QUERIES`` (name -> callable(spark, sf_dir) ->
DataFrame) and ``ORACLES`` (name -> DuckDB SQL with identical column
aliases).  Names missing from ORACLES get the driver's weaker rows-only
check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = (
    "realparse_spark.operators.report",
    "realparse_spark.operators.parse_queries",
    "realparse_spark.operators.log_report",
    "realparse_spark.operators.load_query",
    "realparse_spark.operators.text",
    "realparse_spark.operators.dedup",
    "realparse_spark.operators.similarity",
    "realparse_spark.operators.multimodal",
    "realparse_spark.operators.pipeline_ops",
    "realparse_spark.operators.advanced",
    "realparse_spark.operators.privacy",
)


def _load():
    import importlib

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        for name, fn in getattr(mod, "QUERIES", {}).items():
            assert name not in queries, f"duplicate query name: {name}"
            queries[name] = fn
        for name, sql in getattr(mod, "ORACLES", {}).items():
            oracles[name] = sql
    return queries, oracles


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _load()[0]


def all_oracles() -> dict[str, str]:
    return _load()[1]
