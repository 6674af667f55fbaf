"""Replica of the driver's DuckDB differential check: run the Spark query
and the oracle SQL on the same parquet tables, compare row count, sorted
column names, and order-insensitive values."""

from __future__ import annotations

import math
from datetime import datetime

import duckdb

from realparse_spark.sources.tables import TABLE_NAMES


def register_duck_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonical float repr; exact-match policy (we engineer queries so
        # both engines produce bit-identical doubles)
        return repr(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return str(v.normalize())
    except ImportError:
        pass
    return repr(v)


def canonicalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


_TYPE_MAP = {
    "int": "INTEGER",
    "bigint": "BIGINT",
    "double": "DOUBLE",
    "string": "VARCHAR",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "boolean": "BOOLEAN",
    "date": "DATE",
}


def compare_query(spark, con, query_fn, sql: str, sf_dir: str):
    """Return (ok, detail) comparing Spark result vs DuckDB oracle."""
    sdf = query_fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    register_duck_views(con, sf_dir)
    rel = con.sql(sql)
    duck_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    type_diffs = [
        f"{c}: spark={st} duck={duck_types.get(c)}"
        for c, st in sdf.dtypes
        if _TYPE_MAP.get(st, st.upper()) != duck_types.get(c)
    ]
    if type_diffs:
        return False, f"type mismatch: {type_diffs}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    a = canonicalize(spark_cols, spark_rows)
    b = canonicalize(duck_cols, duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(spark_rows)} rows)"
