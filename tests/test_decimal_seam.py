"""Driver-hasher decimal-seam audit (round-9, verdict task 5).

The r8 `clamped_balance` episode: rows/schema green, hash red, while the
repo replica was bit-identical at every scale.  The suspect class is any
query whose DECIMAL output column is produced by widening arithmetic —
Spark and DuckDB assign different precisions to intermediate sums and
differences, and a hasher that folds `str()` / `repr()` /
`Decimal.normalize()` differently than our replica can split the engines
even when the VALUES agree under our normalization.

This audit closes the class, not the instance:

1. Enumerate every oracled query whose Spark output schema (lazy
   analysis — no execution) contains a DecimalType column.
2. For each, run BOTH engines at sf0.001 and require the decimal
   columns to agree on the RAW ``str()`` form — scale, trailing zeros,
   exponent notation and all — which is strictly stronger than the
   harness's ``normalize()`` comparison.  If the raw forms match, no
   value-level normalization choice can split the engines.
3. Require the declared widths to match: Spark `decimal(p,s)` ==
   DuckDB `DECIMAL(p,s)` per column.  A width produced by widening
   arithmetic instead of an explicit terminal cast shows up here the
   moment either engine changes its inference rule.
"""

from __future__ import annotations

from collections import Counter
from decimal import Decimal

import duckdb
import pytest
from pyspark.sql.types import DecimalType

import __spark_entry__ as entry
from tests.oracle_harness import register_duck_views

SF_DIR = "/root/testdata/sf0.001"


def _decimal_queries(spark, con):
    """Names -> (df, [decimal column names]).

    Candidates come from the DUCKDB relation types first — pure plan
    analysis, no execution on either engine — because merely CONSTRUCTING
    some Spark queries executes work (the stream_*_e2e builders run full
    streaming lifecycles at DataFrame-build time); only the candidates
    then pay a Spark build.  A query where Spark outputs DECIMAL but
    DuckDB doesn't is a type mismatch test_oracle_parity already fails,
    so filtering on the DuckDB side loses nothing."""
    out = {}
    q, o = entry.queries(), entry.oracle_sql()
    for name in sorted(o):
        duck_types = [str(t) for t in con.sql(o[name]).types]
        if not any(t.startswith("DECIMAL") for t in duck_types):
            continue
        df = q[name](spark, SF_DIR)
        cols = [f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)]
        if cols:
            out[name] = (df, cols)
    return out

def test_decimal_outputs_raw_identical_across_engines(spark):
    con = duckdb.connect()
    register_duck_views(con, SF_DIR)
    targets = _decimal_queries(spark, con)
    assert targets, "expected at least one decimal-output query"
    oracles = entry.oracle_sql()
    failures = []
    for name, (df, dec_cols) in targets.items():
        rel = con.sql(oracles[name])
        duck_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
        # (3) declared width parity — catches widening-arithmetic widths
        spark_types = dict(df.dtypes)
        for c in dec_cols:
            if spark_types[c].upper() != duck_types.get(c, "").upper():
                failures.append(
                    f"{name}.{c}: width spark={spark_types[c]} duck={duck_types.get(c)}"
                )
        # (2) raw string-form parity, order-insensitive per column
        srows = df.select(*dec_cols).collect()
        drows = con.execute(
            f"SELECT {', '.join(dec_cols)} FROM ({oracles[name]})"
        ).fetchall()
        for i, c in enumerate(dec_cols):
            sv = Counter(str(r[i]) for r in srows)
            dv = Counter(
                str(r[i]) if isinstance(r[i], Decimal) else f"NONDECIMAL:{r[i]!r}"
                for r in drows
            )
            if sv != dv:
                diff = list((sv - dv).items())[:3] + list((dv - sv).items())[:3]
                failures.append(f"{name}.{c}: raw-form mismatch {diff}")
    assert not failures, "\n".join(failures)


def test_decimal_seam_detects_width_split(spark):
    """Negative control: the audit must actually fire on a width split."""
    con = duckdb.connect()
    register_duck_views(con, SF_DIR)
    rel = con.sql("SELECT CAST(1 AS DECIMAL(20,4)) AS x")
    duck_t = str(rel.types[0])
    sdf = spark.sql("SELECT CAST(1 AS DECIMAL(18,4)) AS x")
    spark_t = dict(sdf.dtypes)["x"]
    assert spark_t.upper() != duck_t.upper()


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
