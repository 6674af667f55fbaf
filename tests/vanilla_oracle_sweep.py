"""Full oracle sweep under a DEFAULT (ANSI-on, no custom configs)
SparkSession — the verification driver's exact environment.  The repo
session's sweep (tri_scale_sweep.py) cannot catch an engine split that
only appears under the driver's session settings (the round-8
clamped_balance lesson); this one can.  Run as a script (too slow for
the per-session pytest suite; the rows-only vanilla gate in
test_vanilla_session.py stays the fast check):

    python tests/vanilla_oracle_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from realparse_spark.registry import all_oracles, all_queries
    from tests.oracle_harness import compare_query

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("vanilla-oracle-sweep")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = all_queries(), all_oracles()
    con = duckdb.connect()
    t0 = time.time()
    failures: list[tuple[str, str]] = []
    n_ok = 0
    for name, sql in oracles.items():
        try:
            ok, detail = compare_query(spark, con, queries[name], sql, sf_dir)
        except Exception as ex:  # noqa: BLE001 — a crash is a failure too
            ok, detail = False, f"raised: {repr(ex)[:120]}"
        if ok:
            n_ok += 1
        else:
            failures.append((name, detail))
            print(f"FAIL {name}: {detail}", flush=True)
    print(f"{sf_dir}: {n_ok}/{len(oracles)} ok under vanilla ANSI session")
    print(f"total {round(time.time() - t0)}s, {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
