"""Tri-scale oracle sweep: every oracled query vs DuckDB at sf0.001,
sf0.01 AND sf0.1 (the driver's gate runs only sf0.01; size-dependent
bugs — phantom batches, rank overflows, cap cliffs — surface at the
other scales).  Run: python tests/tri_scale_sweep.py [sf_dir ...]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import duckdb

    from realparse_spark.registry import all_oracles, all_queries
    from realparse_spark.session import get_spark
    from tests.oracle_harness import compare_query

    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("tri-scale-sweep")
    queries, oracles = all_queries(), all_oracles()
    failures: list[tuple[str, str, str]] = []
    t0 = time.time()
    for sf_dir in sf_dirs:
        con = duckdb.connect()
        n_ok = 0
        for name, sql in oracles.items():
            try:
                ok, detail = compare_query(spark, con, queries[name], sql, sf_dir)
            except Exception as ex:  # noqa: BLE001 — a crash is a failure too
                ok, detail = False, f"raised: {repr(ex)[:120]}"
            if ok:
                n_ok += 1
            else:
                failures.append((sf_dir, name, detail))
                print(f"FAIL {sf_dir} {name}: {detail}", flush=True)
        con.close()
        print(f"{sf_dir}: {n_ok}/{len(oracles)} ok", flush=True)
    print(f"total {time.time() - t0:.0f}s, {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
