"""Tri-scale DuckDB-oracle parity check for a subset of queries.

Usage: python tools/qcheck.py <query> [<query> ...] [--sf d1,d2,...]

Same comparator as tests/tri_scale_sweep.py, restricted to the named
queries — the fast equivalence proof to run after touching an operator.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import duckdb

    from realparse_spark.registry import all_oracles, all_queries
    from realparse_spark.session import get_spark
    from tests.oracle_harness import compare_query

    args = sys.argv[1:]
    sf_dirs = [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    if "--sf" in args:
        i = args.index("--sf")
        sf_dirs = args[i + 1].split(",")
        args = args[:i] + args[i + 2:]
    names = args

    spark = get_spark("qcheck")
    queries, oracles = all_queries(), all_oracles()
    failures = 0
    t0 = time.time()
    for sf_dir in sf_dirs:
        con = duckdb.connect()
        for name in names:
            if name not in oracles:
                print(f"SKIP {name}: rows-only (no oracle)")
                continue
            try:
                ok, detail = compare_query(
                    spark, con, queries[name], oracles[name], sf_dir
                )
            except Exception as ex:  # noqa: BLE001
                ok, detail = False, f"raised: {repr(ex)[:160]}"
            print(f"{'ok  ' if ok else 'FAIL'} {sf_dir} {name}"
                  + ("" if ok else f": {detail}"), flush=True)
            failures += 0 if ok else 1
        con.close()
    print(f"total {time.time() - t0:.0f}s, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
