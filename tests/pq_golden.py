"""Shared helpers for the PQ determinism/pinning gates (round-7 verdict
task 4): `emb_pq`, `sim_ann_pq` and `sim_ann_ivf_pq` are the only
components whose outputs no oracle or exact-parity test pins, so their
driver-query results are snapshotted into `tests/golden/pq_golden.json`,
keyed by a content hash of the fixture.  A silent kernel change (numpy
argmin ties, k-means seeding, LUT arithmetic) shifts the snapshot and
fails the gate; a regenerated fixture changes the key and the gate says
so instead of false-failing.

Regenerate after an INTENTIONAL change with:
    python tests/regen_pq_golden.py
"""

from __future__ import annotations

import hashlib
import json
import os

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "pq_golden.json")
PQ_QUERY_NAMES = ("emb_pq", "sim_ann_pq", "sim_ann_ivf_pq")


def fixture_sha(sf_dir: str) -> str:
    h = hashlib.sha256()
    with open(os.path.join(sf_dir, "embeddings.parquet"), "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def rows_canonical(df) -> list[list]:
    """Sorted, JSON-stable form of a driver-query result (all three PQ
    queries emit only ints/floats already rounded in-plan)."""
    cols = sorted(df.columns)
    out = [[row[c] for c in cols] for row in df.select(*cols).collect()]
    out.sort(key=lambda r: json.dumps(r))
    return out


def run_all(spark, sf_dir: str) -> dict[str, list[list]]:
    from realparse_spark.registry import all_queries

    qs = all_queries()
    return {name: rows_canonical(qs[name](spark, sf_dir)) for name in PQ_QUERY_NAMES}
