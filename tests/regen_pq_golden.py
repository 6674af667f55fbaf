"""Regenerate tests/golden/pq_golden.json (see tests/pq_golden.py).

Run ONLY after an intentional change to the PQ kernels or a fixture
regeneration: `python tests/regen_pq_golden.py`.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pq_golden import GOLDEN_PATH, fixture_sha, run_all  # noqa: E402


def main() -> None:
    from realparse_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("regen-pq-golden", shuffle_partitions=8)
    golden = {"sf_dir": sf_dir, "fixture_sha": fixture_sha(sf_dir), "results": run_all(spark, sf_dir)}
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as fh:
        json.dump(golden, fh, indent=1, sort_keys=True)
    print(f"wrote {GOLDEN_PATH} for fixture {golden['fixture_sha'][:12]}")


if __name__ == "__main__":
    main()
