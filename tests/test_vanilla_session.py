"""Regression guard: every driver query must run on a DEFAULT SparkSession
(ANSI on, no custom configs) — the environment the verification driver
actually uses.  Runs in a subprocess because session configs are sticky
per JVM."""

from __future__ import annotations

import subprocess
import sys

from tests.vanilla_gate import SCRIPT  # noqa: F401 — also used by the conftest early-launch hook


def test_all_queries_on_default_session(vanilla_gate_proc):
    # the subprocess was launched at COLLECTION time (conftest hook) so its
    # ~2 min JVM overlaps the whole suite (guide §2.6 writ large); this
    # test only joins it.  The timeout bounds any remaining wall; the hook
    # also covers the run-this-file-alone case (it fires whenever this
    # test is collected).
    proc = vanilla_gate_proc["proc"]
    proc.wait(timeout=900)
    for fh in (vanilla_gate_proc["out"], vanilla_gate_proc["err"]):
        fh.flush()
        fh.seek(0)
    out = vanilla_gate_proc["out"].read()
    err = vanilla_gate_proc["err"].read()
    assert proc.returncode == 0, err[-3000:]
    assert "VANILLA_OK" in out


# The r8 driver hash-mismatch on clamped_balance could never be reproduced
# by the repo-session replica, so this pin runs the FULL oracle comparison
# under a default (ANSI-on) session — the driver's exact environment — at
# all three scales.  The query is now all-BIGINT micro-units with one
# terminal DECIMAL(18,4) cast (analytics.py), so any future engine split
# would be a real value difference, which this catches.
CLAMPED_SCRIPT = r"""
import sys
sys.path.insert(0, "tests")
import duckdb
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]").appName("vanilla-clamped")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from oracle_harness import compare_query
from realparse_spark.operators.analytics import q_clamped_balance, CLAMPED_BALANCE_SQL
con = duckdb.connect()
for sf in ("0.001", "0.01", "0.1"):
    ok, detail = compare_query(
        spark, con, q_clamped_balance, CLAMPED_BALANCE_SQL, f"/root/testdata/sf{sf}")
    assert ok, f"sf{sf}: {detail}"
print("CLAMPED_VANILLA_OK")
"""


def test_clamped_balance_vanilla_tri_scale_parity():
    proc = subprocess.run(
        [sys.executable, "-c", CLAMPED_SCRIPT],
        capture_output=True,
        text=True,
        timeout=540,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "CLAMPED_VANILLA_OK" in proc.stdout
