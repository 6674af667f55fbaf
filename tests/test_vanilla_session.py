"""Regression guard: every driver query must run on a DEFAULT SparkSession
(ANSI on, no custom configs) — the environment the verification driver
actually uses.  Runs in a subprocess because session configs are sticky
per JVM."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]").appName("vanilla-gate")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
assert e.entry(spark).count() > 0
q = e.queries()
failures = []
for name in sorted(q):
    try:
        q[name](spark, "/root/testdata/sf0.001").count()
    except Exception as ex:
        failures.append((name, str(ex).splitlines()[0][:120]))
assert not failures, failures
print("VANILLA_OK", len(q))
"""


def test_all_queries_on_default_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=540,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "VANILLA_OK" in proc.stdout
