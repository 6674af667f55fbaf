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
from pyspark.sql import functions as F
assert e.entry(spark).count() > 0
q = e.queries()
failures = []
for name in sorted(q):
    try:
        # hash over every column forces full expression evaluation —
        # count() would let Catalyst prune projections and hide
        # ANSI-only errors the driver's full materialization WOULD hit
        df = q[name](spark, "/root/testdata/sf0.001")
        df.select(F.max(F.hash(*df.columns))).collect()
    except Exception as ex:
        failures.append((name, str(ex).splitlines()[0][:120]))
assert not failures, failures

# ANSI edge cases the sf fixtures don't cover:
# 1) minhash over docs with <3 tokens — plain element_at would raise
#    INVALID_ARRAY_INDEX_IN_ELEMENT_AT here (regression for try_element_at).
from realparse_spark.operators.dedup import minhash_lsh_pairs
short = spark.createDataFrame(
    [(1, "hi"), (2, "hi"), (3, "a b"), (4, ""), (5, "one two three four")],
    "doc_id long, text string",
)
minhash_lsh_pairs(short, n=3, k=16, bands=4, threshold=0.0).count()

# 2) pull_report group where NO row passes the sent_ok guard — a plain `/`
#    would raise DIVIDE_BY_ZERO (regression for try_divide); must yield N/A.
from realparse_spark.operators.log_report import pull_report
access = spark.createDataFrame([(1, "10.0.0.1")], "access_id long, client_ip_address string")
file = spark.createDataFrame(
    [("clip.rm", 180, 200, 1)],  # sent > file: excluded by F8, count()==0
    "name string, file_time int, sent_time int, access_id long",
)
customers = spark.createDataFrame([(1, "A", "Yes")], "id long, company_name string, hosting string")
project = spark.createDataFrame([(1, 1)], "project_id long, customer_id long")
project_file = spark.createDataFrame([(1, "clip%")], "project_id long, pattern string")
r = pull_report(access, file, customers, project, project_file).collect()[0]
assert r.avg_view_time == "N/A", r

print("VANILLA_OK", len(q))
"""


def test_all_queries_on_default_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        # 262 queries on local[8]: ~420 s measured (was 588 s before the
        # streaming lifecycles scaled their state-store width to the
        # session's parallelism, pipeline.py _start_scaled); headroom for
        # co-tenant windows without letting a genuine hang run unbounded
        timeout=900,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "VANILLA_OK" in proc.stdout


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
