"""The vanilla-gate subprocess script (every driver query on a DEFAULT
ANSI-on SparkSession), shared between tests/test_vanilla_session.py and
the conftest collection hook that launches it EARLY so its ~2 min
subprocess overlaps the rest of the suite instead of extending it."""

from __future__ import annotations

SCRIPT = r"""
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[*]").appName("vanilla-gate")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
from pyspark.sql import functions as F
assert e.entry(spark).count() > 0
q = e.queries()

# Overlap independent jobs (optimization guide §2.6): 262 sequential
# sub-second jobs on a default 200-partition session are dominated by
# per-job scheduling/codegen overhead, so a small thread pool back-fills
# the cores a single query's task tail leaves idle (~420 s -> ~2 min).
# Each query still materializes exactly as the driver would; failures are
# collected per name, deterministically sorted for the report.
from concurrent.futures import ThreadPoolExecutor

def run_one(name):
    try:
        # hash over every column forces full expression evaluation —
        # count() would let Catalyst prune projections and hide
        # ANSI-only errors the driver's full materialization WOULD hit
        df = q[name](spark, "/root/testdata/sf0.001")
        df.select(F.max(F.hash(*df.columns))).collect()
        return None
    except Exception as ex:
        return (name, str(ex).splitlines()[0][:120])

with ThreadPoolExecutor(max_workers=8) as pool:
    failures = sorted(r for r in pool.map(run_one, sorted(q)) if r is not None)
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
