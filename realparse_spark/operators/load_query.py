"""Driver-visible end-to-end load lifecycle query (SURVEY.md §3.1).

Puts the WHOLE real_parse.pl cron lifecycle under the DuckDB oracle in one
CORRECTNESS row: synthesize rotated log files (deterministically from the
``events`` table, same arithmetic as the parse queries), run `load_style5`
TWICE into a temp warehouse — an initial backfill run and an incremental
run over a newer rotation, exercising S1 dir scan, S2 latest-two pruning,
S4 line scan, F1 strict-'>' watermark, F2 family discriminator, J2 key
propagation, and the S7 partitioned sink — then read back `access ⋈ file`
and aggregate.

The oracle cannot run the loader, but it doesn't need to: the lifecycle's
CONTRACT is that after both runs every parseable synthesized line is in
the warehouse exactly once (the watermark makes the re-read of the older
rotation a no-op).  So the oracle aggregates the same synthesized lines
directly; any double-load, dropped line, or parse divergence breaks the
row-count/value-hash compare.

The rotation split point (mean event time) only shapes the lifecycle —
which lines arrive in run 1 vs run 2 — never the final table, so the
boundary needs no oracle mirror.  Splitting on epoch (not event_id) keeps
run 2's lines strictly newer than run 1's watermark: exactly-once without
modelling watermark exclusions in SQL.
"""

from __future__ import annotations

import atexit
import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realparse_spark.operators.load import load_style5, read_warehouse_table
from realparse_spark.operators.parse_queries import _STYLE5_LINES_SQL, synth_style5
from realparse_spark.sources.tables import load_table


def _write_rotation(df: DataFrame, root: str, logs: str, fname: str) -> None:
    """Materialize a synthesized-lines DF as ONE rotated log file (the
    loader's S1/S2 surface is plain files with name-sortable suffixes)."""
    stage = os.path.join(root, "stage_" + fname)
    df.select("value").coalesce(1).write.mode("overwrite").text(stage)
    os.rename(glob.glob(os.path.join(stage, "part-*"))[0], os.path.join(logs, fname))
    shutil.rmtree(stage, ignore_errors=True)


_RESULT_ROOT: str | None = None


def persist_result(df: DataFrame) -> DataFrame:
    """Park a lifecycle query's FINAL aggregate in a session-lifetime temp
    parquet and return the lazy read.

    The e2e harnesses synthesize a corpus + warehouse in a per-invocation
    temp tree that must be deleted before returning (the bench harness runs
    each query repeatedly — leaving a tree per run leaks /tmp).  The old
    escape hatch was `createDataFrame(out.collect(), ...)`, which funnels
    the whole result through driver memory — `stream_window_e2e` was
    already ~10k rows at sf0.1 and grows linearly with sf.  Writing the
    aggregate (tiny vs the corpus) to a KEPT location instead keeps the
    result distributed end-to-end: no result-set collect anywhere in a
    `queries()` path.  The parking lot is removed once, at session exit."""
    global _RESULT_ROOT
    if _RESULT_ROOT is None:
        _RESULT_ROOT = tempfile.mkdtemp(prefix="realparse_results_")
        atexit.register(shutil.rmtree, _RESULT_ROOT, ignore_errors=True)
    out = tempfile.mkdtemp(dir=_RESULT_ROOT)
    df.write.mode("overwrite").parquet(out)
    return df.sparkSession.read.parquet(out)


def q_load_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # lifecycle split on event time: run-2 lines are strictly newer than
    # run-1's watermark, so the incremental run loads exactly the new file
    split = events.agg(F.avg(F.unix_timestamp("ts"))).collect()[0][0]
    if split is None:  # empty events table: nothing to load, typed empty report
        return spark.createDataFrame(
            [], "path string, n_rows bigint, sum_bytes bigint, n_ips bigint, max_dt string"
        )
    older = synth_style5(events.filter(F.unix_timestamp("ts") <= split))
    newer = synth_style5(events.filter(F.unix_timestamp("ts") > split))

    root = tempfile.mkdtemp(prefix="realparse_e2e_")
    try:
        logs = os.path.join(root, "logs")
        os.makedirs(logs)
        wh = os.path.join(root, "wh")

        _write_rotation(older, root, logs, "rmaccess.log.20021011")
        load_style5(spark, logs, wh, latest=2)  # cron run 1: backfill
        _write_rotation(newer, root, logs, "rmaccess.log.20021012")
        load_style5(spark, logs, wh, latest=2)  # cron run 2: incremental — the
        # older rotation is re-read (S2 keeps two files) but the F1 watermark
        # filters every already-loaded line

        access = read_warehouse_table(spark, wh, "access")
        file = read_warehouse_table(spark, wh, "file")
        out = (
            access.join(file, "access_id")  # J2: keys propagated, no read-back
            .groupBy("path")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("bytes_sent").alias("sum_bytes"),
                F.count_distinct("client_ip_address").alias("n_ips"),
                F.max(F.date_format("datetime", "yyyy-MM-dd HH:mm:ss")).alias("max_dt"),
            )
        )
        # park the aggregate outside the temp tree so the synthesized
        # corpus + warehouse can be deleted immediately, without the result
        # ever passing through the driver
        return persist_result(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


LOAD_E2E_SQL = (
    "WITH "
    + _STYLE5_LINES_SQL.strip()
    + r""",
parsed AS (
  SELECT
    regexp_extract(value, '^(\S+)', 1) AS client_ip_address,
    regexp_extract_all(value, '\s(\d+)', 1) AS toks_raw,
    regexp_extract(value, '"(\S+) (.*?) (\S+)"', 2) AS fn,
    strptime(regexp_extract(regexp_extract_all(value, '\[([^\]]*)\]', 1)[1],
                            '^(.+) -(\d+)$', 1), '%d/%b/%Y:%H:%M:%S') AS ts2
  FROM lines
),
toks AS (
  SELECT *,
    CASE WHEN regexp_matches(toks_raw[1], '[69_]\w') THEN toks_raw[2:] ELSE toks_raw END AS t,
    string_split(fn, '/')[-1] AS raw_name
  FROM parsed
),
flat AS (
  SELECT client_ip_address,
    CAST(t[2] AS BIGINT) AS bytes_sent,
    CASE WHEN contains(fn, '/')
         THEN substring(fn, 1, length(fn) - length(raw_name) - 1) ELSE '' END AS path,
    ts2
  FROM toks
  WHERE ts2 IS NOT NULL
)
SELECT path,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(bytes_sent) AS BIGINT) AS sum_bytes,
  CAST(count(DISTINCT client_ip_address) AS BIGINT) AS n_ips,
  max(strftime(ts2, '%Y-%m-%d %H:%M:%S')) AS max_dt
FROM flat
GROUP BY path
"""
)


QUERIES = {"load_e2e": q_load_e2e}
ORACLES = {"load_e2e": LOAD_E2E_SQL}
