"""Report-surface operators (SURVEY.md §2.3-2.7, §3.3).

The reference's `pull_report.pl` runs 4 correlated scalar SQL queries per
(customer, project, file-pattern) in a driver-side nested loop
(pull_report.pl:34-64).  Here the whole report is ONE Spark job:
broadcast-joined dims + a single groupBy — the idiomatic collapse described
in SURVEY.md §2.5 A6 / §3.3.

Table analogy (FIXTURES.md §C): file->lineitem, access->orders,
contacts.main->customer, project_file patterns->part.p_type prefixes,
events = timestamped hub for watermark/window ops.

Every query has a matching DuckDB oracle in ORACLES (same aliases, same
value types).  Aggregates over doubles are summed through DECIMAL casts so
both engines produce bit-identical values (FP summation order would
otherwise diverge), then cast back to DOUBLE for a stable schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realparse_spark.functions.scalars import duration_hms
from realparse_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# customer_report — the flagship (M0).
# Reference shape: pull_report.pl:96-175 — per-pattern COUNT / MAX(file_time)
# / ROUND(AVG(sent_time)) / MAX(sent_time) with predicates F5 (internal-IP
# NOT LIKE), F7 (non-zero guard), F8 (sent<=file bound), F10 (hosting='Yes'),
# over the J1 equi-join file⋈access and the J4 customer-dim join.
# ---------------------------------------------------------------------------

def customer_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no fan_out here: both join sides broadcast, so the narrow scan +
    # map-side partial agg beats paying a repartition shuffle (measured)
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    cust = customer.filter(F.col("c_mktsegment") == "BUILDING")  # F10 hosting='Yes'
    fact = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)  # J1
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)  # J4, dim broadcast
        .filter(~F.col("o_orderpriority").like("1-%"))  # F5: NOT LIKE '192.168.%' analog
        .filter(F.col("l_quantity") != 0)  # F7 non-zero guard
        .filter(F.col("l_discount") <= F.col("l_tax"))  # F8 sent<=file bound
    )
    return fact.groupBy("c_nationkey", "l_returnflag").agg(
        F.count("l_partkey").alias("n_views"),  # A3 count(file.name)
        F.max("l_quantity").cast("double").alias("max_clip_sec"),  # A4 MAX(file_time)
        # A5 ROUND(AVG(sent_time)): exact decimal sum / count, one IEEE
        # division, then round — bit-identical to the oracle.
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / F.count("l_extendedprice"),
            0,
        ).alias("avg_view_sec"),
        F.max("l_extendedprice").cast("double").alias("longest_view_sec"),  # A4 MAX(sent_time)
    )


CUSTOMER_REPORT_SQL = """
SELECT c_nationkey,
       l_returnflag,
       count(l_partkey) AS n_views,
       CAST(max(l_quantity) AS DOUBLE) AS max_clip_sec,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(l_extendedprice), 0) AS avg_view_sec,
       CAST(max(l_extendedprice) AS DOUBLE) AS longest_view_sec
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderpriority NOT LIKE '1-%'
  AND l_quantity <> 0
  AND l_discount <= l_tax
GROUP BY c_nationkey, l_returnflag
"""


# ---------------------------------------------------------------------------
# report_formatted — F9/F12 N/A semantics + C11 duration format + C13 line.
# Reference: pull_report.pl:113-127 (wmv/wma/mov short-circuit to 'N\\A'),
# :178-187 (formatTime H:MM:SS | M:SS), :53-57 (sprintf report line).
# ---------------------------------------------------------------------------

def report_formatted(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    agg = lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("l_orderkey").alias("n_views"),
        F.floor(F.max("l_quantity") * 100).alias("_max_sec"),
    )
    # F9: 'R' flag short-circuits to N/A without computing the metric
    # (analog of .wmv/.wma/.mov name gating); F12: NULL -> 'N/A'.
    clip_len = F.when(F.col("l_returnflag") == "R", F.lit(None)).otherwise(
        duration_hms(F.col("_max_sec"))
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "n_views",
        F.coalesce(clip_len, F.lit("N/A")).alias("clip_len"),
        F.format_string(
            "flag=%s status=%s views=%d", "l_returnflag", "l_linestatus", "n_views"
        ).alias("report_line"),  # C13
    )


REPORT_FORMATTED_SQL = r"""
WITH agg AS (
  SELECT l_returnflag, l_linestatus,
         count(l_orderkey) AS n_views,
         CAST(floor(max(l_quantity) * 100) AS BIGINT) AS _max_sec
  FROM lineitem
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus, n_views,
       coalesce(
         CASE WHEN l_returnflag = 'R' THEN NULL
              WHEN _max_sec >= 3600 THEN printf('%d:%02d:%02d', _max_sec // 3600, (_max_sec % 3600) // 60, _max_sec % 60)
              ELSE printf('%d:%02d', _max_sec // 60, _max_sec % 60)
         END, 'N/A') AS clip_len,
       printf('flag=%s status=%s views=%d', l_returnflag, l_linestatus, n_views) AS report_line
FROM agg
"""


# ---------------------------------------------------------------------------
# like_pattern_join — J3: the dependent LIKE-pattern join.
# Reference: pull_report.pl:43-52,99 — per-project file patterns applied as
# `file.name LIKE '<pattern>'`.  Spark shape: broadcast the (tiny) pattern
# dim, non-equi LIKE predicate join (BNL over broadcast = fine; the fact side
# streams).
# ---------------------------------------------------------------------------

def like_pattern_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    patterns = (
        part.select(F.concat(F.substring("p_type", 1, 8), F.lit("%")).alias("pattern"))
        .distinct()
    )
    joined = part.join(F.broadcast(patterns), F.expr("p_type LIKE pattern"), "inner")
    return joined.groupBy("pattern").agg(
        F.count("p_partkey").alias("n_files"),
        F.round(
            F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast("double")
            / F.count("p_retailprice"),
            0,
        ).alias("avg_price"),
    )


LIKE_PATTERN_JOIN_SQL = """
WITH patterns AS (
  SELECT DISTINCT substring(p_type, 1, 8) || '%' AS pattern FROM part
)
SELECT pattern,
       count(p_partkey) AS n_files,
       round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(p_retailprice), 0) AS avg_price
FROM part JOIN patterns ON p_type LIKE pattern
GROUP BY pattern
"""


# ---------------------------------------------------------------------------
# watermark_incremental — F1/F2/A1: the high-watermark incremental filter.
# Reference: real_parse.pl:47-52,93 — watermark = MAX(datetime) of the other
# source family (discriminated by logging_style NULLness), keep only strictly
# newer rows.  Spark shape: 1-row agg, broadcast cross-join, strict filter —
# no driver round-trip, no collect.
# ---------------------------------------------------------------------------

def watermark_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # "already-loaded" family: error events; incoming family: click events.
    wm = events.filter(F.col("event_type") == "error").agg(
        F.max("ts").alias("wm_ts")
    )
    incoming = events.filter(F.col("event_type") == "click")
    fresh = incoming.join(F.broadcast(wm)).filter(F.col("ts") > F.col("wm_ts"))
    return fresh.agg(
        F.count("event_id").alias("n_new"),
        F.count_distinct("user_id").alias("n_users"),
    )


WATERMARK_INCREMENTAL_SQL = """
WITH wm AS (SELECT max(ts) AS wm_ts FROM events WHERE event_type = 'error')
SELECT count(event_id) AS n_new,
       count(DISTINCT user_id) AS n_users
FROM events, wm
WHERE event_type = 'click' AND ts > wm_ts
"""


# ---------------------------------------------------------------------------
# union_sources — §2.6 set ops: the two log sources appended into one access
# table with different server_type and NULL logging_style for web rows
# (real_parse.pl:16 server_type=1; web_parse.pl:15 server_type=0,
# web_parse.pl:87 NULL style).  unionByName(allowMissingColumns) supplies the
# NULLs.
# ---------------------------------------------------------------------------

def union_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    real = events.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        "ts",
        F.lit(1).alias("server_type"),
        F.lit(5).alias("logging_style"),
    )
    web = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(0).alias("server_type")
    )
    unioned = real.unionByName(web, allowMissingColumns=True)
    return unioned.groupBy("server_type", "logging_style").agg(
        F.count("user_id").alias("n_rows"),
        F.count_distinct("user_id").alias("n_users"),
    )


UNION_SOURCES_SQL = """
WITH unioned AS (
  SELECT user_id, ts, 1 AS server_type, 5 AS logging_style
  FROM events WHERE event_type IN ('click', 'view')
  UNION ALL
  SELECT user_id, ts, 0 AS server_type, NULL AS logging_style
  FROM events WHERE event_type = 'purchase'
)
SELECT server_type, logging_style,
       count(user_id) AS n_rows,
       count(DISTINCT user_id) AS n_users
FROM unioned
GROUP BY server_type, logging_style
"""


# ---------------------------------------------------------------------------
# top2_files — S2: latest-two-rotated-files pruning (real_parse.pl:28
# `$#logdirfiles-1 .. $#logdirfiles` after the name sort) = top-2 by sort key
# desc.  Deterministic tie-break on the key column.
# ---------------------------------------------------------------------------

def top2_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
        .limit(2)
    )


TOP2_FILES_SQL = """
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders
ORDER BY o_orderdate DESC, o_orderkey DESC
LIMIT 2
"""


# ---------------------------------------------------------------------------
# surrogate_keys — J2/A2: the reference assigns surrogate keys by per-row
# INSERT + SELECT max(id) read-back (real_parse.pl:96-114) — a serialization
# point.  Distributed replacement: dense global ranks via TWO-PHASE
# assignment — range-partition on the natural key, per-partition
# row_number, then add per-partition offsets from a tiny counts table.
# Every stage is parallel: no Window.orderBy over the whole table (which
# would force an Exchange SinglePartition — the one plan shape that cannot
# survive 100 TB; asserted absent in tests/test_plan_quality.py).
# ---------------------------------------------------------------------------

def surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    # Deterministic range buckets from driver-scalar boundaries — NOT
    # repartitionByRange: RangePartitioner picks boundaries by SAMPLING,
    # and this plan evaluates the bucketed table twice (local ranks +
    # counts); at multi-split inputs the two executions can sample
    # different boundaries, making the offsets disagree with the local
    # numbering and ids collide (observed at sf0.1: 64 collisions).
    # Boundaries fetched ONCE into literals give both consumers identical
    # bucketing by construction — even approxQuantile's own answer only
    # has to be *a* valid split, not a reproducible one.  Quantile
    # boundaries (vs min/max interpolation) keep buckets balanced under
    # skewed key distributions, so no bucket degenerates into a giant
    # near-global row_number partition.
    n_parts = 32
    lo_hi = customer.agg(F.min("c_custkey").alias("lo"), F.max("c_custkey").alias("hi")).collect()[0]
    if lo_hi.lo is None:
        # empty dimension: a typed empty result, not int(None) crashes
        return spark.createDataFrame(
            [], "surrogate_id int, c_mktsegment string, n_orders bigint"
        )
    bounds = customer.stat.approxQuantile(
        "c_custkey", [i / n_parts for i in range(1, n_parts)], 0.001
    )
    pid = F.lit(0)
    for b in bounds:
        pid = pid + (F.col("c_custkey") > F.lit(b)).cast("int")
    pid = pid.cast("int")
    parts = customer.select("c_custkey", "c_mktsegment").withColumn("pid", pid)
    local = parts.withColumn(
        "local_rn", F.row_number().over(Window.partitionBy("pid").orderBy("c_custkey"))
    )
    counts = parts.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    # offsets via a tiny triangular self-join (P^2 rows, P=32) instead of an
    # unpartitioned running-sum window — keeps the whole plan free of
    # single-partition exchanges.
    offsets = (
        counts.alias("a")
        .join(counts.alias("b"), F.col("b.pid") < F.col("a.pid"), "left")
        .groupBy(F.col("a.pid").alias("pid"))
        .agg(F.coalesce(F.sum("b.cnt"), F.lit(0)).alias("offset"))
    )
    keyed = local.join(F.broadcast(offsets), "pid").select(
        (F.col("offset") + F.col("local_rn")).cast("int").alias("surrogate_id"),
        "c_custkey",
        "c_mktsegment",
    )
    return (
        orders.join(keyed, orders.o_custkey == keyed.c_custkey)
        .groupBy("surrogate_id", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


SURROGATE_KEYS_SQL = """
WITH keyed AS (
  SELECT CAST(row_number() OVER (ORDER BY c_custkey) AS INTEGER) AS surrogate_id,
         c_custkey, c_mktsegment
  FROM customer
)
SELECT surrogate_id, c_mktsegment, count(o_orderkey) AS n_orders
FROM orders JOIN keyed ON o_custkey = c_custkey
GROUP BY surrogate_id, c_mktsegment
"""


# ---------------------------------------------------------------------------
# distinct_agg — §2.5 extension noted in SURVEY: unique-audience metrics over
# the stored client_ip analog (events.user_id).  Exact COUNT(DISTINCT) here;
# the approximate variant lives in extensions (rows-only check).
# ---------------------------------------------------------------------------

def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("uniq_users"),
        F.count("event_id").alias("n_events"),
    )


DISTINCT_AGG_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS uniq_users,
       count(event_id) AS n_events
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# tumbling_window — §2.8 extension: the reference's global-per-file metrics
# made time-windowed (window(ts, '1 hour')).  Window start emitted as a
# formatted string so both engines agree on type and value.
# ---------------------------------------------------------------------------

def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    win = events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count("event_id").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )
    return win.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


TUMBLING_WINDOW_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(event_id) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# json_props — extension motivated by events.props (SURVEY §2.7 note):
# JSON field extraction, the schema-on-read path the reference never had.
# ---------------------------------------------------------------------------

def json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count(F.when(k > 50, True)).alias("n_high"),
    )


JSON_PROPS_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       count(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 THEN 1 END) AS n_high,
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# sessionize — window-function sessionization (gap > 30 min starts a new
# session).  The reference has no windows (§2.6); this is the batch analog of
# the streaming session-window extension.
# ---------------------------------------------------------------------------

def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gaps = events.select(
        "user_id",
        (
            F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
            > 1800.0
        )
        .cast("int")
        .alias("new_session"),
    )
    per_user = gaps.groupBy("user_id").agg(
        (F.coalesce(F.sum("new_session"), F.lit(0)) + 1).alias("n_sessions")
    )
    return per_user.groupBy("n_sessions").agg(F.count("user_id").alias("n_users"))


SESSIONIZE_SQL = """
WITH gaps AS (
  SELECT user_id,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800.0
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
per_user AS (
  SELECT user_id, CAST(coalesce(sum(new_session), 0) + 1 AS BIGINT) AS n_sessions
  FROM gaps GROUP BY user_id
)
SELECT n_sessions, count(user_id) AS n_users
FROM per_user GROUP BY n_sessions
"""


def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session-window aggregation (F.session_window) — the same
    30-minute-gap semantics as `sessionize`, but as Spark's built-in
    merging session operator (one shuffle on user_id; sessions merge in
    the aggregation, no window-function pass).  Spark merges two events
    iff their gap is STRICTLY under the 30-min gap, so the oracle's break
    condition is >= 1800s (the lag-cumsum `sessionize` uses > 1800 — a
    deliberate boundary difference between the two formulations)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
        )
    )


SESSION_WINDOW_NATIVE_SQL = """
WITH g AS (
  SELECT user_id, ts,
    CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800.0
         THEN 1 ELSE 0 END AS brk
  FROM events
),
s AS (
  SELECT user_id, ts,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM s GROUP BY user_id, sid
"""


# ---------------------------------------------------------------------------
# anti_semi_join — §2.4 note: semi/anti joins come free in the rebuild.
# Anti: customers with no orders; semi: nations that have suppliers.
# ---------------------------------------------------------------------------

def anti_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    # anti-join vs URGENT orders only: every fixture customer has SOME
    # order at every scale (an unfiltered anti-join is vacuously empty),
    # while ~10-15% have no urgent one — same anti shape, real answer,
    # and the priority filter pushes to the orders scan
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    no_orders = customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_anti"
    )
    per_seg = no_orders.groupBy("c_mktsegment").agg(
        F.count("c_custkey").alias("n_inactive")
    )
    n_supplier_nations = (
        nation.join(supplier, nation.n_nationkey == supplier.s_nationkey, "left_semi")
        .agg(F.count("n_nationkey").alias("cnt"))
        .select(F.col("cnt"))
    )
    return per_seg.crossJoin(
        F.broadcast(n_supplier_nations.withColumnRenamed("cnt", "n_supplier_nations"))
    )


ANTI_SEMI_JOIN_SQL = """
WITH no_orders AS (
  SELECT c_custkey, c_mktsegment FROM customer
  WHERE NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
),
per_seg AS (
  SELECT c_mktsegment, count(c_custkey) AS n_inactive
  FROM no_orders GROUP BY c_mktsegment
),
sn AS (
  SELECT count(n_nationkey) AS n_supplier_nations FROM nation
  WHERE EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
)
SELECT per_seg.c_mktsegment, per_seg.n_inactive, sn.n_supplier_nations
FROM per_seg, sn
"""


QUERIES = {
    "customer_report": customer_report,
    "report_formatted": report_formatted,
    "like_pattern_join": like_pattern_join,
    "watermark_incremental": watermark_incremental,
    "union_sources": union_sources,
    "top2_files": top2_files,
    "surrogate_keys": surrogate_keys,
    "distinct_agg": distinct_agg,
    "tumbling_window": tumbling_window,
    "json_props": json_props,
    "sessionize": sessionize,
    "session_window_native": session_window_native,
    "anti_semi_join": anti_semi_join,
}

ORACLES = {
    "customer_report": CUSTOMER_REPORT_SQL,
    "report_formatted": REPORT_FORMATTED_SQL,
    "like_pattern_join": LIKE_PATTERN_JOIN_SQL,
    "watermark_incremental": WATERMARK_INCREMENTAL_SQL,
    "union_sources": UNION_SOURCES_SQL,
    "top2_files": TOP2_FILES_SQL,
    "surrogate_keys": SURROGATE_KEYS_SQL,
    "distinct_agg": DISTINCT_AGG_SQL,
    "tumbling_window": TUMBLING_WINDOW_SQL,
    "json_props": JSON_PROPS_SQL,
    "sessionize": SESSIONIZE_SQL,
    "session_window_native": SESSION_WINDOW_NATIVE_SQL,
    "anti_semi_join": ANTI_SEMI_JOIN_SQL,
}
