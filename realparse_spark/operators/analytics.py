"""Product/warehouse analytics shapes over the fixture tables — the query
patterns a log-analytics engine grows into once the star schema exists
(SURVEY.md §2.5-2.6 extensions): cohort retention, trailing-window anomaly
detection, and two classic TPC-H forms (Q3 shipping priority, Q18
large-volume customers).

All four are exact-decimal / integer math end-to-end so the DuckDB oracle
hash-matches bit-for-bit; every aggregate column is aliased identically in
the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realparse_spark.sources.tables import fan_out, load_table


# ---------------------------------------------------------------------------
# cohort retention (events): cohort = first active day per user; count
# distinct users active at day offsets 0..7
# ---------------------------------------------------------------------------

def retention_cohorts(events: DataFrame, max_offset: int = 7) -> DataFrame:
    """Classic retention triangle.  Shape: one groupBy(user_id) for the
    cohort day, self-join on user_id (both sides hash-partition on the
    same key — AQE plans a single co-partitioned exchange pair), then a
    (cohort, offset) count-distinct.  The first-day table is |users| rows
    — usually far under the event count, but it GROWS with the corpus, so
    the broadcast decision belongs to AQE's measured size at runtime, not
    a hard-coded hint that would OOM the driver at extreme user
    cardinality (it picks broadcast at test scale, shuffle join beyond the
    threshold)."""
    first = events.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    acts = events.select("user_id", F.to_date("ts").alias("d"))
    off = F.datediff(F.col("d"), F.col("d0"))
    return (
        acts.join(first, "user_id")
        .select("user_id", F.col("d0"), off.alias("day_offset"))
        .filter((F.col("day_offset") >= 0) & (F.col("day_offset") <= max_offset))
        .groupBy(F.date_format("d0", "yyyy-MM-dd").alias("cohort_date"), "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retention_cohorts(load_table(spark, sf_dir, "events"))


EVENTS_RETENTION_SQL = """
WITH first AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
),
acts AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events)
SELECT strftime(f.d0, '%Y-%m-%d') AS cohort_date,
       CAST(datediff('day', f.d0, a.d) AS INTEGER) AS day_offset,
       count(DISTINCT a.user_id) AS n_active
FROM acts a JOIN first f ON a.user_id = f.user_id
WHERE datediff('day', f.d0, a.d) BETWEEN 0 AND 7
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# trailing-window anomaly detection: per-type daily event counts scored
# against the mean/stddev of the preceding 7 days
# ---------------------------------------------------------------------------

def daily_anomaly_zscore(events: DataFrame) -> DataFrame:
    """Z-score each (event_type, day) daily count against its trailing
    7-day window.  The metric is an integer count and the trailing
    sums are exact integers, so mean/variance/z derive from identical
    inputs in both engines — the float math is the same fixed formula
    evaluated on the same exact sums (no engine-order-dependent float
    accumulation).  Shape: one shuffle for the daily rollup (map-side
    partial agg), then a per-type window — partitioned, never global."""
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-7, -1)
    )
    cnt = F.count(F.lit(1)).over(w)
    s = F.sum("n").over(w)
    ss = F.sum(F.col("n") * F.col("n")).over(w)
    mean = s.cast("double") / cnt
    # sample variance from exact integer sums: (ss - s^2/cnt) / (cnt - 1)
    var = (ss.cast("double") - s.cast("double") * s.cast("double") / cnt) / (cnt - 1)
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    return (
        daily.select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n",
            F.when((cnt >= 2) & (var > 0), F.round(z, 4)).alias("zscore"),
        )
        .withColumn(
            "is_anomaly", F.coalesce(F.abs(F.col("zscore")) > 2.0, F.lit(False))
        )
    )


def q_event_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_anomaly_zscore(load_table(spark, sf_dir, "events"))


EVENT_ZSCORE_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT event_type, d, n,
    count(*)        OVER w AS cnt,
    sum(n)          OVER w AS s,
    sum(n * n)      OVER w AS ss
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n,
  CASE WHEN cnt >= 2
        AND (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / cnt) / (cnt - 1) > 0
       THEN round((CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / cnt)
                  / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / cnt) / (cnt - 1)), 4)
  END AS zscore,
  coalesce(abs(CASE WHEN cnt >= 2
        AND (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / cnt) / (cnt - 1) > 0
       THEN round((CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / cnt)
                  / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / cnt) / (cnt - 1)), 4)
  END) > 2.0, FALSE) AS is_anomaly
FROM win
"""


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: unshipped-order revenue priority
# ---------------------------------------------------------------------------

def q3_shipping_priority(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame
) -> DataFrame:
    """Top-10 open orders by pending revenue for one market segment.
    Plan at scale: the segment-filtered customer dim broadcasts, orders
    and lineitem meet in one shuffle equi-join on orderkey (both date
    filters pushed to the parquet scans), one partial+final agg, and the
    top-10 runs as TakeOrderedAndProject — no global sort."""
    cutoff = F.lit("1998-01-01").cast("timestamp")
    c = customer.filter(F.col("c_mktsegment") == "BUILDING")
    o = orders.filter(F.col("o_orderdate") < cutoff)
    l = lineitem.filter(F.col("l_shipdate") > cutoff)
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,2)")
    ).cast("decimal(18,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q3_shipping_priority(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


Q3_SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
  o_orderpriority,
  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume customers
# ---------------------------------------------------------------------------

def big_spender_orders(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, min_qty: int = 150
) -> DataFrame:
    """Orders whose total line quantity exceeds a threshold, with their
    customers.  Plan at scale: the HAVING pre-aggregates lineitem down to
    at most |orders| rows BEFORE any join (map-side partial agg on the
    shuffle); how many keys survive depends on the threshold's
    selectivity, so whether the keyset broadcasts back to orders is AQE's
    call from its measured post-agg size — no hard-coded hint (a loose
    threshold at 100 TB would otherwise broadcast a huge keyset).
    Quantities sum as exact decimals."""
    qty = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_q"))
        .filter(F.col("_q") > min_qty)
    )
    return (
        orders.join(qty, orders.o_orderkey == qty.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.col("o_totalprice").cast("double").alias("total_price"),
            F.col("_q").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("total_price").desc(), F.col("o_orderkey"))
        .limit(20)
    )


def q_big_spender_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return big_spender_orders(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


BIG_SPENDER_ORDERS_SQL = """
WITH qty AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS q
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
SELECT c_name, c_custkey, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
  CAST(o_totalprice AS DOUBLE) AS total_price,
  CAST(q AS DOUBLE) AS sum_qty
FROM orders
JOIN qty      ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_price DESC, o_orderkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue by customer
# ---------------------------------------------------------------------------

def returned_items_report(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Top-20 customers by revenue lost to returned items in one quarter.
    Plan at scale: returnflag + date filters push to both fact scans,
    lineitem⋈orders is the one big shuffle, customer/nation broadcast,
    top-20 is TakeOrderedAndProject.  Exact-decimal revenue."""
    l = lineitem.filter(F.col("l_returnflag") == "R")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,2)")
    ).cast("decimal(18,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(customer), o.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return returned_items_report(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
    )


Q10_RETURNED_ITEMS_SQL = """
SELECT c_custkey, c_name, n_name,
  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# rolling 7-day active users (exact distinct over a sliding date window)
# ---------------------------------------------------------------------------

def rolling_active_users(events: DataFrame, window_days: int = 7) -> DataFrame:
    """Exact trailing-7-day distinct actives per day (WAU).  Distinct
    counts don't merge across days, so the scalable shape is NOT a range
    join (BNL at scale): dedup to (user, day) pairs, explode each pair to
    the `window_days` report days it contributes to (equi keys only),
    then one count-distinct per day.  Data volume is bounded at
    `window_days` x |user-days| — linear, shuffle on uniform date keys.
    Days past the data's max date are trimmed (they'd report partial
    trailing windows of the future)."""
    user_days = events.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    contrib = user_days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), window_days - 1))
        ).alias("report_d"),
    )
    max_d = events.agg(F.max(F.to_date("ts")).alias("mx"))
    return (
        contrib.join(F.broadcast(max_d))
        .filter(F.col("report_d") <= F.col("mx"))
        .groupBy(F.date_format("report_d", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_active_users(load_table(spark, sf_dir, "events"))


ROLLING_ACTIVE_USERS_SQL = """
WITH user_days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
mx AS (SELECT max(CAST(ts AS DATE)) AS mx FROM events),
contrib AS (
  SELECT user_id, unnest(generate_series(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS report_d
  FROM user_days
)
SELECT strftime(report_d, '%Y-%m-%d') AS day,
       count(DISTINCT user_id) AS active_users
FROM contrib, mx
WHERE CAST(report_d AS DATE) <= mx.mx
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# event-type transition matrix (per-user Markov path analysis)
# ---------------------------------------------------------------------------

def event_transitions(events: DataFrame) -> DataFrame:
    """Count user-journey transitions: for each user's time-ordered event
    stream, every consecutive (from_type -> to_type) step, aggregated to
    the corpus transition matrix with per-source-type shares.  Shape: one
    per-user window (lag), one groupBy — both partition on uniform keys
    (user_id, then the 5x5 type pairs; the final matrix is tiny so the
    share window is over ~|types|² rows)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = events.select(
        "user_id",
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("share"),
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_transitions(load_table(spark, sf_dir, "events"))


EVENT_TRANSITIONS_SQL = """
WITH steps AS (
  SELECT user_id,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
    event_type AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, count(*) AS n
  FROM steps WHERE from_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
  round(n / sum(n) OVER (PARTITION BY from_type), 6) AS share
FROM counts
"""


# ---------------------------------------------------------------------------
# one-pass table profile (data-quality summary: nulls / distincts / range)
# ---------------------------------------------------------------------------

_PROFILE_COLS = (
    ("l_orderkey", "int"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_returnflag", "str"),
    ("l_shipdate", "ts"),
)


def _render(expr, kind: str):
    """Render a (possibly aggregated) value as an engine-stable string:
    decimal form pins doubles ('1.00' — raw double->string diverges across
    engines), explicit format pins timestamps."""
    if kind == "num":
        return F.round(expr, 2).cast("decimal(18,2)").cast("string")
    if kind == "ts":
        return F.date_format(expr, "yyyy-MM-dd HH:mm:ss")
    return expr.cast("string")


def profile_table(df: DataFrame) -> DataFrame:
    """Per-column profile — null count, distinct count, min/max — computed
    in ONE job over the scan (count-distincts share a single Expand; no
    per-column re-scans).  Output is long-form (one row per column) via a
    stack of the aggregate scalars: the post-agg unpivot touches a 1-row
    DataFrame, so the reshape is free at any scale."""
    aggs = []
    for col, kind in _PROFILE_COLS:
        c = F.col(col)
        aggs += [
            F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"{col}__nulls"),
            F.countDistinct(c).alias(f"{col}__distinct"),
            # min/max on the NATIVE value (not its string form — that would
            # be lexicographic), rendered after aggregation
            _render(F.min(c), kind).alias(f"{col}__min"),
            _render(F.max(c), kind).alias(f"{col}__max"),
        ]
    one = df.agg(*aggs)
    stack = F.expr(
        "stack({n}, {args}) as (column, n_nulls, n_distinct, min_value, max_value)".format(
            n=len(_PROFILE_COLS),
            args=", ".join(
                f"'{col}', {col}__nulls, {col}__distinct, {col}__min, {col}__max"
                for col, _ in _PROFILE_COLS
            ),
        )
    )
    return one.select(stack)


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_table(load_table(spark, sf_dir, "lineitem"))


def _duck_render(agg: str, kind: str) -> str:
    if kind == "num":
        return f"CAST(CAST(round({agg}, 2) AS DECIMAL(18,2)) AS VARCHAR)"
    if kind == "ts":
        return f"strftime({agg}, '%Y-%m-%d %H:%M:%S')"
    return f"CAST({agg} AS VARCHAR)"


TABLE_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{col}' AS column,
  CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
  count(DISTINCT {col}) AS n_distinct,
  {_duck_render(f'min({col})', kind)} AS min_value,
  {_duck_render(f'max({col})', kind)} AS max_value
FROM lineitem"""
    for col, kind in _PROFILE_COLS
)


# ---------------------------------------------------------------------------
# year-over-year revenue growth (lag over the yearly rollup)
# ---------------------------------------------------------------------------

def yearly_growth(lineitem: DataFrame) -> DataFrame:
    """Yearly revenue with year-over-year growth.  The unpartitioned lag
    window runs over the POST-AGGREGATION series (|years| rows — single
    digits even at 100 TB), so the one single-partition exchange moves a
    handful of rows, the same class as a 1-row broadcast; the fact table
    itself only ever sees the parallel year rollup."""
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,2)")
    ).cast("decimal(18,4)")
    yearly = lineitem.groupBy(F.year("l_shipdate").alias("year")).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )
    w = Window.orderBy("year")
    prev = F.lag("revenue").over(w)
    return yearly.select(
        "year",
        "revenue",
        "n_items",
        F.round((F.col("revenue") - prev) / prev, 6).alias("yoy_growth"),
    )


def q_yearly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    return yearly_growth(load_table(spark, sf_dir, "lineitem"))


YEARLY_GROWTH_SQL = """
WITH yearly AS (
  SELECT CAST(year(l_shipdate) AS INTEGER) AS year,
    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
    count(*) AS n_items
  FROM lineitem GROUP BY 1
)
SELECT year, revenue, n_items,
  round((revenue - lag(revenue) OVER (ORDER BY year)) / lag(revenue) OVER (ORDER BY year), 6) AS yoy_growth
FROM yearly
"""


# ---------------------------------------------------------------------------
# per-type value deciles (ntile window + exact-decimal per-bucket stats)
# ---------------------------------------------------------------------------

def value_deciles(events: DataFrame) -> DataFrame:
    """Decile table: ntile(10) over `value` within each event_type, then
    per-bucket count/min/max/sum.  The ntile window partitions by
    event_type (parallel across types; within one type the sort is the
    unavoidable cost of exact quantile bucketing — at 100 TB swap in the
    mergeable `approx_quantiles` sketch when exactness isn't required).
    Ordering ties broken by event_id so bucket membership is
    engine-deterministic."""
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        events.select("event_type", "event_id", "value")
        .withColumn("decile", F.ntile(10).over(w))
        .groupBy("event_type", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
    )


def q_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_deciles(load_table(spark, sf_dir, "events"))


VALUE_DECILES_SQL = """
WITH t AS (
  SELECT event_type, event_id, value,
    ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS decile
  FROM events
)
SELECT event_type, CAST(decile AS INTEGER) AS decile,
  count(*) AS n,
  round(min(value), 4) AS lo,
  round(max(value), 4) AS hi,
  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM t
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# partial-aggregate merge: incremental rollup maintenance
# ---------------------------------------------------------------------------

def merge_partials(hourly: DataFrame) -> DataFrame:
    """Merge hourly partial aggregates into daily rollups WITHOUT touching
    raw events — count/sum/min/max are algebraic, so partials merge by
    re-aggregation and the average derives from the merged sums.  This is
    how a 100 TB hypertable maintains rollups: the nightly job merges the
    day's hourly partials (|hours|·|types| rows), never re-scanning
    history; a late partition re-merges one day, not the corpus.  Sums
    stay exact decimal until the final cast."""
    return (
        hourly.groupBy(F.date_format(F.date_trunc("day", "h"), "yyyy-MM-dd").alias("day"), "event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum("s").alias("_s"),
            F.min("mn").alias("min_value"),
            F.max("mx").alias("max_value"),
        )
        .select(
            "day",
            "event_type",
            "n_events",
            F.col("_s").cast("double").alias("sum_value"),
            "min_value",
            "max_value",
            F.round(F.col("_s").cast("double") / F.col("n_events"), 6).alias("avg_value"),
        )
    )


def q_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("s"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    return merge_partials(hourly).orderBy("day", "event_type")


ROLLUP_MERGE_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
    count(*) AS n,
    sum(CAST(value AS DECIMAL(18,4))) AS s,
    min(value) AS mn,
    max(value) AS mx
  FROM events GROUP BY 1, 2
)
SELECT strftime(date_trunc('day', h), '%Y-%m-%d') AS day, event_type,
  CAST(sum(n) AS BIGINT) AS n_events,
  CAST(sum(s) AS DOUBLE) AS sum_value,
  min(mn) AS min_value,
  max(mx) AS max_value,
  round(CAST(sum(s) AS DOUBLE) / CAST(sum(n) AS BIGINT), 6) AS avg_value
FROM hourly GROUP BY 1, 2
ORDER BY day, event_type
"""


# ---------------------------------------------------------------------------
# exact-math trend regression: per-type OLS slope over event time
# ---------------------------------------------------------------------------

def trend_slopes(events: DataFrame) -> DataFrame:
    """Per-type least-squares slope of `value` over time, with every
    moment accumulated as EXACT decimal — the distributed-regression trap
    is float partial sums, whose per-partition order changes run to run
    (and engine to engine); decimal Σx/Σy/Σxy/Σx² are associative, so the
    slope is bit-reproducible at any partitioning.  x is integer seconds
    from the corpus start (a broadcast scalar), keeping x² within
    decimal(38) headroom at any realistic span.  One shuffle (the
    per-type agg); the final formula is a 5-row projection."""
    m0 = events.agg(F.min(F.unix_micros("ts")).alias("_m0"))
    e = events.crossJoin(F.broadcast(m0)).select(
        "event_type",
        F.expr("(unix_micros(ts) - _m0) div 1000000").cast("decimal(19,0)").alias("x"),
        F.col("value").cast("decimal(18,6)").alias("y"),
    )
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    num = n_d * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    den = n_d * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    # degenerate groups (single observation, or all x equal) have den = 0:
    # NULL slope, never a 0/0 NaN whose cross-engine hashing is undefined
    slope = F.when(den != 0.0, F.round(num / den, 6))
    return agg.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        slope.alias("slope_per_sec"),
    ).orderBy("event_type")


def q_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return trend_slopes(load_table(spark, sf_dir, "events"))


TREND_SLOPES_SQL = """
WITH m AS (SELECT min(epoch_us(ts)) AS m0 FROM events),
e AS (
  SELECT event_type,
    CAST((epoch_us(ts) - m0) // 1000000 AS DECIMAL(19,0)) AS x,
    CAST(value AS DECIMAL(18,6)) AS y
  FROM events, m
),
a AS (
  SELECT event_type,
    count(*) AS n,
    sum(x) AS sx,
    sum(y) AS sy,
    sum(x * y) AS sxy,
    sum(x * x) AS sxx
  FROM e GROUP BY event_type
)
SELECT event_type,
  CAST(n AS BIGINT) AS n_events,
  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) <> 0.0
    THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
  END AS slope_per_sec
FROM a
ORDER BY event_type
"""


def theil_sen_trend(events: DataFrame) -> DataFrame:
    """Per-type Theil-Sen trend: the MEDIAN of all pairwise daily slopes —
    the robust complement to `trend_slopes`' least squares (one corrupt
    day moves an OLS slope arbitrarily; it moves the slope median not at
    all).  Sen (1968) / Theil (1950).

    Scale shape: the corpus first collapses to the per-(type, day) daily
    rollup — O(types x days), bounded by CALENDAR TIME, not data volume —
    so the quadratic pair stage runs over a dimension-sized table: the
    rollup is broadcast against itself (BroadcastHashJoin on type, never
    a shuffled self-join), and the median window partitions by type over
    O(days^2) rows.  Daily sums accumulate in exact DECIMAL (associative
    — the `trend_slopes` discipline); each slope becomes DOUBLE via one
    cast per endpoint, and the median picks order statistics by
    row_number — no percentile interpolation for engines to disagree
    on."""
    # ONE materialization: daily has three consumers (both pair-join
    # sides and the n_days rollup) and the broadcast branch defeats
    # ReuseExchange — without the cut, the corpus-wide aggregation (the
    # only data-sized stage here) would run three times
    daily = (
        events.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("s"))
        .localCheckpoint(eager=True)
    )
    a = daily.select(
        "event_type", F.col("d").alias("d1"), F.col("s").alias("s1")
    )
    b = daily.select(
        "event_type", F.col("d").alias("d2"), F.col("s").alias("s2")
    )
    slope = (
        F.col("s2").cast("double") - F.col("s1").cast("double")
    ) / F.datediff("d2", "d1").cast("double")
    pairs = (
        a.join(F.broadcast(b), "event_type")
        .filter(F.col("d2") > F.col("d1"))
        .select("event_type", slope.alias("slope"), "d1", "d2")
    )
    w = Window.partitionBy("event_type").orderBy("slope", "d1", "d2")
    r = pairs.withColumn("rn", F.row_number().over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    # median = the ((cnt+1) div 2)-th and ((cnt+2) div 2)-th order stats
    # (identical when cnt is odd); avg of <= 2 doubles is engine-stable
    med = (
        r.filter(
            (F.col("rn") == F.expr("(cnt + 1) div 2"))
            | (F.col("rn") == F.expr("(cnt + 2) div 2"))
        )
        .groupBy("event_type")
        .agg(
            F.max("cnt").cast("bigint").alias("n_pairs"),
            F.round(F.avg("slope"), 6).alias("ts_slope_per_day"),
        )
    )
    ndays = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    # LEFT join from ndays: a type with a single active day has no slope
    # pairs, but a per-type trend report that silently omits types would
    # mislead — it stays in the table with n_pairs=0 and a NULL slope
    return (
        ndays.join(med, "event_type", "left")
        .select(
            "event_type",
            "n_days",
            F.coalesce(F.col("n_pairs"), F.lit(0).cast("bigint")).alias("n_pairs"),
            "ts_slope_per_day",
        )
        .orderBy("event_type")
    )


def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return theil_sen_trend(load_table(spark, sf_dir, "events"))


THEIL_SEN_TREND_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         sum(CAST(value AS DECIMAL(18,6))) AS s
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
pairs AS (
  SELECT a.event_type,
    (CAST(b.s AS DOUBLE) - CAST(a.s AS DOUBLE))
      / CAST(date_diff('day', a.d, b.d) AS DOUBLE) AS slope,
    a.d AS d1, b.d AS d2
  FROM daily a JOIN daily b USING (event_type)
  WHERE b.d > a.d
),
r AS (
  SELECT event_type, slope,
    row_number() OVER (PARTITION BY event_type ORDER BY slope, d1, d2) AS rn,
    count(*) OVER (PARTITION BY event_type) AS cnt
  FROM pairs
),
med AS (
  SELECT event_type, CAST(max(cnt) AS BIGINT) AS n_pairs,
         round(avg(slope), 6) AS ts_slope_per_day
  FROM r
  WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
  GROUP BY event_type
),
nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY event_type)
SELECT nd.event_type, nd.n_days,
       CAST(coalesce(m.n_pairs, 0) AS BIGINT) AS n_pairs, m.ts_slope_per_day
FROM nd LEFT JOIN med m USING (event_type)
ORDER BY nd.event_type
"""


def winsorize_values(events: DataFrame) -> DataFrame:
    """Per-type winsorized mean of `value`: clamp at the exact discrete
    p05/p95 order statistics (element at ceil(n*p) of the sorted group —
    the adaptive_length_filter quantile convention), then average the
    clamped values.  The robust-mean companion to `event_mad_outliers`:
    heavy-tailed event metrics make raw means meaningless, and a
    percentile AGGREGATE would materialize each group in one task.

    Scale: order statistics via the shared two-phase distributed rank
    partitioned by type (no per-group in-memory sort); the O(types)
    fence table broadcasts back; the clamped mean accumulates in BIGINT
    1e-4 units (floor of double*10000 — identical op on both engines),
    ONE double division at the end."""
    from realparse_spark.operators.distrank import rank_distributed

    base = events.select("event_type", "value", "event_id")
    ranked = rank_distributed(
        base, ["value", "event_id"], rank_col="rn", partition_cols=["event_type"]
    )
    counts = base.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    pos = counts.select(
        "event_type",
        "cnt",
        F.greatest(F.ceil(F.col("cnt") * F.lit(0.05)), F.lit(1)).alias("plo"),
        F.ceil(F.col("cnt") * F.lit(0.95)).alias("phi"),
    )
    fences = (
        ranked.join(F.broadcast(pos), "event_type")
        .filter((F.col("rn") == F.col("plo")) | (F.col("rn") == F.col("phi")))
        .groupBy("event_type")
        .agg(
            F.max(F.when(F.col("rn") == F.col("plo"), F.col("value"))).alias("lo"),
            F.max(F.when(F.col("rn") == F.col("phi"), F.col("value"))).alias("hi"),
        )
    )
    clamped = base.join(F.broadcast(fences), "event_type").select(
        "event_type",
        "lo",
        "hi",
        F.floor(
            F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
            * F.lit(10000.0)
        )
        .cast("long")
        .alias("v_units"),
    )
    return (
        clamped.groupBy("event_type", "lo", "hi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(
                F.sum("v_units").cast("double") / 10000.0 / F.count(F.lit(1)), 4
            ).alias("winsorized_mean"),
        )
        .select(
            "event_type",
            "n_events",
            F.round("lo", 4).alias("p05"),
            F.round("hi", 4).alias("p95"),
            "winsorized_mean",
        )
        .orderBy("event_type")
    )


def q_winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winsorize_values(load_table(spark, sf_dir, "events"))


WINSORIZE_VALUES_SQL = """
WITH ranked AS (
  SELECT event_type, value,
    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
    count(*) OVER (PARTITION BY event_type) AS cnt
  FROM events
),
fences AS (
  SELECT event_type,
    max(CASE WHEN rn = greatest(CAST(ceil(cnt * 0.05) AS BIGINT), 1)
        THEN value END) AS lo,
    max(CASE WHEN rn = CAST(ceil(cnt * 0.95) AS BIGINT) THEN value END) AS hi
  FROM ranked
  WHERE rn = greatest(CAST(ceil(cnt * 0.05) AS BIGINT), 1)
     OR rn = CAST(ceil(cnt * 0.95) AS BIGINT)
  GROUP BY event_type
),
clamped AS (
  SELECT e.event_type, f.lo, f.hi,
    CAST(floor(least(greatest(e.value, f.lo), f.hi) * 10000.0) AS BIGINT) AS v_units
  FROM events e JOIN fences f USING (event_type)
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  round(lo, 4) AS p05,
  round(hi, 4) AS p95,
  round(CAST(sum(v_units) AS DOUBLE) / 10000.0 / count(*), 4) AS winsorized_mean
FROM clamped
GROUP BY event_type, lo, hi
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# time-series gap filling: dense hour grid + forward fill
# ---------------------------------------------------------------------------

def gap_fill_hourly(events: DataFrame) -> DataFrame:
    """Densify the per-type hourly series (the fixture has ~6% missing
    hours) and forward-fill the per-hour average from the last observed
    hour — the hypertable `locf` operation.

    Plan at scale: the grid is |types| × |hours| — generated from TWO tiny
    broadcast inputs (a 1-row min/max scalar and the distinct-type list),
    never by outer-joining the fact against itself; the raw events shuffle
    exactly once (the hourly agg).  The forward fill is a running
    `last(ignorenulls)` window partitioned by type — parallel across
    types, and at extreme history it range-partitions by (type, month)
    with per-partition seeds, the standard locf sharding."""
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("s"),
    )
    bounds = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    types = hourly.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h"),
    )
    j = grid.join(hourly, ["event_type", "h"], "left_outer").select(
        "event_type",
        "h",
        "n",
        F.when(F.col("n").isNotNull(), F.col("s").cast("double") / F.col("n")).alias("avg_h"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        j.select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
            F.col("n").isNull().alias("is_gap"),
            # floor(x*1e4 + 0.5)/1e4, NOT round(x, 4): s is decimal(18,4), so
            # s/n lands exactly on .xxxx5 ties where Spark's HALF_UP and
            # DuckDB's double-rounding disagree; floor(+0.5) is pure IEEE
            # arithmetic, identical in both engines (cf. quantize_embeddings)
            (
                F.floor(F.last("avg_h", ignorenulls=True).over(w) * 10000 + F.lit(0.5))
                / F.lit(10000.0)
            ).alias("filled_avg"),
        )
        .orderBy("event_type", "hour")
    )


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gap_fill_hourly(load_table(spark, sf_dir, "events"))


GAP_FILL_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n,
         sum(CAST(value AS DECIMAL(18,4))) AS s
  FROM events GROUP BY 1, 2
),
b AS (SELECT min(h) AS h0, max(h) AS h1 FROM hourly),
grid AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM hourly) t,
       (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b) g
),
j AS (
  SELECT grid.event_type, grid.h, hourly.n,
         CASE WHEN hourly.n IS NULL THEN NULL
              ELSE CAST(hourly.s AS DOUBLE) / hourly.n END AS avg_h
  FROM grid LEFT JOIN hourly
    ON grid.event_type = hourly.event_type AND grid.h = hourly.h
)
SELECT event_type,
  strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
  CAST(coalesce(n, 0) AS BIGINT) AS n_events,
  (n IS NULL) AS is_gap,
  floor(last_value(avg_h IGNORE NULLS) OVER (
    PARTITION BY event_type ORDER BY h
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000 + 0.5) / 10000.0 AS filled_avg
FROM j
ORDER BY event_type, hour
"""


# ---------------------------------------------------------------------------
# SCD2 dimension build: change log -> type-2 validity intervals
# ---------------------------------------------------------------------------

def scd2_intervals(events: DataFrame) -> DataFrame:
    """Typed SCD2 intervals (user_id, attr_value, valid_from, valid_to
    as timestamps) — the shared core of the build query and the
    point-in-time lookup join."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    x = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("_prev"),
    )
    ch = x.filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("event_type")))
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ch.select(
        "user_id",
        F.col("event_type").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )


def scd2_build(events: DataFrame) -> DataFrame:
    """Slowly-changing-dimension type 2 build from a change log: treating
    each user's event stream as attribute updates (attribute =
    ``event_type``), emit one row per VALUE RUN with its validity interval
    — the nightly dimension-maintenance job every warehouse on a log
    pipeline runs (the reference's `access` table is the raw change log;
    `real_parse.pl:96-107`).

    Shape: ONE shuffle on user_id serves both windows (lag for
    change detection, lead for interval close) — the second window reuses
    the first's partitioning, so the fact never moves twice.  State per
    user is one row; no skew risk beyond a single hot user, which AQE
    splits.  Ordering is (ts, event_id) so same-second updates resolve
    deterministically in both engines; intervals are half-open
    [valid_from, valid_to) with NULL valid_to marking the current row."""
    iv = scd2_intervals(events)
    return iv.select(
        "user_id",
        "attr_value",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        F.col("valid_to").isNull().alias("is_current"),
    )


def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scd2_build(load_table(spark, sf_dir, "events"))


SCD2_BUILD_SQL = """
WITH x AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
ch AS (
  SELECT user_id, event_type, ts, event_id
  FROM x WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type AS attr_value,
  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
  strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), '%Y-%m-%d %H:%M:%S') AS valid_to,
  (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
FROM ch
"""


# ---------------------------------------------------------------------------
# SCD2 point-in-time lookup: enrich facts with the dimension version
# valid at each fact's timestamp
# ---------------------------------------------------------------------------

def scd2_lookup(events: DataFrame) -> DataFrame:
    """The consumption side of `scd2_build`: every purchase is enriched
    with the user's STATE at purchase time — the state dimension is the
    SCD2 interval table built from the user's non-purchase events, and
    the join picks the version whose half-open interval contains the
    purchase timestamp (purchases before any state row keep NULL →
    'NONE').

    Shape: an equi-join on user_id with the interval containment as a
    RESIDUAL condition (never a range cross product); both sides
    hash-partition on the same key, and interval half-openness guarantees
    at most one match per fact — row counts are stable by construction.
    This is the standard late-binding dimension join a warehouse runs
    when facts must not see future dimension versions."""
    state = scd2_intervals(events.filter(F.col("event_type") != "purchase"))
    purch = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    cond = (
        (purch.user_id == state.user_id)
        & (purch.ts >= state.valid_from)
        & (state.valid_to.isNull() | (purch.ts < state.valid_to))
    )
    j = purch.join(state, cond, "left")
    return (
        j.groupBy(F.coalesce(state.attr_value, F.lit("NONE")).alias("state_at_purchase"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .orderBy("state_at_purchase")
    )


def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scd2_lookup(load_table(spark, sf_dir, "events"))


SCD2_LOOKUP_SQL = """
WITH st AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events WHERE event_type <> 'purchase'
),
iv AS (
  SELECT user_id, event_type AS attr_value, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM st WHERE prev IS NULL OR prev <> event_type
),
p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
SELECT coalesce(iv.attr_value, 'NONE') AS state_at_purchase,
  count(*) AS n_purchases,
  CAST(sum(CAST(p.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM p LEFT JOIN iv
  ON p.user_id = iv.user_id
 AND p.ts >= iv.valid_from
 AND (iv.valid_to IS NULL OR p.ts < iv.valid_to)
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# growth accounting: daily active / new / cumulative users
# ---------------------------------------------------------------------------

def daily_new_users(events: DataFrame) -> DataFrame:
    """Classic growth accounting: per day, distinct actives, first-time
    users, and the cumulative user count.  Shape: one distinct over
    (user, day), a per-user min (both shuffle on user_id — AQE pairs
    them), then a |days|-row daily rollup; the running total is a window
    over the POST-AGGREGATION series (tiny — the `yearly_growth`
    precedent), never over the fact."""
    per_day = events.select("user_id", F.to_date("ts").alias("d")).distinct()
    first = per_day.groupBy("user_id").agg(F.min("d").alias("d0"))
    daily = (
        per_day.join(first, "user_id")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(F.when(F.col("d") == F.col("d0"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_new"),
        )
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n_active",
            "n_new",
            F.sum("n_new").over(w).cast("bigint").alias("cum_users"),
        )
        .orderBy("day")
    )


def q_daily_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_new_users(load_table(spark, sf_dir, "events"))


DAILY_NEW_USERS_SQL = """
WITH per_day AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
first AS (SELECT user_id, min(d) AS d0 FROM per_day GROUP BY user_id),
daily AS (
  SELECT d, count(*) AS n_active,
    CAST(sum(CASE WHEN d = d0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
  FROM per_day JOIN first USING (user_id)
  GROUP BY d
)
SELECT strftime(d, '%Y-%m-%d') AS day, n_active, n_new,
  CAST(sum(n_new) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
FROM daily
ORDER BY day
"""


# ---------------------------------------------------------------------------
# RFM segmentation: per-nation recency/frequency/monetary quintiles
# ---------------------------------------------------------------------------

def rfm_segments(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Recency-frequency-monetary segmentation, bucketed WITHIN each
    nation: per ordering customer, days since last order (vs the corpus
    max date — a 1-row broadcast), order count, and exact-decimal spend;
    three ntile(5) windows share ONE c_nationkey shuffle (three sorts, no
    global window — the partition key is what makes this shape survive
    100 TB; a global ntile would single-partition the customer table).
    Ties break on c_custkey so buckets are engine-deterministic.  Output
    is the segment rollup: customers and spend per (nation, r, f, m)."""
    mx = orders.agg(F.max(F.to_date("o_orderdate")).alias("_mx"))
    per = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("_last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_mon"),
    )
    j = (
        customer.select("c_custkey", "c_nationkey")
        .join(per, customer.c_custkey == per.o_custkey)
        .crossJoin(F.broadcast(mx))
        .select(
            "c_nationkey",
            "c_custkey",
            F.datediff(F.col("_mx"), F.col("_last")).alias("recency"),
            "frequency",
            "_mon",
        )
    )
    w_r = Window.partitionBy("c_nationkey").orderBy(F.col("recency").asc(), "c_custkey")
    w_f = Window.partitionBy("c_nationkey").orderBy(F.col("frequency").desc(), "c_custkey")
    w_m = Window.partitionBy("c_nationkey").orderBy(F.col("_mon").desc(), "c_custkey")
    seg = j.select(
        "c_nationkey",
        "_mon",
        F.ntile(5).over(w_r).alias("r_bucket"),
        F.ntile(5).over(w_f).alias("f_bucket"),
        F.ntile(5).over(w_m).alias("m_bucket"),
    )
    return (
        seg.groupBy("c_nationkey", "r_bucket", "f_bucket", "m_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("_mon").cast("double").alias("total_monetary"),
        )
        .orderBy("c_nationkey", "r_bucket", "f_bucket", "m_bucket")
    )


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rfm_segments(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    )


RFM_SEGMENTS_SQL = """
WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS m FROM orders),
per AS (
  SELECT o_custkey,
    max(CAST(o_orderdate AS DATE)) AS last_d,
    count(*) AS frequency,
    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT c_nationkey, c_custkey,
    datediff('day', last_d, m) AS recency, frequency, mon
  FROM customer JOIN per ON c_custkey = o_custkey, mx
),
seg AS (
  SELECT c_nationkey, mon,
    ntile(5) OVER (PARTITION BY c_nationkey ORDER BY recency ASC, c_custkey) AS r_bucket,
    ntile(5) OVER (PARTITION BY c_nationkey ORDER BY frequency DESC, c_custkey) AS f_bucket,
    ntile(5) OVER (PARTITION BY c_nationkey ORDER BY mon DESC, c_custkey) AS m_bucket
  FROM j
)
SELECT c_nationkey,
  CAST(r_bucket AS INTEGER) AS r_bucket,
  CAST(f_bucket AS INTEGER) AS f_bucket,
  CAST(m_bucket AS INTEGER) AS m_bucket,
  count(*) AS n_customers,
  CAST(sum(mon) AS DOUBLE) AS total_monetary
FROM seg
GROUP BY c_nationkey, r_bucket, f_bucket, m_bucket
ORDER BY c_nationkey, r_bucket, f_bucket, m_bucket
"""


def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-pair market-basket analysis: co-purchased part pairs with
    support and lift, exact integer arithmetic end-to-end (lift in ppm =
    n_ab * N * 1e6 div (n_a * n_b) — no float, so the oracle must
    hash-match).

    100 TB shape: pair generation is a basket self-join on the order
    key — quadratic only in basket size (max lines per order), never in
    corpus size — and it is computed ONCE per corpus snapshot: this
    query reads the weighted co-order edge table materialized by
    graph._co_order_edges_for (shared with PageRank; `w` on the a<b
    half IS the pair support), so the warm path is a narrow parquet
    scan instead of re-running the self-join.  The per-item support
    table is O(|parts|) and broadcast into the lift join; the basket
    total is a 1-row broadcast scalar.  Output is bounded by a
    per-partition top-k heap, not a global sort."""
    import os

    from realparse_spark.operators.graph import _co_order_edges_for

    snap = _co_order_edges_for(spark, sf_dir)
    pairs = (
        spark.read.parquet(os.path.join(snap, "edges"))
        .filter(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias("part_a"),
            F.col("dst").alias("part_b"),
            F.col("w").alias("n_ab"),
        )
        .filter(F.col("n_ab") >= 2)
    )
    item = spark.read.parquet(os.path.join(snap, "items"))
    n_orders = spark.read.parquet(os.path.join(snap, "totals"))
    ia = item.select(F.col("part").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("part").alias("part_b"), F.col("n_item").alias("n_b"))
    return (
        pairs.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            F.col("part_a").cast("bigint").alias("part_a"),
            F.col("part_b").cast("bigint").alias("part_b"),
            "n_ab",
            "n_a",
            "n_b",
            F.expr("n_ab * n_orders * 1000000 div (n_a * n_b)").alias("lift_ppm"),
        )
        .orderBy(
            F.col("n_ab").desc(), F.col("lift_ppm").desc(), "part_a", "part_b"
        )
        .limit(50)
    )


MARKET_BASKET_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM li),
item AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item FROM li GROUP BY l_partkey
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
    CAST(count(*) AS BIGINT) AS n_ab
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT CAST(part_a AS BIGINT) AS part_a, CAST(part_b AS BIGINT) AS part_b,
  n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
  CAST(n_ab * (SELECT n_orders FROM n) * 1000000 // (ia.n_item * ib.n_item)
       AS BIGINT) AS lift_ppm
FROM pairs
JOIN item ia ON pairs.part_a = ia.l_partkey
JOIN item ib ON pairs.part_b = ib.l_partkey
ORDER BY n_ab DESC, lift_ppm DESC, part_a, part_b
LIMIT 50
"""


def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per event type — the irregular-
    sampling aggregate (TimescaleDB's time_weight): each sample is
    weighted by how long it was current (epoch-microsecond gap to the
    next sample of the same type), so bursts don't dominate the mean
    the way a row-average lets them.

    Exactness: all-BIGINT — gaps in epoch micros, values floored to
    1e-4 units (floor, not cast: double->int casts truncate in Spark
    but round in DuckDB), products and sums exact 64-bit integers, the
    final average an integral division.  (A decimal sum CAST to DOUBLE
    was tried first and differs in the last bit between engines —
    DuckDB's decimal->double conversion is not correctly rounded for
    >2^53 scaled values.)  At fixture scales sum(v_i*dt) stays ~1e18,
    inside int64; the 100 TB deployment swaps the sum to DECIMAL(38,0)
    and keeps the same recurrence.  Plan: one shuffle on event_type
    (the lead window), then the groupBy rides the same partitioning.
    Ordering is pinned by (ts, event_id) so equal timestamps cannot
    reorder the interval pairing."""
    from pyspark.sql import Window

    from realparse_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts")).alias("us"),
        F.floor(F.col("value") * 10000).cast("bigint").alias("v_e4"),
    )
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    gaps = ev.withColumn("dt", F.lead("us").over(w) - F.col("us")).filter(
        F.col("dt").isNotNull()
    )
    agg = gaps.groupBy("event_type").agg(
        F.sum(F.expr("v_e4 * dt")).cast("bigint").alias("sum_vdt_e4"),
        F.sum("dt").cast("bigint").alias("sum_dt_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
    )
    return agg.select(
        "event_type",
        F.expr("sum_vdt_e4 div sum_dt_us").alias("twa_e4"),
        "sum_dt_us",
        "n_intervals",
    ).orderBy("event_type")


TIME_WEIGHTED_AVG_SQL = """
WITH ev AS (
  SELECT event_type, event_id, epoch_us(ts) AS us,
    CAST(floor(value * 10000) AS BIGINT) AS v_e4
  FROM events
),
gaps AS (
  SELECT event_type, v_e4,
    lead(us) OVER (PARTITION BY event_type ORDER BY us, event_id) - us AS dt
  FROM ev
)
SELECT event_type,
  CAST(CAST(sum(v_e4 * dt) AS BIGINT) // CAST(sum(dt) AS BIGINT) AS BIGINT) AS twa_e4,
  CAST(sum(dt) AS BIGINT) AS sum_dt_us,
  CAST(count(*) AS BIGINT) AS n_intervals
FROM gaps
WHERE dt IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


def q_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-downtime detection: per event type, the silent intervals
    whose duration exceeds 5x that type's OWN mean inter-arrival gap —
    the monitoring query that pages before a consumer notices missing
    data.  The relative threshold keeps the result meaningful at every
    scale (an absolute cutoff is vacuous once density grows 100x).

    All-BIGINT: gaps in epoch micros, the mean as an integral division,
    the severity ratio in integer percent.  Plan: the lead window and
    the per-type mean share one event_type shuffle; the O(types) mean
    table broadcasts back onto the gap rows."""
    from pyspark.sql import Window

    from realparse_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "ts", F.unix_micros(F.col("ts")).alias("us")
    )
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    gaps = ev.withColumn("gap_us", F.lead("us").over(w) - F.col("us")).filter(
        F.col("gap_us").isNotNull()
    )
    mean = gaps.groupBy(F.col("event_type").alias("_t")).agg(
        F.expr("sum(gap_us) div count(*)").alias("mean_gap_us")
    )
    return (
        gaps.join(F.broadcast(mean), gaps["event_type"] == mean["_t"])
        .filter(F.col("gap_us") > 5 * F.col("mean_gap_us"))
        .select(
            "event_type",
            F.col("ts").alias("gap_start"),
            "gap_us",
            F.expr("gap_us * 100 div mean_gap_us").alias("severity_pct"),
        )
        .orderBy("event_type", "gap_start")
    )


EVENT_GAPS_SQL = """
WITH ev AS (
  SELECT event_type, event_id, ts, epoch_us(ts) AS us FROM events
),
gaps AS (
  SELECT event_type, ts,
    lead(us) OVER (PARTITION BY event_type ORDER BY us, event_id) - us AS gap_us
  FROM ev
),
g AS (SELECT * FROM gaps WHERE gap_us IS NOT NULL),
mean AS (
  SELECT event_type AS t, CAST(sum(gap_us) // count(*) AS BIGINT) AS mean_gap_us
  FROM g GROUP BY event_type
)
SELECT event_type, ts AS gap_start, gap_us,
  CAST(gap_us * 100 // mean_gap_us AS BIGINT) AS severity_pct
FROM g JOIN mean ON g.event_type = mean.t
WHERE gap_us > 5 * mean_gap_us
ORDER BY event_type, gap_start
"""


def q_event_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type: the running sum of
    deviations from the series' own mean peaks (in absolute value) at
    the most likely level-shift point — the classic Page (1954) CUSUM
    statistic, reported as one row per series.

    All-BIGINT: values floored to 1e-4 units, the mean an integral
    division, the cumulative sum exact.  The argmax is pinned by
    (|cusum| desc, ts, event_id) so ties cannot flap between engines.
    Plan: mean (map-combined groupBy) broadcast back, then the cumsum
    and ranking windows ride ONE event_type shuffle."""
    from pyspark.sql import Window

    from realparse_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        F.unix_micros(F.col("ts")).alias("us"),
        F.floor(F.col("value") * 10000).cast("bigint").alias("v_e4"),
    )
    mean = ev.groupBy(F.col("event_type").alias("_t")).agg(
        F.expr("sum(v_e4) div count(*)").alias("mean_e4"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    dev = ev.join(F.broadcast(mean), ev["event_type"] == mean["_t"]).select(
        "event_type",
        "event_id",
        "ts",
        "us",
        (F.col("v_e4") - F.col("mean_e4")).alias("dev_e4"),
        "n_events",
    )
    cum = Window.partitionBy("event_type").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    scored = dev.withColumn("cusum_e4", F.sum("dev_e4").over(cum))
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum_e4")).desc(), "us", "event_id"
    )
    return (
        scored.withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") == 1)
        .select(
            "event_type",
            F.col("ts").alias("change_ts"),
            "cusum_e4",
            "n_events",
        )
        .orderBy("event_type")
    )


EVENT_CUSUM_SQL = """
WITH ev AS (
  SELECT event_type, event_id, ts, epoch_us(ts) AS us,
    CAST(floor(value * 10000) AS BIGINT) AS v_e4
  FROM events
),
mean AS (
  SELECT event_type AS t,
    CAST(sum(v_e4) // count(*) AS BIGINT) AS mean_e4,
    CAST(count(*) AS BIGINT) AS n_events
  FROM ev GROUP BY event_type
),
scored AS (
  SELECT event_type, event_id, ts, us, n_events,
    CAST(sum(v_e4 - mean_e4) OVER (
      PARTITION BY event_type ORDER BY us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cusum_e4
  FROM ev JOIN mean ON ev.event_type = mean.t
),
picked AS (
  SELECT *, row_number() OVER (
    PARTITION BY event_type ORDER BY abs(cusum_e4) DESC, us, event_id) AS rn
  FROM scored
)
SELECT event_type, ts AS change_ts, cusum_e4, n_events
FROM picked WHERE rn = 1
ORDER BY event_type
"""


def q_event_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close) bars per event type — the
    canonical downsampling aggregate for irregular series.  Open/close
    are the first/last sample under the pinned (ts, event_id) order
    (row_number windows); high/low/count are plain extremes.  The two
    windows and the groupBy all share ONE (event_type, bucket) hash
    partitioning — a single shuffle end-to-end.  Picked and extreme
    doubles are engine-identical (no float sums anywhere)."""
    from pyspark.sql import Window

    from realparse_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.date_trunc("hour", F.col("ts")).alias("bucket_hour"),
        F.unix_micros(F.col("ts")).alias("us"),
        "value",
    )
    fwd = Window.partitionBy("event_type", "bucket_hour").orderBy("us", "event_id")
    bwd = Window.partitionBy("event_type", "bucket_hour").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    marked = ev.withColumn("rn_f", F.row_number().over(fwd)).withColumn(
        "rn_b", F.row_number().over(bwd)
    )
    return (
        marked.groupBy("event_type", "bucket_hour")
        .agg(
            F.max(F.when(F.col("rn_f") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_b") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .orderBy("event_type", "bucket_hour")
    )


EVENT_OHLC_SQL = """
WITH ev AS (
  SELECT event_type, event_id, date_trunc('hour', ts) AS bucket_hour,
    epoch_us(ts) AS us, value
  FROM events
),
marked AS (
  SELECT *,
    row_number() OVER (PARTITION BY event_type, bucket_hour ORDER BY us, event_id) AS rn_f,
    row_number() OVER (PARTITION BY event_type, bucket_hour ORDER BY us DESC, event_id DESC) AS rn_b
  FROM ev
)
SELECT event_type, bucket_hour,
  max(CASE WHEN rn_f = 1 THEN value END) AS open,
  max(value) AS high,
  min(value) AS low,
  max(CASE WHEN rn_b = 1 THEN value END) AS close,
  CAST(count(*) AS BIGINT) AS n_events
FROM marked
GROUP BY event_type, bucket_hour
ORDER BY event_type, bucket_hour
"""


def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of overlapping time intervals per event type — the coverage
    question behind SLA accounting, sensor uptime, and ad-viewability:
    merge each type's [start, start+duration) intervals and report how
    many disjoint spans remain and how much time they cover.

    Classic single-window algorithm: sort by start within the key, a new
    merged span begins whenever a start exceeds the running max of all
    PRIOR ends (half-open semantics: touching intervals coalesce), span
    id = cumulative sum of those break flags.  Both windows and the
    final groupBy ride ONE event_type shuffle; everything is epoch-micro
    BIGINT arithmetic."""
    from pyspark.sql import Window

    from realparse_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts")).alias("us_start"),
        (F.unix_micros(F.col("ts")) + F.floor(F.col("value") * 1000000).cast("bigint")).alias(
            "us_end"
        ),
    )
    order = Window.partitionBy("event_type").orderBy("us_start", "event_id")
    prior = order.rowsBetween(Window.unboundedPreceding, -1)
    cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_end = F.max("us_end").over(prior)
    brk = F.when(
        prev_end.isNull() | (F.col("us_start") > prev_end), 1
    ).otherwise(0)
    spans = (
        ev.withColumn("grp", F.sum(brk).over(cum))
        .groupBy("event_type", "grp")
        .agg(
            F.min("us_start").alias("s"),
            F.max("us_end").alias("e"),
        )
    )
    return (
        spans.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("e") - F.col("s")).alias("covered_us"),
            (F.max("e") - F.min("s")).alias("extent_us"),
        )
        .orderBy("event_type")
    )


INTERVAL_COVERAGE_SQL = """
WITH ev AS (
  SELECT event_type, event_id, epoch_us(ts) AS us_start,
    epoch_us(ts) + CAST(floor(value * 1000000) AS BIGINT) AS us_end
  FROM events
),
flagged AS (
  SELECT *,
    CASE WHEN max(us_end) OVER (
        PARTITION BY event_type ORDER BY us_start, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      OR us_start > max(us_end) OVER (
        PARTITION BY event_type ORDER BY us_start, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    THEN 1 ELSE 0 END AS brk
  FROM ev
),
grouped AS (
  SELECT *, sum(brk) OVER (
    PARTITION BY event_type ORDER BY us_start, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM flagged
),
spans AS (
  SELECT event_type, grp, min(us_start) AS s, max(us_end) AS e
  FROM grouped GROUP BY event_type, grp
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_spans,
  CAST(sum(e - s) AS BIGINT) AS covered_us,
  CAST(max(e) - min(s) AS BIGINT) AS extent_us
FROM spans
GROUP BY event_type
ORDER BY event_type
"""


def q_event_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: flag values more than
    3 MADs from the median.  Unlike the z-score (`event_zscore`), the
    median/MAD pair doesn't move when the outliers themselves get more
    extreme — the standard robust detector for skewed telemetry.

    Exactness across engines: medians of integers can end in .5, so the
    pipeline carries DOUBLED fixed-point units — med2 = 2*median(v_e4)
    and mad4 = 2*median(|2v - med2|) are always exact BIGINTs, and the
    cutoff |v - med| > 3*MAD becomes the integer test
    2*dev2 > 3*mad4.  Two aggregate passes (MAD is inherently two-pass),
    each a map-combined groupBy broadcast back onto the rows."""
    from realparse_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 10000).cast("bigint").alias("v_e4"),
    )
    med = ev.groupBy(F.col("event_type").alias("_t")).agg(
        (F.percentile("v_e4", F.lit(0.5)) * 2).cast("bigint").alias("med2")
    )
    dev = ev.join(F.broadcast(med), ev["event_type"] == med["_t"]).select(
        "event_type",
        "v_e4",
        "med2",
        F.abs(2 * F.col("v_e4") - F.col("med2")).alias("dev2"),
    )
    mad = dev.groupBy(F.col("event_type").alias("_t")).agg(
        (F.percentile("dev2", F.lit(0.5)) * 2).cast("bigint").alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), dev["event_type"] == mad["_t"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("med2").alias("med2_e4"),
            F.first("mad4").alias("mad4_e4"),
            F.count(F.when(2 * F.col("dev2") > 3 * F.col("mad4"), 1)).alias(
                "n_outliers"
            ),
            F.max(F.when(2 * F.col("dev2") > 3 * F.col("mad4"), F.col("v_e4"))).alias(
                "max_outlier_e4"
            ),
        )
        .orderBy("event_type")
    )


EVENT_MAD_OUTLIERS_SQL = """
WITH ev AS (
  SELECT event_type, CAST(floor(value * 10000) AS BIGINT) AS v_e4 FROM events
),
med AS (
  SELECT event_type AS t,
    CAST(quantile_cont(v_e4, 0.5) * 2 AS BIGINT) AS med2
  FROM ev GROUP BY event_type
),
dev AS (
  SELECT event_type, v_e4, med2, abs(2 * v_e4 - med2) AS dev2
  FROM ev JOIN med ON ev.event_type = med.t
),
mad AS (
  SELECT event_type AS t,
    CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
  FROM dev GROUP BY event_type
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(min(med2) AS BIGINT) AS med2_e4,
  CAST(min(mad4) AS BIGINT) AS mad4_e4,
  CAST(count(CASE WHEN 2 * dev2 > 3 * mad4 THEN 1 END) AS BIGINT) AS n_outliers,
  max(CASE WHEN 2 * dev2 > 3 * mad4 THEN v_e4 END) AS max_outlier_e4
FROM dev JOIN mad ON dev.event_type = mad.t
GROUP BY event_type
ORDER BY event_type
"""


HIST_BUCKETS = 256


def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from a BOUNDED-STATE equi-width histogram — the scale
    path for percentiles: exact `percentile()` sorts every group, but a
    256-bucket histogram is O(buckets) state per key, mergeable by
    counter addition (the same rollup algebra as the CMS), and its
    estimate is off by at most one bucket width (gated in pytest
    against the exact percentile).

    Everything is integer: per-type min/max (one map-combined agg,
    broadcast back), width = (range div B) + 1 so bucket ids stay in
    [0, B); rank targets ceil(n*q/100) by integral arithmetic; the
    estimate is the selected bucket's midpoint.  Deterministic ->
    exactly oracled, unlike `approx_quantiles`' engine-private KLL
    sketch.  Plan: ONE shuffle on event_type serves the extent agg,
    then a (type, bucket) groupBy whose key space is |types| x 256."""
    from realparse_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 10000).cast("bigint").alias("v_e4")
    )
    ext = ev.groupBy(F.col("event_type").alias("_t")).agg(
        F.min("v_e4").alias("mn"),
        F.max("v_e4").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    bucketed = ev.join(F.broadcast(ext), ev["event_type"] == ext["_t"]).select(
        "event_type",
        "mn",
        "n",
        F.expr(f"(mx - mn) div {HIST_BUCKETS} + 1").alias("width"),
        F.col("v_e4"),
    )
    hist = (
        bucketed.withColumn("bucket", F.expr("(v_e4 - mn) div width"))
        .groupBy("event_type", "mn", "n", "width", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    cum = F.sum("cnt").over(
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = hist.withColumn("cum", cum)

    def est(q: int):
        target = F.expr(f"(n * {q} + 99) div 100")
        pick = F.min(F.when(F.col("cum") >= target, F.col("bucket")))
        return (
            F.first("mn") + pick * F.first("width") + F.expr("first(width) div 2")
        ).alias(f"p{q}_e4")

    return (
        ranked.groupBy("event_type")
        .agg(F.first("n").alias("n"), est(50), est(95), est(99))
        .orderBy("event_type")
    )


HIST_QUANTILES_SQL = f"""
WITH ev AS (
  SELECT event_type, CAST(floor(value * 10000) AS BIGINT) AS v_e4 FROM events
),
ext AS (
  SELECT event_type AS t, min(v_e4) AS mn, max(v_e4) AS mx,
         CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY event_type
),
bucketed AS (
  SELECT event_type, mn, n,
    CAST((mx - mn) // {HIST_BUCKETS} + 1 AS BIGINT) AS width,
    v_e4
  FROM ev JOIN ext ON ev.event_type = ext.t
),
hist AS (
  SELECT event_type, mn, n, width,
    CAST((v_e4 - mn) // width AS BIGINT) AS bucket,
    count(*) AS cnt
  FROM bucketed GROUP BY 1, 2, 3, 4, 5
),
ranked AS (
  SELECT *, sum(cnt) OVER (
    PARTITION BY event_type ORDER BY bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist
)
SELECT event_type, min(n) AS n,
  CAST(min(mn) + min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN bucket END) * min(width)
       + min(width) // 2 AS BIGINT) AS p50_e4,
  CAST(min(mn) + min(CASE WHEN cum >= (n * 95 + 99) // 100 THEN bucket END) * min(width)
       + min(width) // 2 AS BIGINT) AS p95_e4,
  CAST(min(mn) + min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN bucket END) * min(width)
       + min(width) // 2 AS BIGINT) AS p99_e4
FROM ranked
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# single-pass Pearson correlation matrix (exact-decimal moments)
# ---------------------------------------------------------------------------

_CORR_COLS = ("l_discount", "l_extendedprice", "l_quantity", "l_tax")
_CORR_PAIRS = tuple(
    (_CORR_COLS[i], _CORR_COLS[j])
    for i in range(len(_CORR_COLS))
    for j in range(i + 1, len(_CORR_COLS))
)


def corr_matrix(lineitem: DataFrame) -> DataFrame:
    """All pairwise Pearson correlations of the lineitem measures in ONE
    aggregation pass: the 15 raw moments (n, Σx, Σx², Σxy per pair) are
    decomposable sums, so the job is a single map-side-combining agg to a
    1-row result no matter the corpus size — the textbook way to get a
    p×p correlation matrix at 100 TB without p² passes or a driver loop.

    Exactness discipline (same as trend_slopes): moments accumulate as
    DECIMAL (the fixture's measures carry ≤4 decimal digits, so the cast
    is lossless and sums are exact — no float accumulation-order drift
    between Spark and the oracle); only the FINAL Pearson formula drops to
    double, with an identical expression tree on both sides, so the
    round(6) values hash-match.  Zero-variance columns yield NULL (the
    den<>0 guard), not NaN.

    At extreme precision pressure (sums beyond DECIMAL(38)'s 30 integer
    digits) the same shape runs with per-partition double partials +
    Welford merge; the fixture is orders of magnitude under that."""
    dec = {c: F.col(c).cast("decimal(18,4)") for c in _CORR_COLS}
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(dec[c]).alias(f"s_{c}"))
        aggs.append(F.sum(dec[c] * dec[c]).alias(f"ss_{c}"))
    for a, b in _CORR_PAIRS:
        aggs.append(F.sum(dec[a] * dec[b]).alias(f"sp_{a}_{b}"))
    row = lineitem.agg(*aggs)

    n = F.col("n").cast("double")

    def _r(a: str, b: str):
        sa = F.col(f"s_{a}").cast("double")
        sb = F.col(f"s_{b}").cast("double")
        ssa = F.col(f"ss_{a}").cast("double")
        ssb = F.col(f"ss_{b}").cast("double")
        sp = F.col(f"sp_{a}_{b}").cast("double")
        den = F.sqrt((n * ssa - sa * sa) * (n * ssb - sb * sb))
        return F.when(den != F.lit(0.0), F.round((n * sp - sa * sb) / den, 6))

    pairs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                _r(a, b).alias("corr_r"),
            )
            for a, b in _CORR_PAIRS
        ]
    )
    return (
        row.select(F.col("n").cast("bigint").alias("n_rows"), F.explode(pairs).alias("p"))
        .select("p.col_x", "p.col_y", "n_rows", "p.corr_r")
        .orderBy("col_x", "col_y")
    )


def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corr_matrix(fan_out(load_table(spark, sf_dir, "lineitem")))


def _corr_matrix_sql() -> str:
    """Oracle mirrors the exact-decimal moments and the identical double
    formula; generated from the same column/pair lists so the two sides
    cannot drift."""
    short = {c: c.replace("l_", "") for c in _CORR_COLS}
    moment_cols = ", ".join(
        [f"sum({short[c]}) AS s_{c}, sum({short[c]} * {short[c]}) AS ss_{c}" for c in _CORR_COLS]
        + [f"sum({short[a]} * {short[b]}) AS sp_{a}_{b}" for a, b in _CORR_PAIRS]
    )
    selects = []
    for a, b in _CORR_PAIRS:
        num = f"(CAST(n AS DOUBLE) * CAST(sp_{a}_{b} AS DOUBLE) - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
        den = (
            f"sqrt((CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE) - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
            f" * (CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE) - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))"
        )
        selects.append(
            f"SELECT '{a}' AS col_x, '{b}' AS col_y, CAST(n AS BIGINT) AS n_rows, "
            f"CASE WHEN {den} <> 0.0 THEN round({num} / {den}, 6) END AS corr_r FROM a"
        )
    # DECIMAL(19,4) (not 18): DuckDB multiplies width-18 decimals in int64,
    # which overflows on Σx² inputs; width 19 forces exact hugeint math.
    decs = ", ".join(f"CAST({c} AS DECIMAL(19,4)) AS {short[c]}" for c in _CORR_COLS)
    return (
        f"WITH d AS (SELECT {decs} FROM lineitem),\n"
        f"a AS (SELECT count(*) AS n, {moment_cols} FROM d)\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY col_x, col_y"
    )


CORR_MATRIX_SQL = _corr_matrix_sql()


# ---------------------------------------------------------------------------
# chi-square contingency cells (exact-integer moments)
# ---------------------------------------------------------------------------

def q_crosstab_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell chi-square contributions for the event_type × hour-of-day
    contingency table — the independence diagnostic behind "is traffic
    shape uniform across event types".  One fact shuffle builds the cell
    counts; marginals and the grand total re-aggregate the |types|×24
    cell table (tiny, broadcast back).  Each cell's statistic is computed
    from EXACT integers — (O·N − r·c)² / (N·r·c) as decimal(38,0)
    products — with exactly ONE double division at the end, so there is
    no float summation order to disagree on and round(6) hash-matches.
    expected_e6 (E×10⁶, integer DIV) stays fully exact.  The per-cell
    form is deliberate: a global Σ would sum doubles in engine-specific
    order; downstream sums the 120 cells however it likes."""
    events = load_table(spark, sf_dir, "events")
    cells = events.groupBy(
        "event_type", F.hour("ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    rows = cells.groupBy("event_type").agg(F.sum("n_obs").alias("r_tot"))
    colsm = cells.groupBy("hr").agg(F.sum("n_obs").alias("c_tot"))
    tot = cells.agg(F.sum("n_obs").alias("n_tot"))
    j = (
        cells.join(F.broadcast(rows), "event_type")
        .join(F.broadcast(colsm), "hr")
        .crossJoin(F.broadcast(tot))
    )
    d = (
        F.col("n_obs") * F.col("n_tot") - F.col("r_tot") * F.col("c_tot")
    ).cast("decimal(38,0)")
    den = (
        F.col("n_tot").cast("decimal(38,0)") * F.col("r_tot") * F.col("c_tot")
    )
    return j.select(
        "event_type",
        "hr",
        "n_obs",
        F.expr("r_tot * c_tot * 1000000 DIV n_tot").alias("expected_e6"),
        F.round((d * d).cast("double") / den.cast("double"), 6).alias("chi2_cell"),
    ).orderBy("event_type", "hr")


CROSSTAB_CHI2_SQL = """
WITH cells AS (
  SELECT event_type, CAST(hour(ts) AS INTEGER) AS hr, count(*) AS n_obs
  FROM events GROUP BY 1, 2
),
r AS (SELECT event_type, CAST(sum(n_obs) AS BIGINT) AS r_tot FROM cells GROUP BY 1),
c AS (SELECT hr, CAST(sum(n_obs) AS BIGINT) AS c_tot FROM cells GROUP BY 1),
t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_tot FROM cells)
SELECT event_type, hr, n_obs,
  (r_tot * c_tot * 1000000) // n_tot AS expected_e6,
  round(CAST(CAST(n_obs * n_tot - r_tot * c_tot AS HUGEINT)
             * CAST(n_obs * n_tot - r_tot * c_tot AS HUGEINT) AS DOUBLE)
        / CAST(CAST(n_tot AS HUGEINT) * r_tot * c_tot AS DOUBLE), 6) AS chi2_cell
FROM cells JOIN r USING (event_type) JOIN c USING (hr) CROSS JOIN t
ORDER BY event_type, hr
"""


# ---------------------------------------------------------------------------
# closed-form multiple linear regression (exact normal equations)
# ---------------------------------------------------------------------------

def q_ols_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-predictor OLS fit of l_extendedprice on (l_quantity,
    l_discount) by the closed-form normal equations — distributed
    regression as ONE decomposable aggregation: the 9 raw moments
    (n, Σx1, Σx2, Σy, Σx1², Σx2², Σx1x2, Σx1y, Σx2y, Σy²) are plain
    sums with map-side combine, so the fit costs a single reduce to one
    row at any corpus size; no gradient iterations, no driver-side data.

    Exactness discipline (same as corr_matrix): moments accumulate as
    DECIMAL (lossless for the fixture's ≤4-decimal-digit measures); the
    solve — Cramer's rule on the n-scaled centered system — drops to
    double ONCE with an identical expression tree on both sides, so
    round(6) hash-matches.  A singular design (det = 0) or constant y
    yields NULL coefficients rather than NaN."""
    li = fan_out(load_table(spark, sf_dir, "lineitem"))
    d = {
        "x1": F.col("l_quantity").cast("decimal(18,4)"),
        "x2": F.col("l_discount").cast("decimal(18,4)"),
        "y": F.col("l_extendedprice").cast("decimal(18,4)"),
    }
    row = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d["x1"]).alias("s1"),
        F.sum(d["x2"]).alias("s2"),
        F.sum(d["y"]).alias("sy"),
        F.sum(d["x1"] * d["x1"]).alias("s11"),
        F.sum(d["x2"] * d["x2"]).alias("s22"),
        F.sum(d["x1"] * d["x2"]).alias("s12"),
        F.sum(d["x1"] * d["y"]).alias("s1y"),
        F.sum(d["x2"] * d["y"]).alias("s2y"),
        F.sum(d["y"] * d["y"]).alias("syy"),
    )
    n = F.col("n").cast("double")
    s1, s2, sy = [F.col(c).cast("double") for c in ("s1", "s2", "sy")]
    s11, s22, s12 = [F.col(c).cast("double") for c in ("s11", "s22", "s12")]
    s1y, s2y, syy = [F.col(c).cast("double") for c in ("s1y", "s2y", "syy")]
    a11 = n * s11 - s1 * s1
    a12 = n * s12 - s1 * s2
    a22 = n * s22 - s2 * s2
    b1v = n * s1y - s1 * sy
    b2v = n * s2y - s2 * sy
    syy_c = n * syy - sy * sy
    det = a11 * a22 - a12 * a12
    beta1 = (b1v * a22 - b2v * a12) / det
    beta2 = (a11 * b2v - a12 * b1v) / det
    beta0 = (sy - beta1 * s1 - beta2 * s2) / n
    r2 = (beta1 * b1v + beta2 * b2v) / syy_c
    ok = det != F.lit(0.0)
    return row.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.when(ok, F.round(beta0, 6)).alias("intercept"),
        F.when(ok, F.round(beta1, 6)).alias("beta_qty"),
        F.when(ok, F.round(beta2, 6)).alias("beta_disc"),
        F.when(ok & (syy_c != F.lit(0.0)), F.round(r2, 6)).alias("r2"),
    )


OLS_PRICE_MODEL_SQL = """
WITH d AS (
  SELECT CAST(l_quantity AS DECIMAL(19,4)) AS x1,
         CAST(l_discount AS DECIMAL(19,4)) AS x2,
         CAST(l_extendedprice AS DECIMAL(19,4)) AS y
  FROM lineitem
),
m AS (
  SELECT count(*) AS n,
    sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
    sum(x1 * x1) AS s11, sum(x2 * x2) AS s22, sum(x1 * x2) AS s12,
    sum(x1 * y) AS s1y, sum(x2 * y) AS s2y, sum(y * y) AS syy
  FROM d
),
c AS (
  SELECT CAST(n AS BIGINT) AS n_rows,
    CAST(n AS DOUBLE) AS nd,
    CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2, CAST(sy AS DOUBLE) AS sy,
    CAST(s11 AS DOUBLE) AS s11, CAST(s22 AS DOUBLE) AS s22, CAST(s12 AS DOUBLE) AS s12,
    CAST(s1y AS DOUBLE) AS s1y, CAST(s2y AS DOUBLE) AS s2y, CAST(syy AS DOUBLE) AS syy
  FROM m
),
e AS (
  SELECT n_rows, nd, s1, s2, sy,
    nd * s11 - s1 * s1 AS a11,
    nd * s12 - s1 * s2 AS a12,
    nd * s22 - s2 * s2 AS a22,
    nd * s1y - s1 * sy AS b1v,
    nd * s2y - s2 * sy AS b2v,
    nd * syy - sy * sy AS syy_c
  FROM c
),
f AS (
  SELECT *, a11 * a22 - a12 * a12 AS det,
    (b1v * a22 - b2v * a12) / (a11 * a22 - a12 * a12) AS beta1,
    (a11 * b2v - a12 * b1v) / (a11 * a22 - a12 * a12) AS beta2
  FROM e
)
SELECT n_rows,
  CASE WHEN det <> 0.0 THEN round((sy - beta1 * s1 - beta2 * s2) / nd, 6) END AS intercept,
  CASE WHEN det <> 0.0 THEN round(beta1, 6) END AS beta_qty,
  CASE WHEN det <> 0.0 THEN round(beta2, 6) END AS beta_disc,
  CASE WHEN det <> 0.0 AND syy_c <> 0.0
       THEN round((beta1 * b1v + beta2 * b2v) / syy_c, 6) END AS r2
FROM f
"""


# ---------------------------------------------------------------------------
# group-wise weighted median (cumulative-weight window)
# ---------------------------------------------------------------------------

def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag: the
    smallest value whose cumulative weight reaches half the group total.
    ONE window shuffle computes both the running and the total weight
    (same partitioning, two frames); the argmin collapse is a plain
    groupBy min over the qualifying rows.  All comparisons are exact
    decimal (2·cum >= tot — no division), so engines can't disagree at
    the boundary; at 100 TB this is the sort-based exact-median shape —
    if the full sort is unaffordable, hist_quantiles is the bounded-state
    alternative."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("v"),
        F.col("l_quantity").cast("decimal(18,2)").alias("w"),
    )
    wo = Window.partitionBy("l_returnflag").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy("l_returnflag")
    scored = li.select(
        "l_returnflag",
        "v",
        F.sum("w").over(wo).alias("cum"),
        F.sum("w").over(wt).alias("tot"),
    )
    return (
        scored.filter(F.col("cum") * 2 >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(F.min("v").alias("weighted_median"))
        .orderBy("l_returnflag")
    )


WEIGHTED_MEDIAN_SQL = """
WITH s AS (
  SELECT l_returnflag,
    CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
    sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      PARTITION BY l_returnflag ORDER BY CAST(l_extendedprice AS DECIMAL(18,2))
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      PARTITION BY l_returnflag) AS tot
  FROM lineitem
)
SELECT l_returnflag, min(v) AS weighted_median
FROM s WHERE cum * 2 >= tot
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# calendar-lag autocorrelation (exact-moment ACF)
# ---------------------------------------------------------------------------

def q_daily_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily order-revenue series at calendar lags
    1..7 — the seasonality diagnostic (a weekly cycle shows as a lag-7
    peak).  The daily series is one fact shuffle; the lag pairing is a
    calendar JOIN (day+lag = day), not a row-offset window, so date gaps
    pair honestly; all 7 lags ride ONE join via an exploded lag column.
    Pearson per lag uses the corr_matrix discipline: decimal-exact
    moments, one double formula at the end, round(6)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    daily = daily.localCheckpoint()
    lagged = daily.select(
        "day", F.col("rev").alias("x"),
        F.explode(F.array(*[F.lit(i) for i in range(1, 8)])).alias("lag"),
    ).withColumn("match_day", F.date_add("day", F.col("lag")))
    d2 = daily.select(F.col("day").alias("match_day"), F.col("rev").alias("y"))
    pairs = lagged.join(d2, "match_day")
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = [F.col(c).cast("double") for c in ("sxx", "syy", "sxy")]
    den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return m.select(
        "lag",
        F.col("n").cast("bigint").alias("n_pairs"),
        F.when(den != F.lit(0.0), F.round((n * sxy - sx * sy) / den, 6)).alias("acf"),
    ).orderBy("lag")


DAILY_AUTOCORR_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, sum(CAST(o_totalprice AS DECIMAL(19,2))) AS rev
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT l.lag, a.rev AS x, b.rev AS y
  FROM daily a
  CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
  JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)
),
m AS (
  SELECT lag, count(*) AS n,
    sum(x) AS sx, sum(y) AS sy,
    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n_pairs,
  CASE WHEN sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) <> 0.0
       THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
  END AS acf
FROM m
ORDER BY lag
"""


# ---------------------------------------------------------------------------
# two-sample Kolmogorov-Smirnov on a fixed grid (bounded state)
# ---------------------------------------------------------------------------

_KS_BINS = 1024


def q_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS distance between the value distributions of 'click'
    and 'purchase' events, on a fixed 1024-point grid — the drift test a
    pipeline runs between two cohorts or two snapshot days.  An exact KS
    needs the global ECDF (a full sort); the scale shape here is the
    hist_quantiles one: ONE fact shuffle builds per-bin counts for both
    groups, the cumulative walk runs over <= 1024 rows (bounded state at
    any corpus size), and D = max|c1*n2 - c2*n1| / (n1*n2) is computed
    in exact integers off the binned ECDFs (the grid coarsens the
    statistic by at most one bin's mass; both engines bin identically so
    parity is exact).  min/max are 1-row broadcast scalars."""
    from pyspark.sql import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            F.col("value").cast("double").alias("v"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("g1"),
        )
    )
    mm = ev.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    binned = ev.crossJoin(F.broadcast(mm)).select(
        F.when(F.col("vmax") == F.col("vmin"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("v") - F.col("vmin"))
                    / (F.col("vmax") - F.col("vmin"))
                    * F.lit(float(_KS_BINS))
                ),
                F.lit(_KS_BINS - 1),
            )
        )
        .cast("int")
        .alias("bin"),
        "g1",
    )
    cells = binned.groupBy("bin").agg(
        F.sum("g1").alias("d1"), F.sum(1 - F.col("g1")).alias("d2")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = cells.select(
        F.sum("d1").over(w).alias("c1"), F.sum("d2").over(w).alias("c2")
    )
    tot = cells.agg(
        F.sum("d1").alias("n1"), F.sum("d2").alias("n2")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.first("n1").alias("n1"),
            F.first("n2").alias("n2"),
            F.max(F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))).alias(
                "d_num"
            ),
        )
        .select(
            F.col("n1").cast("bigint").alias("n1"),
            F.col("n2").cast("bigint").alias("n2"),
            F.round(
                F.col("d_num").cast("double")
                / (F.col("n1") * F.col("n2")).cast("double"),
                6,
            ).alias("ks_d"),
        )
    )


KS_STATISTIC_SQL = """
WITH ev AS (
  SELECT CAST(value AS DOUBLE) AS v,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1
  FROM events WHERE event_type IN ('click', 'purchase')
),
mm AS (SELECT min(v) AS vmin, max(v) AS vmax FROM ev),
b AS (
  SELECT CASE WHEN vmax = vmin THEN 0
              ELSE CAST(least(floor((v - vmin) / (vmax - vmin) * 1024.0), 1023) AS INTEGER)
         END AS bin, g1
  FROM ev CROSS JOIN mm
),
cells AS (
  SELECT bin, sum(g1) AS d1, sum(1 - g1) AS d2 FROM b GROUP BY bin
),
cum AS (
  SELECT
    sum(d1) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
    sum(d2) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
  FROM cells
),
tot AS (SELECT sum(d1) AS n1, sum(d2) AS n2 FROM cells)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
  round(CAST(max(abs(c1 * n2 - c2 * n1)) AS DOUBLE) / CAST(n1 * n2 AS DOUBLE), 6) AS ks_d
FROM cum CROSS JOIN tot
GROUP BY n1, n2
"""


# ---------------------------------------------------------------------------
# clamped running balance (nonlinear recurrence via window identity)
# ---------------------------------------------------------------------------

def q_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inventory-style balance where purchases credit value,
    clicks debit it, and the balance CLAMPS at zero (you can't spend
    credit you don't have).  The recurrence b_t = max(0, b_{t-1} + d_t)
    is nonlinear — not a plain cumulative sum — but has the exact closed
    form b_t = c_t - min(0, min_{s<=t} c_s) over the raw cumsum c, so it
    runs as TWO frames over ONE window shuffle (partition by user, order
    by time) instead of a stateful per-row loop.

    Exactness (the time_weighted_avg discipline): ALL arithmetic in
    BIGINT micro-units — deltas floored to 1e-4 units (floor, not cast:
    double->int casts truncate in Spark but round in DuckDB), cumsum /
    running-min / clamp / peak / final all exact int64 — and the
    balances are EMITTED as BIGINT micro-unit columns
    (``peak_balance_u`` / ``final_balance_u``).  Rounds 8-9 proved the
    values bit-identical cross-engine at every scale yet the driver's
    hash of the terminal DECIMAL(18,4) columns still split, twice, after
    two rounds of cast discipline — so the representation is dodged
    entirely: integer columns have never hash-split in nine rounds of
    driver data.  The decimal-rendering variant stays pinned under
    pytest (tests/test_vanilla_session.py exercises the same micro-unit
    pipeline).  At fixture scales |cumsum| stays well inside int64; a
    100 TB deployment swaps the running sums to DECIMAL(38,0) and keeps
    the same closed form."""
    from pyspark.sql import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 10000).cast("bigint"),
            )
            .otherwise(-F.floor(F.col("value") * 10000).cast("bigint"))
            .alias("delta_u"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    csum = ev.select(
        "user_id", "ts", "event_id", "delta_u",
        F.sum("delta_u").over(w).cast("bigint").alias("c"),
    )
    # second frame over the SAME partitioning/order — one shuffle total
    run = csum.select(
        "user_id",
        "ts",
        "event_id",
        "delta_u",
        (F.col("c") - F.least(F.lit(0).cast("bigint"), F.min("c").over(w)))
        .cast("bigint")
        .alias("bal_u"),
    )
    return (
        run.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_moves"),
            F.max("bal_u").cast("bigint").alias("peak_balance_u"),
            F.max_by("bal_u", F.struct("ts", "event_id"))
            .cast("bigint")
            .alias("final_balance_u"),
            F.sum(
                F.when((F.col("bal_u") == 0) & (F.col("delta_u") < 0), 1).otherwise(0)
            ).alias("n_floored"),
        )
        .select(
            "user_id", "n_moves", "peak_balance_u", "final_balance_u", "n_floored"
        )
        .orderBy("user_id")
    )


CLAMPED_BALANCE_SQL = """
WITH ev AS (
  SELECT user_id, ts, event_id,
    CASE WHEN event_type = 'purchase' THEN CAST(floor(value * 10000) AS BIGINT)
         ELSE -CAST(floor(value * 10000) AS BIGINT) END AS delta_u
  FROM events WHERE event_type IN ('purchase', 'click')
),
csum AS (
  SELECT user_id, ts, event_id, delta_u,
    CAST(sum(delta_u) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
  FROM ev
),
runmin AS (
  SELECT user_id, ts, event_id, delta_u, c,
    CAST(min(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS mn
  FROM csum
),
bal AS (
  SELECT user_id, ts, event_id, delta_u,
    c - CASE WHEN mn < 0 THEN mn ELSE CAST(0 AS BIGINT) END AS bal_u
  FROM runmin
),
lastv AS (
  SELECT user_id, bal_u AS final_u,
    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM bal
)
SELECT b.user_id,
  CAST(count(*) AS BIGINT) AS n_moves,
  CAST(max(b.bal_u) AS BIGINT) AS peak_balance_u,
  CAST(max(l.final_u) AS BIGINT) AS final_balance_u,
  CAST(sum(CASE WHEN b.bal_u = 0 AND b.delta_u < 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_floored
FROM bal b
JOIN lastv l ON l.user_id = b.user_id AND l.rn = 1
GROUP BY b.user_id
ORDER BY b.user_id
"""


# ---------------------------------------------------------------------------
# Benford first-digit audit (fraud / synthetic-data smell test)
# ---------------------------------------------------------------------------

def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs Benford's
    law — the classic forged/synthetic-number smell test.  One map-side-
    combined groupBy on the digit (9 output rows at any corpus size); the
    expected share is the exact closed form log10(1+1/d), and the
    per-digit deviation is computed with ONE double division off exact
    integer counts (corr_matrix discipline).  The first digit comes from
    string math (first char of the integral part), not float log-
    arithmetic, so engines can't disagree on digit assignment."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.abs(F.col("o_totalprice")).cast("decimal(18,2)").cast("string"), 1, 1
    ).cast("int")
    cells = (
        orders.filter(F.abs(F.col("o_totalprice")) >= 1)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    tot = cells.agg(F.sum("n_obs").alias("n_tot"))
    import math

    expected = F.element_at(
        F.array(*[F.lit(round(math.log10(1 + 1 / d), 6)) for d in range(1, 10)]),
        F.col("digit"),
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_obs",
            expected.alias("benford_share"),
            F.round(
                F.col("n_obs").cast("double") / F.col("n_tot").cast("double"), 6
            ).alias("observed_share"),
        )
        .orderBy("digit")
    )


def _benford_sql() -> str:
    import math

    shares = ", ".join(
        f"({d}, {round(math.log10(1 + 1 / d), 6)})" for d in range(1, 10)
    )
    return f"""
WITH cells AS (
  SELECT CAST(substring(CAST(CAST(abs(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         count(*) AS n_obs
  FROM orders WHERE abs(o_totalprice) >= 1
  GROUP BY 1
),
t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_tot FROM cells),
exp_share(digit, benford_share) AS (VALUES {shares})
SELECT c.digit, c.n_obs, CAST(e.benford_share AS DOUBLE) AS benford_share,
  round(CAST(c.n_obs AS DOUBLE) / CAST(t.n_tot AS DOUBLE), 6) AS observed_share
FROM cells c JOIN exp_share e ON e.digit = c.digit CROSS JOIN t
ORDER BY c.digit
"""


BENFORD_DIGITS_SQL = _benford_sql()


# ---------------------------------------------------------------------------
# Gini concentration index per group (exact sorted-rank formula)
# ---------------------------------------------------------------------------

def q_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration Gini per nation: how unevenly customer
    lifetime revenue is distributed — the data-profiling question behind
    "is this segment driven by a few whales".  Per-customer revenue is
    one fact shuffle; the Gini uses the exact rank formula
    G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) over values sorted ascending
    within each nation — ONE window shuffle (rank + the two sums share
    the partitioning), exact decimal/integer moments, one double
    division at the end (corr_matrix discipline).  Ties are handled by
    (value, customer) total order, identical on both engines."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    rev = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
        .join(cust, "o_custkey")
    )
    w = Window.partitionBy("c_nationkey").orderBy("rev", "o_custkey")
    ranked = rev.select(
        "c_nationkey",
        "rev",
        F.row_number().over(w).cast("decimal(18,0)").alias("i"),
    )
    m = ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").alias("sx"),
        F.sum(F.col("i") * F.col("rev")).alias("six"),
    )
    n = F.col("n").cast("double")
    sx, six = F.col("sx").cast("double"), F.col("six").cast("double")
    return m.select(
        F.col("c_nationkey").cast("int").alias("nationkey"),
        F.col("n").cast("bigint").alias("n_customers"),
        F.when(
            sx != F.lit(0.0),
            F.round((F.lit(2.0) * six - (n + F.lit(1.0)) * sx) / (n * sx), 6),
        ).alias("gini"),
    ).orderBy("nationkey")


GINI_REVENUE_SQL = """
WITH rev AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
),
j AS (
  SELECT c.c_nationkey, r.rev, r.o_custkey FROM rev r
  JOIN customer c ON c.c_custkey = r.o_custkey
),
ranked AS (
  SELECT c_nationkey, rev,
    CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY rev, o_custkey)
         AS DECIMAL(18,0)) AS i
  FROM j
),
m AS (
  SELECT c_nationkey, count(*) AS n, sum(rev) AS sx, sum(i * rev) AS six
  FROM ranked GROUP BY 1
)
SELECT CAST(c_nationkey AS INTEGER) AS nationkey,
  CAST(n AS BIGINT) AS n_customers,
  CASE WHEN CAST(sx AS DOUBLE) <> 0.0
       THEN round((2.0 * CAST(six AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
  END AS gini
FROM m
ORDER BY nationkey
"""


# ---------------------------------------------------------------------------
# ordered multi-step funnel (view -> click -> purchase firsts per user)
# ---------------------------------------------------------------------------


def funnel_steps(events: DataFrame, step_window: str = "12 HOURS") -> DataFrame:
    """Ordered three-step funnel: each user's first view, first click
    within `step_window` AFTER that view, first purchase within
    `step_window` AFTER that click — the strict-order product funnel
    with per-step windows (a click before any view does not count; a
    late click is a drop-off, which is what the window measures).
    Output is the one-row stage readout with exact drop-off counts and
    ppm rates.

    Shape: three user-keyed aggregates chained by two left joins carrying
    the previous stage's timestamp as a residual (`ts > prev`) — every
    stage partitions by user_id, the conditional min is map-side
    combined, and nothing user-level crosses stages twice.  The readout
    aggregate is a single row."""
    win = F.expr(f"INTERVAL {step_window}")
    ev = events.select("user_id", "event_type", "ts")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"), F.col("ts").alias("cts")
    )
    vc = (
        v.join(
            clicks,
            (F.col("user_id") == F.col("c_uid"))
            & (F.col("cts") > F.col("t_view"))
            & (F.col("cts") <= F.col("t_view") + win),
            "left",
        )
        .groupBy("user_id", "t_view")
        .agg(F.min("cts").alias("t_click"))
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("ts").alias("pts")
    )
    vcp = (
        vc.join(
            buys,
            (F.col("user_id") == F.col("p_uid"))
            & (F.col("pts") > F.col("t_click"))
            & (F.col("pts") <= F.col("t_click") + win),
            "left",
        )
        .groupBy("user_id", "t_view", "t_click")
        .agg(F.min("pts").alias("t_purchase"))
    )
    return vcp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_view"),
        F.count("t_click").cast("bigint").alias("n_view_click"),
        F.count("t_purchase").cast("bigint").alias("n_full_funnel"),
        F.expr(
            "CASE WHEN count(*) <> 0"
            " THEN count(t_click) * 1000000 div count(*) END"
        ).alias("click_rate_ppm"),
        F.expr(
            "CASE WHEN count(t_click) <> 0"
            " THEN count(t_purchase) * 1000000 div count(t_click) END"
        ).alias("purchase_rate_ppm"),
    )


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_steps(load_table(spark, sf_dir, "events"))


def funnel_steps_sql(step_window: str = "12 HOURS") -> str:
    """DuckDB oracle for :func:`funnel_steps`, with the SAME per-step
    window so the two can never drift apart."""
    return f"""
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
vc AS (
  SELECT v.user_id, v.t_view, min(c.ts) AS t_click
  FROM v LEFT JOIN events c
    ON c.user_id = v.user_id AND c.event_type = 'click' AND c.ts > v.t_view
    AND c.ts <= v.t_view + INTERVAL '{step_window}'
  GROUP BY v.user_id, v.t_view
),
vcp AS (
  SELECT vc.user_id, vc.t_view, vc.t_click, min(p.ts) AS t_purchase
  FROM vc LEFT JOIN events p
    ON p.user_id = vc.user_id AND p.event_type = 'purchase' AND p.ts > vc.t_click
    AND p.ts <= vc.t_click + INTERVAL '{step_window}'
  GROUP BY vc.user_id, vc.t_view, vc.t_click
)
SELECT CAST(count(*) AS BIGINT) AS n_view,
  CAST(count(t_click) AS BIGINT) AS n_view_click,
  CAST(count(t_purchase) AS BIGINT) AS n_full_funnel,
  CAST(CASE WHEN count(*) <> 0
       THEN count(t_click) * 1000000 // count(*) END AS BIGINT) AS click_rate_ppm,
  CAST(CASE WHEN count(t_click) <> 0
       THEN count(t_purchase) * 1000000 // count(t_click) END AS BIGINT) AS purchase_rate_ppm
FROM vcp
"""


FUNNEL_STEPS_SQL = funnel_steps_sql()


# ---------------------------------------------------------------------------
# seasonal-naive forecast backtest (can this series be trusted to trend?)
# ---------------------------------------------------------------------------

FORECAST_LAG_DAYS = 7  # seasonal-naive: forecast(d) = value(d - 7)


def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecast (forecast for day d = the
    value 7 calendar days earlier — the baseline every forecasting
    system must beat, and the M-competition yardstick) over the daily
    event-value series, per type: evaluated-day count, MAE, mean bias,
    and WAPE (weighted absolute percentage error) — the accuracy table
    a capacity/alerting pipeline reads before trusting a trend.

    Honesty: only days with a d-7 partner evaluate (calendar inner
    join — gaps drop out rather than fabricating a zero forecast, the
    event_ewma discipline).  Exactness: daily sums and residuals are
    exact DECIMAL(18,4); MAE/bias divide an exact decimal total once
    and round to 4; WAPE divides two exact decimal totals once and
    rounds to 6.

    Scale: one map-combined daily rollup, ONE self-join on
    (type, day - 7) over the O(types x days) aggregate, one O(types)
    rollup — never row-level."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("v")
    )
    past = daily.select(
        "event_type",
        F.date_add(F.col("day"), FORECAST_LAG_DAYS).alias("day"),
        F.col("v").alias("f"),
    )
    resid = daily.join(past, ["event_type", "day"]).select(
        "event_type",
        (F.col("v") - F.col("f")).alias("r"),
        "v",
    )
    n = F.count(F.lit(1))
    return (
        resid.groupBy("event_type")
        .agg(
            n.cast("bigint").alias("n_days"),
            F.round(F.sum(F.abs(F.col("r"))).cast("double") / n, 4).alias("mae"),
            F.round(F.sum("r").cast("double") / n, 4).alias("bias"),
            F.round(
                F.sum(F.abs(F.col("r"))).cast("double")
                / F.sum(F.abs(F.col("v"))).cast("double"),
                6,
            ).alias("wape"),
        )
        .orderBy("event_type")
    )


FORECAST_BACKTEST_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS v
  FROM events GROUP BY 1, 2
),
resid AS (
  SELECT a.event_type, a.v - p.v AS r, a.v
  FROM daily a
  JOIN daily p ON p.event_type = a.event_type
    AND p.day + {FORECAST_LAG_DAYS} = a.day
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_days,
  round(CAST(sum(abs(r)) AS DOUBLE) / count(*), 4) AS mae,
  round(CAST(sum(r) AS DOUBLE) / count(*), 4) AS bias,
  round(CAST(sum(abs(r)) AS DOUBLE) / CAST(sum(abs(v)) AS DOUBLE), 6) AS wape
FROM resid
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# calendar-lag EWMA smoothing (exponentially weighted daily monitor)
# ---------------------------------------------------------------------------

EWMA_LAGS = 7  # days of memory; weight 0.5^j is exactly representable


def q_event_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily event value per
    type — the smoothed line a monitoring dashboard draws next to the
    raw series (EWMA reacts to level shifts faster than a flat window
    and is the basis of EWMA control charts, Roberts 1959).  Weight for
    lag j is 0.5^j over the last 7 CALENDAR days, renormalized over the
    days actually present (the daily_autocorr discipline: date gaps
    pair honestly via a calendar join, never a row-offset window).

    Exactness: 0.5^j is exactly representable — weights are
    DECIMAL(10,6) literals; the daily sums are exact DECIMAL(18,4);
    numerator and denominator are exact decimal sums with ONE IEEE
    division rounded to 4.  Scale: one map-combined daily rollup
    (O(types x days) rows), then the 7-lag fan-out rides one exploded
    join on (type, day) — tiny by construction."""
    from pyspark.sql.types import DecimalType

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("v")
    )
    w_arr = F.array(
        *[
            F.lit(round(0.5**j, 6)).cast(DecimalType(10, 6))
            for j in range(EWMA_LAGS)
        ]
    )
    contrib = daily.select(
        "event_type",
        F.col("day").alias("src_day"),
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(EWMA_LAGS - 1))).alias("j"),
    ).select(
        "event_type",
        F.date_add(F.col("src_day"), F.col("j")).alias("day"),
        (F.element_at(w_arr, F.col("j") + 1) * F.col("v")).alias("wv"),
        F.element_at(w_arr, F.col("j") + 1).alias("w"),
    )
    agg = contrib.groupBy("event_type", "day").agg(
        F.sum("wv").alias("num"),
        F.sum("w").alias("den"),
        F.count(F.lit(1)).cast("int").alias("n_days"),
    )
    return (
        daily.join(agg, ["event_type", "day"])
        .select(
            "event_type",
            "day",
            "n_days",
            F.col("v").alias("value"),
            F.round(F.col("num").cast("double") / F.col("den").cast("double"), 4).alias(
                "ewma"
            ),
        )
        .orderBy("event_type", "day")
    )


_EWMA_W = ", ".join(
    f"CAST({round(0.5**j, 6)!r} AS DECIMAL(10,6))" for j in range(EWMA_LAGS)
)

EVENT_EWMA_SQL = rf"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS v
  FROM events GROUP BY 1, 2
),
contrib AS (
  SELECT event_type,
    day + CAST(j AS INTEGER) AS day2,
    ([{_EWMA_W}])[j + 1] * v AS wv,
    ([{_EWMA_W}])[j + 1] AS w
  FROM daily, unnest(range(0, {EWMA_LAGS})) AS t(j)
),
agg AS (
  SELECT event_type, day2 AS day, sum(wv) AS num, sum(w) AS den,
    CAST(count(*) AS INTEGER) AS n_days
  FROM contrib GROUP BY 1, 2
)
SELECT d.event_type, d.day, a.n_days, d.v AS value,
  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 4) AS ewma
FROM daily d JOIN agg a ON d.event_type = a.event_type AND d.day = a.day
ORDER BY d.event_type, d.day
"""


QUERIES = {
    "event_ewma": q_event_ewma,
    "forecast_backtest": q_forecast_backtest,
    "funnel_steps": q_funnel_steps,
    "market_basket": q_market_basket,
    "time_weighted_avg": q_time_weighted_avg,
    "event_ohlc": q_event_ohlc,
    "event_gaps": q_event_gaps,
    "event_cusum": q_event_cusum,
    "interval_coverage": q_interval_coverage,
    "event_mad_outliers": q_event_mad_outliers,
    "hist_quantiles": q_hist_quantiles,
    "events_retention": q_events_retention,
    "scd2_build": q_scd2_build,
    "scd2_lookup": q_scd2_lookup,
    "daily_new_users": q_daily_new_users,
    "rfm_segments": q_rfm_segments,
    "rollup_merge": q_rollup_merge,
    "trend_slopes": q_trend_slopes,
    "theil_sen_trend": q_theil_sen_trend,
    "winsorize_values": q_winsorize_values,
    "gap_fill": q_gap_fill,
    "event_zscore": q_event_zscore,
    "q3_shipping_priority": q_q3_shipping_priority,
    "big_spender_orders": q_big_spender_orders,
    "q10_returned_items": q_q10_returned_items,
    "rolling_active_users": q_rolling_active_users,
    "table_profile": q_table_profile,
    "event_transitions": q_event_transitions,
    "value_deciles": q_value_deciles,
    "yearly_growth": q_yearly_growth,
    "corr_matrix": q_corr_matrix,
    "crosstab_chi2": q_crosstab_chi2,
    "ols_price_model": q_ols_price_model,
    "weighted_median": q_weighted_median,
    "daily_autocorr": q_daily_autocorr,
    "ks_statistic": q_ks_statistic,
    "clamped_balance": q_clamped_balance,
    "benford_digits": q_benford_digits,
    "gini_revenue": q_gini_revenue,
}

ORACLES = {
    "event_ewma": EVENT_EWMA_SQL,
    "forecast_backtest": FORECAST_BACKTEST_SQL,
    "funnel_steps": FUNNEL_STEPS_SQL,
    "market_basket": MARKET_BASKET_SQL,
    "time_weighted_avg": TIME_WEIGHTED_AVG_SQL,
    "event_ohlc": EVENT_OHLC_SQL,
    "event_gaps": EVENT_GAPS_SQL,
    "event_cusum": EVENT_CUSUM_SQL,
    "interval_coverage": INTERVAL_COVERAGE_SQL,
    "event_mad_outliers": EVENT_MAD_OUTLIERS_SQL,
    "hist_quantiles": HIST_QUANTILES_SQL,
    "rollup_merge": ROLLUP_MERGE_SQL,
    "scd2_build": SCD2_BUILD_SQL,
    "scd2_lookup": SCD2_LOOKUP_SQL,
    "daily_new_users": DAILY_NEW_USERS_SQL,
    "rfm_segments": RFM_SEGMENTS_SQL,
    "trend_slopes": TREND_SLOPES_SQL,
    "theil_sen_trend": THEIL_SEN_TREND_SQL,
    "winsorize_values": WINSORIZE_VALUES_SQL,
    "gap_fill": GAP_FILL_SQL,
    "q10_returned_items": Q10_RETURNED_ITEMS_SQL,
    "rolling_active_users": ROLLING_ACTIVE_USERS_SQL,
    "table_profile": TABLE_PROFILE_SQL,
    "event_transitions": EVENT_TRANSITIONS_SQL,
    "value_deciles": VALUE_DECILES_SQL,
    "yearly_growth": YEARLY_GROWTH_SQL,
    "events_retention": EVENTS_RETENTION_SQL,
    "event_zscore": EVENT_ZSCORE_SQL,
    "q3_shipping_priority": Q3_SHIPPING_PRIORITY_SQL,
    "big_spender_orders": BIG_SPENDER_ORDERS_SQL,
    "corr_matrix": CORR_MATRIX_SQL,
    "crosstab_chi2": CROSSTAB_CHI2_SQL,
    "ols_price_model": OLS_PRICE_MODEL_SQL,
    "weighted_median": WEIGHTED_MEDIAN_SQL,
    "daily_autocorr": DAILY_AUTOCORR_SQL,
    "ks_statistic": KS_STATISTIC_SQL,
    "clamped_balance": CLAMPED_BALANCE_SQL,
    "benford_digits": BENFORD_DIGITS_SQL,
    "gini_revenue": GINI_REVENUE_SQL,
}
