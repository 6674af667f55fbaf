"""Statistical inference over event streams: resampled uncertainty,
marketing attribution, and seasonal decomposition.

The reference reports point aggregates only (`pull_report.pl:88-104` emits
COUNT/MAX/AVG with no error bars); a pipeline feeding decisions (or
training-data mix choices) from those aggregates needs the uncertainty and
structure around them.  Three operators, all exact-parity oracled:

- **Poisson bootstrap CI** — the distributed bootstrap: instead of
  resampling n rows with replacement (which needs global coordination),
  each row independently receives a Poisson(1) replicate weight (Chamandy
  et al., "Estimating Uncertainty for Massive Data Streams", Google 2012).
  One pass, map-side, embarrassingly parallel — THE bootstrap shape that
  survives 100 TB.  Replicate weights come from an inverse-CDF ladder over
  an md5-derived uniform, so the oracle reproduces them bit-for-bit.
- **Last-touch attribution** — credit each conversion's value to the most
  recent preceding touch event within a lookback window.  One partitioned
  window over (user, time), never a global sort; the per-user event
  sequence is the partition, which is exactly how the data shards.
- **Day-of-week seasonal decomposition** — classic additive decomposition:
  trend = 7-day centered moving average of the daily rollup, seasonal =
  per-weekday mean deviation from trend.  The moving average is computed
  as an explode(+/-3)+re-aggregate on the O(days) daily table (a
  distributed shape with no global window); deviations stay in exact
  DECIMAL (scaled by 7 to avoid division) until one final double division.

All randomness is hash-derived (md5), so results are deterministic and
engine-portable — a production release would swap the salt per run.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realparse_spark.sources.tables import fan_out, load_table

_U32 = 1 << 32


def hash_u32(salt: str, *cols: Column) -> Column:
    """Uniform integer in [0, 2^32) from md5 over salt:col:col... — the
    portable seeded-uniform primitive (same construction as doc_split's
    md5 bucketing; DuckDB: CAST('0x' || substring(md5(...), 1, 8) AS
    BIGINT))."""
    parts: list[Column] = [F.lit(salt)]
    for c in cols:
        parts.append(c.cast("string"))
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", *parts)), 1, 8), 16, 10
    ).cast("long")


def _hash_u32_sql(salt: str, *exprs: str) -> str:
    concat = " || ':' || ".join(f"CAST({e} AS VARCHAR)" for e in exprs)
    return (
        f"CAST('0x' || substring(md5('{salt}:' || {concat}), 1, 8) AS BIGINT)"
    )


def cdf_thresholds(probs: list[float]) -> list[int]:
    """Integer inverse-CDF thresholds over the u32 domain for a discrete
    distribution: value k is chosen when u32 < thresholds[k] (first
    match); the last outcome is the ELSE branch.  Thresholds are plain
    integers embedded as literals in BOTH engines' expressions, so the
    sampled value is identical by construction."""
    total = sum(probs)
    acc, out = 0.0, []
    for p in probs[:-1]:
        acc += p
        out.append(min(_U32 - 1, int(acc / total * _U32)))
    return out


def _case_ladder(u: Column, thresholds: list[int], values: list) -> Column:
    expr = None
    for t, v in zip(thresholds, values[:-1]):
        expr = F.when(u < t, F.lit(v)) if expr is None else expr.when(u < t, F.lit(v))
    return expr.otherwise(F.lit(values[-1]))


def _case_ladder_sql(u_expr: str, thresholds: list[int], values: list) -> str:
    whens = " ".join(
        f"WHEN {u_expr} < {t} THEN {v}" for t, v in zip(thresholds, values[:-1])
    )
    return f"CASE {whens} ELSE {values[-1]} END"


# Poisson(1) replicate weights, inverse CDF truncated at 6 (tail mass
# ~1e-4 folded into the last bucket — bias far below bootstrap noise)
_POISSON_VALUES = list(range(7))
_POISSON_THRESHOLDS = cdf_thresholds(
    [math.exp(-1.0) / math.factorial(k) for k in range(6)] + [1.0 - sum(math.exp(-1.0) / math.factorial(k) for k in range(6))]
)

N_REPLICATES = 20


def poisson_bootstrap_ci(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_col: str,
    n_replicates: int = N_REPLICATES,
) -> DataFrame:
    """Per-group mean with a bootstrap interval: `n_replicates` Poisson-
    weighted replicate means per group; the CI is the 2nd smallest / 2nd
    largest replicate mean (a ~90% percentile interval at R=20, chosen by
    exact rank so both engines select the same replicate).

    100 TB shape: the explode multiplies rows R-fold BEFORE the shuffle,
    but the (group, replicate) aggregation is map-side combined, so the
    wire carries O(groups x R x partitions) partial rows — the R-fold
    cost is compute, not shuffle, and is inherent to the bootstrap.  No
    global state: every weight is a pure function of (key, replicate)."""
    v = F.col(value_col).cast("decimal(18,4)")
    base = df.select(
        F.col(group_col).alias("grp"), F.col(key_col).alias("k"), v.alias("v")
    )
    rep = base.withColumn(
        "r", F.explode(F.sequence(F.lit(1), F.lit(n_replicates)))
    )
    u = hash_u32("boot", F.col("k"), F.col("r"))
    w = _case_ladder(u, _POISSON_THRESHOLDS, _POISSON_VALUES).cast("long")
    means = (
        rep.withColumn("w", w)
        .groupBy("grp", "r")
        .agg(
            F.sum(F.col("v") * F.col("w")).alias("swx"),
            F.sum("w").alias("sw"),
        )
        # An all-zero-weight replicate (P ~ e^-n, only possible for tiny
        # groups) has no mean; drop it BEFORE ranking — Spark sorts NULLs
        # first on ASC while DuckDB sorts them last, so a NULL mean_r
        # would silently diverge cross-engine.
        .filter(F.col("sw") > 0)
        .select(
            "grp",
            "r",
            (F.col("swx").cast("double") / F.col("sw").cast("double")).alias(
                "mean_r"
            ),
        )
    )
    rn = F.row_number().over(Window.partitionBy("grp").orderBy("mean_r", "r"))
    rn_d = F.row_number().over(
        Window.partitionBy("grp").orderBy(F.desc("mean_r"), F.desc("r"))
    )
    ranked = means.withColumn("rn", rn).withColumn("rn_d", rn_d)
    ci = ranked.groupBy("grp").agg(
        F.round(F.max(F.when(F.col("rn") == 2, F.col("mean_r"))), 6).alias("ci_lo"),
        F.round(F.max(F.when(F.col("rn_d") == 2, F.col("mean_r"))), 6).alias(
            "ci_hi"
        ),
    )
    point = base.groupBy("grp").agg(
        F.round(
            F.sum("v").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_value"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    return (
        point.join(ci, "grp")
        .select(
            F.col("grp").alias(group_col), "n_rows", "mean_value", "ci_lo", "ci_hi"
        )
        .orderBy(group_col)
    )


def q_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap CI for the mean event value per event_type."""
    return poisson_bootstrap_ci(
        fan_out(load_table(spark, sf_dir, "events")), "event_type", "value", "event_id"
    )


def _poisson_bootstrap_sql() -> str:
    u = _hash_u32_sql("boot", "event_id", "r")
    ladder = _case_ladder_sql(u, _POISSON_THRESHOLDS, _POISSON_VALUES)
    return f"""
WITH base AS (
  SELECT event_type AS grp, event_id, CAST(value AS DECIMAL(18,4)) AS v
  FROM events
),
rep AS (
  SELECT grp, event_id, v, r, CAST({ladder} AS BIGINT) AS w
  FROM base, (SELECT unnest(generate_series(1, {N_REPLICATES})) AS r)
),
means AS (
  SELECT grp, r,
    CAST(sum(v * w) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS mean_r
  FROM rep GROUP BY grp, r
  HAVING sum(w) > 0
),
ranked AS (
  SELECT grp, r, mean_r,
    row_number() OVER (PARTITION BY grp ORDER BY mean_r, r) AS rn,
    row_number() OVER (PARTITION BY grp ORDER BY mean_r DESC, r DESC) AS rn_d
  FROM means
),
ci AS (
  SELECT grp,
    round(max(CASE WHEN rn = 2 THEN mean_r END), 6) AS ci_lo,
    round(max(CASE WHEN rn_d = 2 THEN mean_r END), 6) AS ci_hi
  FROM ranked GROUP BY grp
),
point AS (
  SELECT grp,
    round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS mean_value,
    CAST(count(*) AS BIGINT) AS n_rows
  FROM base GROUP BY grp
)
SELECT p.grp AS event_type, p.n_rows, p.mean_value, c.ci_lo, c.ci_hi
FROM point p JOIN ci c ON p.grp = c.grp
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# last-touch attribution
# ---------------------------------------------------------------------------

_TOUCH_TYPES = ("click", "view")
_CONVERSION = "purchase"
_LOOKBACK_DAYS = 7


def last_touch_attribution(
    events: DataFrame,
    touch_types: tuple[str, ...] = _TOUCH_TYPES,
    conversion: str = _CONVERSION,
    lookback_days: int = _LOOKBACK_DAYS,
) -> DataFrame:
    """Attribute each conversion's value to the user's most recent
    preceding touch event within the lookback window ('none' if no touch
    qualifies).  ONE window partitioned by user — the shuffle key is the
    natural shard key, per-partition state is the user's own history, and
    `last(..., ignorenulls)` over an UNBOUNDED PRECEDING..1 PRECEDING
    frame finds the latest touch without a self-join."""
    evs = events.filter(
        F.col("event_type").isin(*touch_types, conversion)
    ).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type") != conversion
    lt = F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True).over(w)
    ltts = F.last(F.when(is_touch, F.col("ts")), ignorenulls=True).over(w)
    conv = evs.select(
        "event_type",
        "v",
        F.when(
            lt.isNotNull()
            & (ltts >= F.col("ts") - F.expr(f"INTERVAL {lookback_days} DAYS")),
            lt,
        )
        .otherwise(F.lit("none"))
        .alias("channel"),
    ).filter(F.col("event_type") == conversion)
    return (
        conv.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
            F.round(F.sum("v").cast("double"), 4).alias("attributed_value"),
        )
        .orderBy("channel")
    )


def q_event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return last_touch_attribution(load_table(spark, sf_dir, "events"))


EVENT_ATTRIBUTION_SQL = f"""
WITH evs AS (
  SELECT user_id, ts, event_id, event_type, CAST(value AS DECIMAL(18,4)) AS v
  FROM events
  WHERE event_type IN ('click', 'view', 'purchase')
),
win AS (
  SELECT event_type, v, ts,
    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      OVER w AS lt,
    last_value(CASE WHEN event_type <> 'purchase' THEN ts END IGNORE NULLS)
      OVER w AS ltts
  FROM evs
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
conv AS (
  SELECT v,
    CASE WHEN lt IS NOT NULL AND ltts >= ts - INTERVAL '{_LOOKBACK_DAYS} days'
         THEN lt ELSE 'none' END AS channel
  FROM win WHERE event_type = 'purchase'
)
SELECT channel,
  CAST(count(*) AS BIGINT) AS n_conversions,
  round(CAST(sum(v) AS DOUBLE), 4) AS attributed_value
FROM conv GROUP BY channel ORDER BY channel
"""


# ---------------------------------------------------------------------------
# linear (multi-touch) attribution
# ---------------------------------------------------------------------------


def linear_attribution(
    events: DataFrame,
    touch_types: tuple[str, ...] = _TOUCH_TYPES,
    conversion: str = _CONVERSION,
    lookback_days: int = _LOOKBACK_DAYS,
) -> DataFrame:
    """Multi-touch complement of `last_touch_attribution`: each
    conversion's value splits EQUALLY across every qualifying touch in
    the lookback window (the 'linear' model); conversions with no touch
    credit 'none' in full.  Credits are exact integers — value in 1e-4
    units times 1e6, integer-divided by the touch count — so the split is
    engine-identical (truncation loses < n_touches micro-units per
    conversion, far below reporting precision, and is the documented
    trade for exactness).

    Shape: one equi-join on user_id with the time-band residual (the
    funnel join family — per-user histories are small, the band bounds
    the fan-out), one window partitioned by conversion id for the touch
    count, an anti-join for the untouched remainder.  Nothing global."""
    vu = (F.col("value").cast("decimal(18,4)") * 10000).cast("bigint")
    t = events.filter(F.col("event_type").isin(*touch_types)).select(
        F.col("user_id").alias("t_uid"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("channel"),
    )
    p = events.filter(F.col("event_type") == conversion).select(
        "user_id",
        F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
        vu.alias("value_u"),
    )
    pairs = p.join(
        t,
        (F.col("user_id") == F.col("t_uid"))
        & (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.col("pts") - F.expr(f"INTERVAL {lookback_days} DAYS")),
    )
    n_t = F.count(F.lit(1)).over(Window.partitionBy("pid"))
    credited = pairs.select(
        "channel",
        "pid",
        F.expr("value_u * 1000000").alias("vscaled"),
        n_t.alias("n_t"),
    ).select(
        "channel", "pid", F.expr("vscaled div n_t").alias("credit_micro")
    )
    untouched = p.join(
        pairs.select("pid").distinct(), "pid", "left_anti"
    ).select(
        F.lit("none").alias("channel"),
        "pid",
        F.expr("value_u * 1000000").alias("credit_micro"),
    )
    return (
        credited.unionByName(untouched)
        .groupBy("channel")
        .agg(
            F.count_distinct("pid").cast("bigint").alias("n_conversions"),
            F.count(F.lit(1)).cast("bigint").alias("n_credits"),
            F.sum("credit_micro").cast("bigint").alias("credit_micro"),
        )
        .orderBy("channel")
    )


def q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return linear_attribution(load_table(spark, sf_dir, "events"))


LINEAR_ATTRIBUTION_SQL = f"""
WITH t AS (
  SELECT user_id AS t_uid, ts AS tts, event_type AS channel
  FROM events WHERE event_type IN ('click', 'view')
),
p AS (
  SELECT user_id, event_id AS pid, ts AS pts,
    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS value_u
  FROM events WHERE event_type = 'purchase'
),
pairs AS (
  SELECT t.channel, p.pid, p.value_u
  FROM p JOIN t ON p.user_id = t.t_uid
    AND t.tts < p.pts AND t.tts >= p.pts - INTERVAL '{_LOOKBACK_DAYS} days'
),
credited AS (
  SELECT channel, pid,
    (value_u * 1000000) // count(*) OVER (PARTITION BY pid) AS credit_micro
  FROM pairs
),
untouched AS (
  SELECT 'none' AS channel, pid, value_u * 1000000 AS credit_micro
  FROM p WHERE NOT EXISTS (SELECT 1 FROM pairs WHERE pairs.pid = p.pid)
),
unioned AS (
  SELECT * FROM credited UNION ALL SELECT * FROM untouched
)
SELECT channel,
  CAST(count(DISTINCT pid) AS BIGINT) AS n_conversions,
  CAST(count(*) AS BIGINT) AS n_credits,
  CAST(sum(credit_micro) AS BIGINT) AS credit_micro
FROM unioned GROUP BY channel ORDER BY channel
"""


# ---------------------------------------------------------------------------
# day-of-week seasonal decomposition
# ---------------------------------------------------------------------------


def seasonal_dow(events: DataFrame) -> DataFrame:
    """Additive seasonal decomposition of the daily value total: per
    weekday, the mean deviation from a 7-day centered moving-average
    trend.  The centered window is computed by exploding each daily row
    to the +/-3 target days and re-aggregating — an equi-join shape on
    the O(days) rollup with no global window, so it distributes no
    matter how long the calendar grows.  Deviations stay exact: scaled
    by 7 (dev7 = 7*total - window_sum, DECIMAL) so the only float op is
    the final per-weekday mean."""
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.col("value").cast("decimal(18,4)")).alias("tot")
    )
    contrib = daily.select(
        F.explode(F.sequence(F.lit(-3), F.lit(3))).alias("k"), "d", "tot"
    ).select(F.expr("date_add(d, k)").alias("d_t"), "tot")
    win = contrib.groupBy("d_t").agg(
        F.sum("tot").alias("s7"), F.count(F.lit(1)).alias("c7")
    )
    dev = (
        daily.join(win, daily.d == win.d_t)
        .filter(F.col("c7") == 7)
        .select(
            F.date_format("d", "EEEE").alias("dow"),
            (F.col("tot") * 7 - F.col("s7")).alias("dev7"),
        )
    )
    return (
        dev.groupBy("dow")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(
                F.sum("dev7").cast("double") / (7 * F.count(F.lit(1))), 6
            ).alias("seasonal"),
        )
        .orderBy("dow")
    )


def q_seasonal_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seasonal_dow(load_table(spark, sf_dir, "events"))


SEASONAL_DOW_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, sum(CAST(value AS DECIMAL(18,4))) AS tot
  FROM events GROUP BY 1
),
contrib AS (
  SELECT d + CAST(k AS INTEGER) AS d_t, tot
  FROM daily, (SELECT unnest(generate_series(-3, 3)) AS k)
),
win AS (
  SELECT d_t, sum(tot) AS s7, count(*) AS c7 FROM contrib GROUP BY d_t
),
dev AS (
  SELECT dayname(d) AS dow, daily.tot * 7 - win.s7 AS dev7
  FROM daily JOIN win ON daily.d = win.d_t
  WHERE win.c7 = 7
)
SELECT dow,
  CAST(count(*) AS BIGINT) AS n_days,
  round(CAST(sum(dev7) AS DOUBLE) / (7 * count(*)), 6) AS seasonal
FROM dev GROUP BY dow ORDER BY dow
"""


# ---------------------------------------------------------------------------
# SLO error budget (multi-window burn rate)
# ---------------------------------------------------------------------------

_SLO_PPM = 210000  # error budget: 21% of events may be 'error' (fixture
# event types are uniform ~20%, so days oscillate around the budget —
# both burn states appear in the output)


def error_budget(events: DataFrame, slo_ppm: int = _SLO_PPM) -> DataFrame:
    """Daily SLO error-budget accounting with a trailing-7-day burn rate
    (the SRE multi-window burn-rate alert, Beyer et al. SRE workbook ch.5):
    per day, the error rate in exact ppm, the 7-day rate, and burn flags
    (rate over budget) at both windows.  Integer end-to-end: rates are
    integral ppm of exact counts; the trailing window is sum-of-integers
    over a 7-row frame on the O(days) rollup.

    100 TB shape: one map-side-combined daily rollup (count + conditional
    count), then window frames over O(days) rows — the window input is
    the rollup, never the event stream."""
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_err"),
    )
    day_ppm = F.expr("n_err * 1000000 div n")
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("bigint").alias("n_events"),
        F.col("n_err").cast("bigint").alias("n_errors"),
        day_ppm.alias("day_ppm"),
        F.expr(
            f"CAST(sum(n_err) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) * 1000000 "
            f"div sum(n) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)"
        ).alias("week_ppm"),
        (day_ppm > slo_ppm).alias("burn_1d"),
    ).withColumn("burn_7d", F.col("week_ppm") > slo_ppm).orderBy("day")


def q_error_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    return error_budget(load_table(spark, sf_dir, "events"))


ERROR_BUDGET_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, count(*) AS n,
    count(*) FILTER (WHERE event_type = 'error') AS n_err
  FROM events GROUP BY 1
)
SELECT strftime(d, '%Y-%m-%d') AS day,
  CAST(n AS BIGINT) AS n_events,
  CAST(n_err AS BIGINT) AS n_errors,
  CAST(n_err * 1000000 // n AS BIGINT) AS day_ppm,
  CAST(sum(n_err) OVER w * 1000000 // sum(n) OVER w AS BIGINT) AS week_ppm,
  n_err * 1000000 // n > {_SLO_PPM} AS burn_1d,
  sum(n_err) OVER w * 1000000 // sum(n) OVER w > {_SLO_PPM} AS burn_7d
FROM daily
WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY day
"""


# ---------------------------------------------------------------------------
# A/B test: two-proportion z-test over a deterministic hash split
# ---------------------------------------------------------------------------


def ab_test_proportions(events: DataFrame, salt: str = "ab") -> DataFrame:
    """Two-proportion z-test between md5-assigned arms: users split 50/50
    by hash (the standard experiment-assignment primitive — sticky,
    stateless, uniform), conversion = user purchased more often than they
    viewed (a per-user comparison that stays non-degenerate at every
    fixture scale; 'any purchase' saturates to 100% on this corpus).
    Counts are exact integers; the z statistic is the fixed textbook
    formula evaluated on those integers (same deterministic-float
    discipline as event_zscore), so both engines agree bit-for-bit.  A
    degenerate readout (pooled rate 0 or 1 -> zero standard error) yields
    a NULL z instead of a division — the driver's ANSI session errors on
    x/0, and 'no variance' is a meaningful experiment outcome.

    100 TB shape: one per-user aggregate (map-side combined), one 2-row
    arm rollup, one 1-row final projection — the experiment readout never
    shuffles anything user-level twice."""
    users = events.groupBy("user_id").agg(
        F.when(
            F.count(F.when(F.col("event_type") == "purchase", 1))
            > F.count(F.when(F.col("event_type") == "view", 1)),
            1,
        )
        .otherwise(0)
        .alias("converted")
    )
    arm = F.when(
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit(salt + ":"), F.col("user_id").cast("string"))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(2),
        )
        == 0,
        "A",
    ).otherwise("B")
    arms = (
        users.select(arm.alias("arm"), "converted")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("converted").cast("bigint").alias("conv"),
        )
    )
    a = arms.filter(F.col("arm") == "A").select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = arms.filter(F.col("arm") == "B").select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    j = a.crossJoin(b)  # 1 row x 1 row
    pa = F.col("conv_a").cast("double") / F.col("n_a")
    pb = F.col("conv_b").cast("double") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(pp * (1 - pp) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    z = F.when(se > 0, (pa - pb) / se)
    return j.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.expr("conv_a * 1000000 div n_a").alias("rate_a_ppm"),
        F.expr("conv_b * 1000000 div n_b").alias("rate_b_ppm"),
        F.round(z, 4).alias("z_stat"),
        F.coalesce(F.abs(z) > 1.959964, F.lit(False)).alias("significant_95"),
    )


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ab_test_proportions(load_table(spark, sf_dir, "events"))


AB_TEST_SQL = """
WITH users AS (
  SELECT user_id,
    CASE WHEN count(*) FILTER (WHERE event_type = 'purchase')
            > count(*) FILTER (WHERE event_type = 'view')
         THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
),
arms AS (
  SELECT CASE WHEN CAST('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % 2 = 0
              THEN 'A' ELSE 'B' END AS arm,
         converted
  FROM users
),
agg AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(converted) AS BIGINT) AS conv
  FROM arms GROUP BY arm
),
j AS (
  SELECT a.n AS n_a, a.conv AS conv_a, b.n AS n_b, b.conv AS conv_b
  FROM (SELECT * FROM agg WHERE arm = 'A') a, (SELECT * FROM agg WHERE arm = 'B') b
),
d AS (
  SELECT *,
    CAST(conv_a AS DOUBLE) / n_a AS pa,
    CAST(conv_b AS DOUBLE) / n_b AS pb,
    CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) AS pp
  FROM j
),
s AS (
  SELECT *, sqrt(pp * (1 - pp) * (1.0 / n_a + 1.0 / n_b)) AS se FROM d
)
SELECT n_a, conv_a, n_b, conv_b,
  CAST(conv_a * 1000000 // n_a AS BIGINT) AS rate_a_ppm,
  CAST(conv_b * 1000000 // n_b AS BIGINT) AS rate_b_ppm,
  round(CASE WHEN se > 0 THEN (pa - pb) / se END, 4) AS z_stat,
  coalesce(abs(CASE WHEN se > 0 THEN (pa - pb) / se END) > 1.959964, false) AS significant_95
FROM s
"""


# ---------------------------------------------------------------------------
# Mann-Whitney U (rank-based two-sample test)
# ---------------------------------------------------------------------------


def mann_whitney_u(
    events: DataFrame, group_a: str = "purchase", group_b: str = "click"
) -> DataFrame:
    """Tie-corrected Mann-Whitney U test comparing ``value`` between two
    event types — the nonparametric complement to `ab_test`'s two-
    proportion z (means can mislead on the heavy-tailed metrics event
    streams carry; rank tests don't).

    Distributed shape: global average ranks WITHOUT a global window —
    `rank_distributed` assigns unique row numbers over (value, event_id)
    (two bounded shuffles, no single-partition sort), and because a tie
    block's row numbers are contiguous regardless of tie-break,
    ``min(rn)+max(rn)`` per value is exactly twice the average rank.
    The per-value collapse is ONE map-side-combined hash aggregate —
    never a value-partitioned window, which would buffer an entire tie
    block (think zero-inflated metrics: 40% of rows one value) in a
    single task.  Everything (rank sums, tie correction sum(t³−t)) then
    reduces in the same aggregate; integer arithmetic end to end, so
    Spark and DuckDB agree bit-for-bit.  The only doubles are the final
    closed-form z (identical expression order in the oracle).  At
    petabyte row counts the n₁·n₂ products exceed int64 — the
    production variant computes the z in DOUBLE from the start (one
    rounding per factor); exact bigint is kept here because it is
    strictly stronger at test scale."""
    ev = events.filter(F.col("event_type").isin(group_a, group_b)).select(
        "event_id",
        "value",
        (F.col("event_type") == group_a).cast("long").alias("is_a"),
    )
    from realparse_spark.operators.distrank import rank_distributed

    ranked = rank_distributed(ev, ["value", "event_id"], rank_col="rn")
    # per tie block: size t, group-A members n_a, and min+max row number
    # (= 2x the average rank of every member)
    per_val = ranked.groupBy("value").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum("is_a").alias("n_a"),
        (F.min("rn") + F.max("rn")).cast("long").alias("rn2"),
    )
    j = per_val.agg(
        F.sum("n_a").cast("long").alias("n1"),
        (F.sum("t") - F.sum("n_a")).cast("long").alias("n2"),
        F.sum(F.col("n_a") * F.col("rn2")).cast("long").alias("r1_twice"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tsum"),
    )
    n = F.col("n1") + F.col("n2")
    u1 = (F.col("r1_twice") - F.col("n1") * (F.col("n1") + 1)) / F.lit(2.0)
    mu = F.col("n1") * F.col("n2") / F.lit(2.0)
    var = (F.col("n1") * F.col("n2") / F.lit(12.0)) * (
        (n + 1).cast("double") - F.col("tsum") / (n * (n - 1)).cast("double")
    )
    # degenerate inputs (one group empty, or every value identical) have
    # var = 0: NULL z, never an Inf/NaN whose cross-engine hashing is
    # undefined (the trend_slopes guard)
    return j.select(
        "n1",
        "n2",
        u1.alias("u_stat"),
        F.when(var > 0.0, F.round((u1 - mu) / F.sqrt(var), 4)).alias("z_score"),
    )


def q_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mann_whitney_u(fan_out(load_table(spark, sf_dir, "events")))


MANNWHITNEY_U_SQL = """
WITH ev AS (
  SELECT event_id, value,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
  FROM events WHERE event_type IN ('purchase', 'click')
),
ranked AS (
  SELECT is_a, value, row_number() OVER (ORDER BY value, event_id) AS rn
  FROM ev
),
r2 AS (
  SELECT is_a,
    CAST(min(rn) OVER (PARTITION BY value)
       + max(rn) OVER (PARTITION BY value) AS BIGINT) AS rn2
  FROM ranked
),
ties AS (
  SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tsum
  FROM (SELECT count(*) AS t FROM ev GROUP BY value)
),
s AS (
  SELECT CAST(sum(is_a) AS BIGINT) AS n1,
         CAST(count(*) - sum(is_a) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN is_a = 1 THEN rn2 ELSE 0 END) AS BIGINT) AS r1_twice
  FROM r2
)
SELECT n1, n2,
  (r1_twice - n1 * (n1 + 1)) / 2.0 AS u_stat,
  CASE WHEN (n1 * n2 / 12.0)
            * (CAST(n1 + n2 + 1 AS DOUBLE)
               - tsum / CAST((n1 + n2) * (n1 + n2 - 1) AS DOUBLE)) > 0.0
    THEN round(((r1_twice - n1 * (n1 + 1)) / 2.0 - n1 * n2 / 2.0)
          / sqrt((n1 * n2 / 12.0)
                 * (CAST(n1 + n2 + 1 AS DOUBLE)
                    - tsum / CAST((n1 + n2) * (n1 + n2 - 1) AS DOUBLE))), 4)
  END AS z_score
FROM s, ties
"""


QUERIES = {
    "poisson_bootstrap_ci": q_poisson_bootstrap_ci,
    "ab_test": q_ab_test,
    "event_attribution": q_event_attribution,
    "linear_attribution": q_linear_attribution,
    "seasonal_dow": q_seasonal_dow,
    "error_budget": q_error_budget,
    "mannwhitney_u": q_mannwhitney_u,
}
ORACLES = {
    "poisson_bootstrap_ci": _poisson_bootstrap_sql(),
    "ab_test": AB_TEST_SQL,
    "event_attribution": EVENT_ATTRIBUTION_SQL,
    "linear_attribution": LINEAR_ATTRIBUTION_SQL,
    "seasonal_dow": SEASONAL_DOW_SQL,
    "error_budget": ERROR_BUDGET_SQL,
    "mannwhitney_u": MANNWHITNEY_U_SQL,
}
