"""Accuracy bound for the approximate-distinct sketch (rows-only at the
driver, so the quality gate lives here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realparse_spark.operators.advanced import q_approx_distinct
from realparse_spark.sources.tables import load_table

ORACLE_SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_rsd(spark):
    approx = {r.event_type: r.approx_users for r in q_approx_distinct(spark, ORACLE_SF).collect()}
    exact = {
        r.event_type: r.u
        for r in load_table(spark, ORACLE_SF, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("u"))
        .collect()
    }
    for et, e in exact.items():
        assert abs(approx[et] - e) / e < 0.1, (et, approx[et], e)


def test_approx_quantiles_close_to_exact(spark):
    from realparse_spark.operators.advanced import q_approx_quantiles

    approx = {
        r.event_type: (r.p50_approx, r.p95_approx)
        for r in q_approx_quantiles(spark, ORACLE_SF).collect()
    }
    exact = {
        r.event_type: (r.p50, r.p95)
        for r in load_table(spark, ORACLE_SF, "events")
        .groupBy("event_type")
        .agg(
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.95).alias("p95"),
        )
        .collect()
    }
    for et, (e50, e95) in exact.items():
        a50, a95 = approx[et]
        # sketch with accuracy=10000 over ~60k rows: within 2% relative
        assert abs(a50 - e50) / max(e50, 1e-9) < 0.02, (et, a50, e50)
        assert abs(a95 - e95) / max(e95, 1e-9) < 0.02, (et, a95, e95)


def test_sql_interface_sf_scoped_views(spark):
    """View hygiene: two sf_dirs queried through the SQL front door in ONE
    session must produce correct, independent results (fixed temp-view
    names would make the second registration clobber the first)."""
    from realparse_spark.operators.advanced import q_sql_interface

    df_small = q_sql_interface(spark, "/root/testdata/sf0.001")
    df_big = q_sql_interface(spark, "/root/testdata/sf0.01")
    n_small = sum(r.n_orders for r in df_small.collect())
    n_big = sum(r.n_orders for r in df_big.collect())
    assert 0 < n_small < n_big
    # re-collecting the first AFTER the second registration still gives
    # the sf0.001 numbers
    assert sum(r.n_orders for r in df_small.collect()) == n_small


def test_surrogate_ids_are_dense_permutation_multisplit(spark, tmp_path):
    """Regression: surrogate ids must be a dense 1..n permutation matching
    the key sort order even when the input arrives as MANY splits.  The
    old repartitionByRange design sampled boundaries independently in the
    two consumers of the bucketed table; on multi-split inputs the samples
    could diverge and ids collided (caught by the sf0.1 oracle sweep)."""
    import random

    from pyspark.sql import functions as F

    from realparse_spark.operators.report import surrogate_keys

    rng = random.Random(7)
    keys = list(range(1, 20001))
    rng.shuffle(keys)
    cust = spark.createDataFrame(
        [(k, "SEG%d" % (k % 3)) for k in keys], "c_custkey long, c_mktsegment string"
    ).repartition(16)  # arbitrary multi-split physical layout
    orders = spark.createDataFrame(
        [(k, k) for k in keys], "o_orderkey long, o_custkey long"
    ).repartition(16)

    sf = str(tmp_path / "sf")
    import os
    os.makedirs(sf)
    cust.write.parquet(os.path.join(sf, "customer.parquet"))
    orders.write.parquet(os.path.join(sf, "orders.parquet"))

    out = surrogate_keys(spark, sf).collect()
    ids = sorted(r.surrogate_id for r in out)
    # one order per customer -> one output row per customer; dense ids
    assert len(out) == 20000
    assert ids == list(range(1, 20001))


def test_surrogate_ids_empty_and_skewed_keys(spark, tmp_path):
    """ADVICE hardening: an empty customer table returns a typed empty
    result (the min/max fetch used to crash on int(None)); a heavily
    skewed key DISTRIBUTION (99% of keys packed into 0.0001% of the key
    range) still produces a dense permutation — the quantile boundaries
    keep range buckets balanced where min/max interpolation would have
    collapsed nearly every row into bucket 0."""
    import os

    from realparse_spark.operators.report import surrogate_keys

    empty_sf = str(tmp_path / "sf_empty")
    os.makedirs(empty_sf)
    spark.createDataFrame([], "c_custkey long, c_mktsegment string").write.parquet(
        os.path.join(empty_sf, "customer.parquet")
    )
    spark.createDataFrame([], "o_orderkey long, o_custkey long").write.parquet(
        os.path.join(empty_sf, "orders.parquet")
    )
    out = surrogate_keys(spark, empty_sf)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["surrogate_id", "c_mktsegment", "n_orders"]

    # 19800 keys dense in [1, 19800]; 200 outliers strewn up to 2e9
    keys = list(range(1, 19801)) + [2_000_000_000 + i * 7_777_777 for i in range(200)]
    skew_sf = str(tmp_path / "sf_skew")
    os.makedirs(skew_sf)
    spark.createDataFrame(
        [(k, "SEG%d" % (k % 3)) for k in keys], "c_custkey long, c_mktsegment string"
    ).repartition(16).write.parquet(os.path.join(skew_sf, "customer.parquet"))
    spark.createDataFrame(
        [(k, k) for k in keys], "o_orderkey long, o_custkey long"
    ).repartition(16).write.parquet(os.path.join(skew_sf, "orders.parquet"))

    ids = sorted(r.surrogate_id for r in surrogate_keys(spark, skew_sf).collect())
    assert ids == list(range(1, len(keys) + 1))


def test_rollup_merge_equals_direct_daily_agg(spark):
    """The algebraic-merge contract: daily rollups produced by merging
    hourly partials must equal the daily aggregate computed directly from
    raw events — for count/sum/min/max AND the derived average."""
    from pyspark.sql import functions as F

    from realparse_spark.operators.analytics import merge_partials
    from realparse_spark.sources.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    hourly = events.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("s"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    merged = {(r.day, r.event_type): r for r in merge_partials(hourly).collect()}

    direct = events.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    rows = direct.collect()
    assert len(rows) == len(merged) > 0
    for r in rows:
        m = merged[(r.day, r.event_type)]
        assert m.n_events == r.n_events
        assert m.sum_value == r.sum_value  # decimal-exact, so == holds on doubles
        assert m.min_value == r.min_value and m.max_value == r.max_value
        assert m.avg_value == round(r.sum_value / r.n_events, 6)


def test_trend_slopes_invariant_under_partitioning(spark):
    """The bit-reproducibility claim: decimal moment sums are associative,
    so the OLS slope must be IDENTICAL (==, not approx) whether the events
    arrive in 1 partition or 32."""
    from realparse_spark.operators.analytics import trend_slopes
    from realparse_spark.sources.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    one = {r.event_type: r.slope_per_sec for r in trend_slopes(events.coalesce(1)).collect()}
    many = {r.event_type: r.slope_per_sec for r in trend_slopes(events.repartition(32)).collect()}
    assert one == many and len(one) == 5


def test_trend_slopes_degenerate_group_yields_null(spark):
    """A type with one observation (or identical timestamps) has zero
    slope denominator: the result must be NULL, never a 0/0 NaN (whose
    hashing differs across engines)."""
    from pyspark.sql import functions as F

    from realparse_spark.operators.analytics import trend_slopes

    events = spark.createDataFrame(
        [
            ("solo", "2024-01-01 10:00:00", 5.0),
            ("same_ts", "2024-01-02 00:00:00", 1.0),
            ("same_ts", "2024-01-02 00:00:00", 3.0),
            ("ok", "2024-01-01 00:00:00", 1.0),
            ("ok", "2024-01-01 01:00:00", 2.0),
        ],
        "event_type string, ts string, value double",
    ).select("event_type", F.to_timestamp("ts").alias("ts"), "value")
    rows = {r.event_type: r for r in trend_slopes(events).collect()}
    assert rows["solo"].slope_per_sec is None
    assert rows["same_ts"].slope_per_sec is None
    assert rows["ok"].slope_per_sec == round(1.0 / 3600, 6)


def test_approx_distinct_merge_matches_exact(spark):
    """Merging daily HLL sketch blobs must estimate per-type distinct
    users within 5% of exact (exact at fixture cardinality), and the
    sketch-table shape must be real: one sketch per (type, day)."""
    from pyspark.sql import functions as F

    from realparse_spark.operators.advanced import q_approx_distinct_merge
    from realparse_spark.sources.tables import load_table

    got = {r.event_type: r for r in q_approx_distinct_merge(spark, ORACLE_SF).collect()}
    ev = load_table(spark, ORACLE_SF, "events")
    exact = {
        r.event_type: (r.u, r.n, r.d)
        for r in ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("u"),
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.to_date("ts")).alias("d"),
        ).collect()
    }
    for et, (u, n, d) in exact.items():
        r = got[et]
        assert abs(r.approx_users - u) / u < 0.05, (et, r.approx_users, u)
        assert r.n_events == n
        assert r.n_daily_sketches == d


def test_approx_topk_users_exact_when_tracked(spark):
    """With maxItemsTracked >= |users| the frequent-items sketch is exact:
    the top-10 (user, count) pairs must equal the groupBy truth up to
    equal-count ties at the cut."""
    from pyspark.sql import functions as F

    from realparse_spark.operators.advanced import q_approx_topk_users
    from realparse_spark.sources.tables import load_table

    got = [(r.user_id, r.n_events) for r in q_approx_topk_users(spark, ORACLE_SF).collect()]
    ev = load_table(spark, ORACLE_SF, "events")
    truth = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert len(got) == 10
    for uid, n in got:
        assert truth[uid] == n, (uid, n, truth[uid])
    # every reported count is >= the 10th-largest true count (ties aside)
    kth = sorted(truth.values(), reverse=True)[9]
    assert all(n >= kth for _, n in got)


def test_theta_overlap_matches_exact_set_algebra(spark):
    """Theta-sketch union/intersection/difference must reproduce the
    exact distinct-set algebra below sketch capacity (the fixture case) —
    a wrong segment filter or a swapped operand breaks equality."""
    from pyspark.sql import functions as F

    from realparse_spark.operators.advanced import q_approx_audience_overlap
    from realparse_spark.sources.tables import load_table

    got = q_approx_audience_overlap(spark, ORACLE_SF).collect()[0]
    ev = load_table(spark, ORACLE_SF, "events")
    v = {
        r.user_id
        for r in ev.filter((F.col("event_type") == "view") & (F.col("value") > 98))
        .select("user_id").distinct().collect()
    }
    b = {
        r.user_id
        for r in ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 98))
        .select("user_id").distinct().collect()
    }
    assert (got.est_viewers, got.est_buyers, got.est_both,
            got.est_either, got.est_viewer_only) == (
        len(v), len(b), len(v & b), len(v | b), len(v - b)
    )


def test_cms_never_underestimates_and_bounds_overshoot(spark):
    """The count-min hard guarantee: est(k) >= true(k) for EVERY key
    (all d counters saw every occurrence of k); overshoot is colliding
    mass, bounded here at the classic e*N/w with depth-4 min."""
    import math

    from realparse_spark.operators.advanced import (
        CMS_WIDTH,
        cms_estimate,
        cms_sketch,
    )
    from realparse_spark.sources.tables import load_table

    ev = load_table(spark, ORACLE_SF, "events").select("user_id")
    n_total = ev.count()
    sk = cms_sketch(ev, "user_id")
    est = cms_estimate(sk, ev.distinct(), "user_id")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    rows = est.join(exact, "user_id").collect()
    assert rows, "no users probed"
    assert all(r.est_count >= r.true_count for r in rows)
    bound = math.e * n_total / CMS_WIDTH
    assert all(r.est_count - r.true_count <= bound for r in rows)


def test_cms_sketches_merge_by_counter_sum(spark):
    """Mergeability — the rollup property: CMS(day1 U day2) equals the
    counter-wise sum of CMS(day1) and CMS(day2), so daily sketches roll
    up without revisiting raw rows."""
    from realparse_spark.operators.advanced import cms_sketch
    from realparse_spark.sources.tables import load_table

    ev = load_table(spark, ORACLE_SF, "events")
    half_a = ev.filter(F.col("event_id") % 2 == 0).select("user_id")
    half_b = ev.filter(F.col("event_id") % 2 == 1).select("user_id")
    merged = (
        cms_sketch(half_a, "user_id")
        .unionByName(cms_sketch(half_b, "user_id"))
        .groupBy("depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_sketch(ev.select("user_id"), "user_id")
    sym_diff = merged.exceptAll(whole).unionAll(whole.exceptAll(merged))
    assert sym_diff.count() == 0


def test_interval_overlap_join_matches_naive(spark):
    """Property: the bucket-blocked overlap join equals the naive
    inequality join on intervals engineered to span 0, 1, and many
    buckets (so the explode + distinct path is exercised)."""
    from realparse_spark.operators.advanced import interval_overlap_join

    hour_us = 3_600_000_000
    a_rows = [
        (1, 0, hour_us // 2),                    # within one bucket
        (2, hour_us - 10, hour_us + 10),         # straddles a boundary
        (3, 0, 5 * hour_us),                     # spans six buckets
        (4, 10 * hour_us, 10 * hour_us),         # zero-length
    ]
    b_rows = [
        (100, hour_us // 4, hour_us // 3),
        (200, 2 * hour_us, 7 * hour_us),
        (300, 10 * hour_us - 5, 10 * hour_us + 5),
        (400, 20 * hour_us, 21 * hour_us),       # overlaps nothing
    ]
    a = spark.createDataFrame(a_rows, "a_id int, a_start_us long, a_end_us long")
    b = spark.createDataFrame(b_rows, "b_id int, b_start_us long, b_end_us long")
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(a, b, bucket_us=hour_us).collect()
    )
    naive = sorted(
        (ra[0], rb[0])
        for ra in a_rows
        for rb in b_rows
        if ra[1] <= rb[2] and rb[1] <= ra[2]
    )
    assert got == naive
    assert (1, 100) in got and (3, 200) in got and (4, 300) in got


def test_crosstab_chi2_matches_numpy(spark):
    """The 120 cell contributions must agree with a float reference
    computed straight from the observed counts (tolerance covers the
    round(6))."""
    from realparse_spark.operators.analytics import q_crosstab_chi2

    rows = q_crosstab_chi2(spark, ORACLE_SF).collect()
    obs = {(r["event_type"], r["hr"]): r["n_obs"] for r in rows}
    n = sum(obs.values())
    r_tot = {}
    c_tot = {}
    for (et, hr), o in obs.items():
        r_tot[et] = r_tot.get(et, 0) + o
        c_tot[hr] = c_tot.get(hr, 0) + o
    for r in rows:
        e = r_tot[r["event_type"]] * c_tot[r["hr"]] / n
        want = (r["n_obs"] - e) ** 2 / e
        assert abs(r["chi2_cell"] - want) < 1e-5, (r, want)
        assert abs(r["expected_e6"] / 1e6 - e) < 1e-5


def test_ols_price_model_matches_numpy(spark):
    """Closed-form coefficients must agree with a numpy least-squares fit
    on the same rows (tolerance covers the round(6))."""
    import numpy as np

    from realparse_spark.operators.analytics import q_ols_price_model

    row = q_ols_price_model(spark, ORACLE_SF).collect()[0]
    li = (
        load_table(spark, ORACLE_SF, "lineitem")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .collect()
    )
    x = np.array([[float(r[0]), float(r[1])] for r in li])
    y = np.array([float(r[2]) for r in li])
    design = np.column_stack([np.ones(len(y)), x])
    beta, *_ = np.linalg.lstsq(design, y, rcond=None)
    assert row["n_rows"] == len(y)
    assert abs(row["intercept"] - beta[0]) < 1e-3
    assert abs(row["beta_qty"] - beta[1]) < 1e-5
    assert abs(row["beta_disc"] - beta[2]) < 1e-3
    pred = design @ beta
    ss_res = float(((y - pred) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    assert abs(row["r2"] - (1 - ss_res / ss_tot)) < 1e-5


def test_weighted_median_matches_reference(spark):
    """Smallest value whose cumulative weight reaches half the total,
    recomputed directly from the rows."""
    from realparse_spark.operators.analytics import q_weighted_median

    got = {
        r["l_returnflag"]: float(r["weighted_median"])
        for r in q_weighted_median(spark, ORACLE_SF).collect()
    }
    rows = (
        load_table(spark, ORACLE_SF, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    groups = {}
    for r in rows:
        groups.setdefault(r[0], []).append((float(r[1]), float(r[2])))
    for flag, vw in groups.items():
        vw.sort()
        tot = sum(w for _, w in vw)
        cum = 0.0
        for v, w in vw:
            cum += w
            if cum * 2 >= tot:
                assert abs(got[flag] - v) < 1e-9, (flag, got[flag], v)
                break


def test_ks_statistic_bounds_and_reference(spark):
    """Binned KS must equal a direct recomputation on the same grid and
    lie in [0, 1]."""
    from realparse_spark.operators.analytics import _KS_BINS, q_ks_statistic

    row = q_ks_statistic(spark, ORACLE_SF).collect()[0]
    ev = (
        load_table(spark, ORACLE_SF, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", "value")
        .collect()
    )
    xs = [(float(r[1]), r[0] == "click") for r in ev]
    vmin = min(v for v, _ in xs)
    vmax = max(v for v, _ in xs)
    import math

    c1 = [0] * _KS_BINS
    c2 = [0] * _KS_BINS
    for v, g1 in xs:
        b = 0 if vmax == vmin else min(
            int(math.floor((v - vmin) / (vmax - vmin) * float(_KS_BINS))), _KS_BINS - 1
        )
        (c1 if g1 else c2)[b] += 1
    n1, n2 = sum(c1), sum(c2)
    a1 = a2 = 0
    dnum = 0
    for i in range(_KS_BINS):
        a1 += c1[i]
        a2 += c2[i]
        dnum = max(dnum, abs(a1 * n2 - a2 * n1))
    assert row["n1"] == n1 and row["n2"] == n2
    assert 0.0 <= row["ks_d"] <= 1.0
    assert abs(row["ks_d"] - dnum / (n1 * n2)) < 1e-6


def test_daily_autocorr_matches_numpy(spark):
    """Lag-1 ACF must agree with a numpy Pearson on the calendar-paired
    daily revenue series."""
    import datetime as dt

    import numpy as np

    from realparse_spark.operators.analytics import q_daily_autocorr

    got = {r["lag"]: (r["n_pairs"], r["acf"]) for r in q_daily_autocorr(spark, ORACLE_SF).collect()}
    daily_rows = (
        load_table(spark, ORACLE_SF, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
        .collect()
    )
    daily = {r["day"]: float(r["rev"]) for r in daily_rows}
    for lag in (1, 7):
        xs, ys = [], []
        for day, rev in daily.items():
            nxt = day + dt.timedelta(days=lag)
            if nxt in daily:
                xs.append(rev)
                ys.append(daily[nxt])
        n_pairs, acf = got[lag]
        assert n_pairs == len(xs)
        want = float(np.corrcoef(xs, ys)[0, 1])
        assert abs(acf - want) < 1e-5, (lag, acf, want)


def test_theil_sen_robust_to_outlier_day(spark):
    """The estimator's reason to exist: corrupt ONE day of a clean linear
    series and the slope median must not move (OLS demonstrably does)."""
    from pyspark.sql import functions as F

    from realparse_spark.operators.analytics import theil_sen_trend, trend_slopes

    clean = [("t", f"2024-01-{d:02d} 00:00:00", float(d)) for d in range(1, 16)]
    # corrupt a day near the END of the range (an outlier at the center
    # x-bar would leave even OLS untouched — zero leverage)
    corrupt = [r if r[1][8:10] != "14" else (r[0], r[1], 1000.0) for r in clean]

    def run(rows):
        ev = spark.createDataFrame(
            rows, "event_type string, ts string, value double"
        ).select("event_type", F.to_timestamp("ts").alias("ts"), "value")
        ts = theil_sen_trend(ev).collect()[0]
        ols = trend_slopes(ev).collect()[0]
        return ts, ols

    ts_clean, ols_clean = run(clean)
    ts_bad, ols_bad = run(corrupt)
    assert ts_clean.ts_slope_per_day == 1.0
    assert ts_bad.ts_slope_per_day == 1.0  # median unmoved by the outlier
    # per-second OLS on the same corruption moves by orders of magnitude
    assert abs(ols_bad.slope_per_sec) > 5 * abs(ols_clean.slope_per_sec)
    assert ts_clean.n_days == 15 and ts_clean.n_pairs == 105


def test_theil_sen_even_pair_count_median(spark):
    """Even n_pairs: the median must average the two middle order stats
    (2 days -> 1 pair; 3 days -> 3 pairs; 4 days -> 6 pairs, even)."""
    from pyspark.sql import functions as F

    from realparse_spark.operators.analytics import theil_sen_trend

    # days 1,2,3,5 with values 1,2,3,9: slopes [1, 1, 2, 1, 7/3, 3] ->
    # sorted [1, 1, 1, 2, 7/3, 3], median = (1+2)/2 = 1.5
    rows = [
        ("t", "2024-01-01 00:00:00", 1.0),
        ("t", "2024-01-02 00:00:00", 2.0),
        ("t", "2024-01-03 00:00:00", 3.0),
        ("t", "2024-01-05 00:00:00", 9.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_type string, ts string, value double"
    ).select("event_type", F.to_timestamp("ts").alias("ts"), "value")
    r = theil_sen_trend(ev).collect()[0]
    assert r.n_pairs == 6
    assert r.ts_slope_per_day == 1.5


def test_theil_sen_single_day_type_kept(spark):
    """A type whose events all land on ONE day has no slope pairs, but it
    must still appear in the per-type report (n_pairs=0, NULL slope) —
    a trend table that silently omits types misleads its reader."""
    from pyspark.sql import functions as F

    from realparse_spark.operators.analytics import theil_sen_trend

    rows = [
        ("multi", "2024-01-01 00:00:00", 1.0),
        ("multi", "2024-01-02 00:00:00", 2.0),
        ("single", "2024-01-01 03:00:00", 5.0),
        ("single", "2024-01-01 09:00:00", 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_type string, ts string, value double"
    ).select("event_type", F.to_timestamp("ts").alias("ts"), "value")
    got = {r.event_type: r for r in theil_sen_trend(ev).collect()}
    assert set(got) == {"multi", "single"}
    assert got["multi"].n_pairs == 1 and got["multi"].ts_slope_per_day == 1.0
    assert got["single"].n_days == 1
    assert got["single"].n_pairs == 0
    assert got["single"].ts_slope_per_day is None


def test_emb_drift_identity_and_shift(spark):
    """No-drift identity: when both epochs hold the same cloud, the
    centroid cosine is 1.0 and the count delta 0; an injected shift in
    epoch 1 must pull the cosine strictly below the unshifted label's."""
    from realparse_spark.operators.advanced import q_emb_drift

    rows = []
    for i in range(40):  # label 0: identical clouds on both parities
        rows.append((i * 2, [1.0, 2.0, 3.0, 4.0], 0))
        rows.append((i * 2 + 1, [1.0, 2.0, 3.0, 4.0], 0))
    for i in range(40):  # label 1: epoch-1 members (odd vec_id) rotated
        rows.append((1000 + i * 2, [5.0, 0.0, 0.0, 1.0], 1))
        rows.append((1000 + i * 2 + 1, [0.0, 5.0, 1.0, 0.0], 1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        emb.write.parquet(os.path.join(td, "embeddings.parquet"))
        out = {r.label: r for r in q_emb_drift(spark, td).collect()}
    assert out[0].centroid_cos == 1.0
    assert out[0].n_delta == 0 and out[0].n_epoch0 == 40
    assert out[1].centroid_cos < 0.2  # near-orthogonal planted shift


def test_sketch_estimates_match_exact_companions(spark, sf_dir):
    """The exact-surrogate companions must agree with their sketches at
    fixture scale: theta sketches are exact below nominal capacity, and
    the HLL rollup's shared plumbing (grain, counts) must match exactly
    with the estimate inside its error bound."""
    from realparse_spark.operators.advanced import (
        q_approx_audience_overlap,
        q_approx_distinct_merge,
        q_audience_overlap_exact,
        q_distinct_merge_exact,
    )

    a = q_approx_audience_overlap(spark, sf_dir).collect()[0]
    e = q_audience_overlap_exact(spark, sf_dir).collect()[0]
    assert (
        a.est_viewers, a.est_buyers, a.est_both, a.est_either, a.est_viewer_only
    ) == (e.n_viewers, e.n_buyers, e.n_both, e.n_either, e.n_viewer_only)

    am = {r.event_type: r for r in q_approx_distinct_merge(spark, sf_dir).collect()}
    em = {r.event_type: r for r in q_distinct_merge_exact(spark, sf_dir).collect()}
    assert set(am) == set(em)
    for t, er in em.items():
        ar = am[t]
        assert (ar.n_events, ar.n_daily_sketches) == (er.n_events, er.n_days), t
        assert abs(ar.approx_users - er.n_users) <= max(3, 0.05 * er.n_users), t
