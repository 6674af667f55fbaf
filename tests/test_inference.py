"""Utility gates for the inference/privacy additions: the oracle parity
suite proves engine-equality; these tests prove the STATISTICS are right
(noise bounded, intervals ordered and covering, attribution conserving
mass, seasonality summing to ~zero)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from realparse_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_dp_noise_bounded_and_calibrated(spark):
    from realparse_spark.operators.privacy import _DP_MAX_NOISE, q_dp_group_counts

    rows = q_dp_group_counts(spark, SF_DIR).collect()
    assert rows, "no groups released"
    for r in rows:
        assert abs(r.n_released - r.n_true) <= _DP_MAX_NOISE, r
    # different salts must move the noise (the mechanism is keyed, not
    # constant): releasing under another salt changes at least one group
    from realparse_spark.operators.privacy import dp_group_counts

    ev = load_table(spark, SF_DIR, "events")
    a = {r.event_type: r.n_released for r in dp_group_counts(ev, "event_type", salt="dp").collect()}
    b = {r.event_type: r.n_released for r in dp_group_counts(ev, "event_type", salt="dp2").collect()}
    assert a != b


def test_dp_ladder_matches_geometric_distribution():
    """The inverse-CDF thresholds must reproduce the two-sided geometric
    pmf: P(k) = (1-a)/(1+a) * a^|k| (within truncation renormalization)."""
    from realparse_spark.operators.inference import _U32, cdf_thresholds
    from realparse_spark.operators.privacy import _DP_EPS, _DP_MAX_NOISE, _dp_probs

    th = cdf_thresholds(_dp_probs())
    alpha = math.exp(-_DP_EPS)
    total = sum(_dp_probs())
    widths = [b - a for a, b in zip([0] + th, th + [_U32])]
    for k, w in zip(range(-_DP_MAX_NOISE, _DP_MAX_NOISE + 1), widths):
        expect = (alpha ** abs(k)) / total
        assert abs(w / _U32 - expect) < 1e-6, (k, w / _U32, expect)


def test_bootstrap_ci_brackets_point_estimate(spark):
    from realparse_spark.operators.inference import q_poisson_bootstrap_ci

    rows = q_poisson_bootstrap_ci(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.ci_lo <= r.ci_hi, r
        # percentile CIs can in principle exclude the point estimate, but
        # for a mean over n >= 100 iid-ish rows the interval must bracket
        # it and be narrow relative to the estimate's magnitude
        assert r.ci_lo <= r.mean_value <= r.ci_hi, r
        assert (r.ci_hi - r.ci_lo) < max(abs(r.mean_value), 1.0), r


def test_poisson_ladder_mean_near_one():
    """Poisson(1) weights must average ~1 so each replicate is an
    (asymptotically) same-size resample — the property the bootstrap
    depends on."""
    from realparse_spark.operators.inference import (
        _POISSON_THRESHOLDS,
        _POISSON_VALUES,
        _U32,
    )

    widths = [
        b - a
        for a, b in zip([0] + _POISSON_THRESHOLDS, _POISSON_THRESHOLDS + [_U32])
    ]
    mean = sum(v * w / _U32 for v, w in zip(_POISSON_VALUES, widths))
    assert abs(mean - 1.0) < 1e-3, mean


def test_attribution_conserves_conversion_mass(spark):
    from realparse_spark.operators.inference import q_event_attribution

    ev = load_table(spark, SF_DIR, "events")
    total = ev.filter(F.col("event_type") == "purchase").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("v"),
    ).collect()[0]
    rows = q_event_attribution(spark, SF_DIR).collect()
    assert sum(r.n_conversions for r in rows) == total.n
    assert abs(sum(r.attributed_value for r in rows) - total.v) < 1e-2
    channels = {r.channel for r in rows}
    assert channels <= {"click", "view", "none"}


def test_seasonal_matches_direct_recomputation(spark):
    """Recompute the decomposition from the daily rollup in plain Python
    (independent formulation: dict-of-days centered average instead of
    explode+re-aggregate) — the distributed shape must reproduce it."""
    from datetime import timedelta
    from decimal import Decimal

    from realparse_spark.operators.inference import q_seasonal_dow

    ev = load_table(spark, SF_DIR, "events")
    daily = {
        r.d: r.tot
        for r in ev.groupBy(F.to_date("ts").alias("d"))
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("tot"))
        .collect()
    }
    by_dow: dict[str, list[Decimal]] = {}
    for d, tot in daily.items():
        window = [daily.get(d + timedelta(days=k)) for k in range(-3, 4)]
        if any(v is None for v in window):
            continue
        by_dow.setdefault(d.strftime("%A"), []).append(
            7 * tot - sum(window)
        )
    expect = {
        dow: (len(devs), round(float(sum(devs)) / (7 * len(devs)), 6))
        for dow, devs in by_dow.items()
    }
    rows = q_seasonal_dow(spark, SF_DIR).collect()
    assert len(rows) == 7
    got = {r.dow: (r.n_days, r.seasonal) for r in rows}
    assert got == expect


def test_decontaminate_report_consistent(spark):
    from realparse_spark.operators.text import q_doc_decontaminate

    rows = q_doc_decontaminate(spark, SF_DIR).collect()
    assert rows
    docs = load_table(spark, SF_DIR, "documents")
    n_train = docs.filter(F.col("doc_id") % 20 != 0).count()
    assert sum(r.n_train for r in rows) == n_train
    for r in rows:
        assert r.n_kept == r.n_train - r.n_dropped
        assert 0 <= r.n_dropped <= r.n_train


def test_linkage_clusters_match_pair_graph(spark):
    """Every cluster has >= 2 members (every node entered via a pair) and
    the member count equals the number of distinct names in the pair
    graph."""
    from realparse_spark.operators.linkage import (
        blocked_fuzzy_pairs,
        q_linkage_clusters,
    )

    part = load_table(spark, SF_DIR, "part")
    pairs = blocked_fuzzy_pairs(part, "p_type", "p_name", max_dist=2)
    n_nodes = (
        pairs.select(F.col("name_a").alias("n"))
        .union(pairs.select("name_b"))
        .distinct()
        .count()
    )
    rows = q_linkage_clusters(spark, SF_DIR).collect()
    assert all(r.n_members >= 2 for r in rows)
    assert sum(r.n_members for r in rows) == n_nodes


def test_ab_test_split_is_balanced_and_exact(spark):
    """The hash split must roughly balance arms, and counts must equal a
    local recompute of the assignment."""
    import hashlib

    from realparse_spark.operators.inference import q_ab_test

    ev = load_table(spark, SF_DIR, "events")
    users = {}
    for r in ev.collect():
        users.setdefault(r.user_id, [0, 0])
        if r.event_type == "purchase":
            users[r.user_id][0] += 1
        elif r.event_type == "view":
            users[r.user_id][1] += 1
    expect = {"A": [0, 0], "B": [0, 0]}
    for uid, (n_p, n_v) in users.items():
        arm = "A" if int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:8], 16) % 2 == 0 else "B"
        expect[arm][0] += 1
        expect[arm][1] += 1 if n_p > n_v else 0
    r = q_ab_test(spark, SF_DIR).collect()[0]
    assert (r.n_a, r.conv_a) == tuple(expect["A"])
    assert (r.n_b, r.conv_b) == tuple(expect["B"])
    assert r.n_a > 0 and r.n_b > 0
    # non-degenerate on the fixture: a finite z must be produced
    assert r.z_stat is not None


def test_linear_attribution_conserves_mass_within_truncation(spark):
    """Sum of credits equals total conversion value to within one
    micro-unit per credit row (the integer-split truncation bound), and
    every conversion is credited in exactly one place per channel."""
    from realparse_spark.operators.inference import q_linear_attribution

    ev = load_table(spark, SF_DIR, "events")
    total_u = (
        ev.filter(F.col("event_type") == "purchase")
        .agg(F.sum((F.col("value").cast("decimal(18,4)") * 10000).cast("bigint")))
        .collect()[0][0]
    )
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    rows = q_linear_attribution(spark, SF_DIR).collect()
    credit = sum(r.credit_micro for r in rows)
    n_credits = sum(r.n_credits for r in rows)
    assert 0 <= total_u * 1000000 - credit < n_credits
    assert sum(r.n_conversions for r in rows) >= n_purch  # a conversion can
    # touch multiple channels; every purchase appears under >= 1 channel
    assert {r.channel for r in rows} <= {"click", "view", "none"}


def test_bootstrap_tiny_group_zero_weight_replicates_cross_engine(spark):
    """A 1-row group draws Poisson weight 0 with P ~ e^-1 per replicate;
    those replicates have NO mean and must be dropped BEFORE ranking —
    Spark sorts NULLs first on ASC, DuckDB last, so keeping them would
    silently diverge cross-engine (the round-6 advisor finding).  Build a
    fixture of singleton groups, confirm at least one zero-weight
    replicate actually occurs, and require exact Spark/DuckDB agreement."""
    import duckdb
    import pandas as pd

    from realparse_spark.operators.inference import (
        _poisson_bootstrap_sql,
        poisson_bootstrap_ci,
    )

    pdf = pd.DataFrame(
        {
            "event_type": [f"g{i}" for i in range(40)],
            "value": [float(i) for i in range(40)],
            "event_id": list(range(40)),
        }
    )
    df = spark.createDataFrame(pdf)
    out = poisson_bootstrap_ci(df, "event_type", "value", "event_id")
    got = {r.event_type: (r.ci_lo, r.ci_hi) for r in out.collect()}
    # singleton groups: every surviving replicate mean equals the value.
    # P(a given replicate draws weight 0) ~ e^-1, so across 40 groups x
    # 20 replicates the zero-weight drop path is exercised with
    # overwhelming probability — what matters is exact parity below.
    con = duckdb.connect()
    con.register("events", pdf)
    oracle = {
        r[0]: (r[3], r[4])
        for r in con.execute(_poisson_bootstrap_sql()).fetchall()
    }
    con.close()
    assert got == oracle, {
        k: (got.get(k), oracle.get(k)) for k in got if got.get(k) != oracle.get(k)
    }


def test_funnel_step_window_is_honored(spark, duck):
    """Narrower windows must not increase conversions, and the
    parametrized oracle must match Spark at a NON-default width (the
    round-6 advisor found the width hardcoded to 12h)."""
    from realparse_spark.operators.analytics import funnel_steps, funnel_steps_sql
    from tests.oracle_harness import compare_query

    ev = load_table(spark, SF_DIR, "events")
    wide = funnel_steps(ev, "12 HOURS").collect()[0]
    narrow = funnel_steps(ev, "1 HOURS").collect()[0]
    assert narrow.n_view == wide.n_view  # stage 1 ignores the window
    assert narrow.n_view_click <= wide.n_view_click
    assert narrow.n_full_funnel <= wide.n_full_funnel
    ok, detail = compare_query(
        spark,
        duck,
        lambda s, d: funnel_steps(load_table(s, d, "events"), "1 HOURS"),
        funnel_steps_sql("1 HOURS"),
        SF_DIR,
    )
    assert ok, detail
