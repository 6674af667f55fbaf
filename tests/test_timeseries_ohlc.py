"""Hand-computed semantics for time-weighted average and OHLC bars."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from realparse_spark.plans import explain as X


def _events(spark, rows):
    # (event_id, ts_seconds_offset, event_type, value)
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    data = [
        (eid, base + dt.timedelta(seconds=off), typ, float(v))
        for eid, off, typ, v in rows
    ]
    return spark.createDataFrame(data, ["event_id", "ts", "event_type", "value"])


def test_twa_hand_values(spark, monkeypatch, tmp_path):
    import realparse_spark.operators.analytics as A

    # type 'a': value 10 held for 30s, then 20 held for 10s, then closes.
    # TWA = (10*30 + 20*10) / 40 = 12.5 -> twa_e4 = 125000
    ev = _events(
        spark,
        [
            (1, 0, "a", 10.0),
            (2, 30, "a", 20.0),
            (3, 40, "a", 99.0),  # last sample: no interval
        ],
    )
    monkeypatch.setattr(
        "realparse_spark.sources.tables.load_table", lambda s, d, t: ev
    )
    (r,) = A.q_time_weighted_avg(spark, "x").collect()
    assert r["event_type"] == "a"
    assert r["twa_e4"] == 125_000
    assert r["sum_dt_us"] == 40_000_000
    assert r["n_intervals"] == 2


def test_twa_burst_does_not_dominate(spark, monkeypatch):
    import realparse_spark.operators.analytics as A

    # 100 samples of value 100 in one second, then value 0 held 99 seconds:
    # row-average ~99; TWA ~1
    rows = [(i, i * 0.01, "b", 100.0) for i in range(100)]
    rows.append((1000, 1.0, "b", 0.0))
    rows.append((1001, 100.0, "b", 0.0))
    base = dt.datetime(2024, 1, 1)
    data = [
        (eid, base + dt.timedelta(seconds=off), typ, v) for eid, off, typ, v in rows
    ]
    ev = spark.createDataFrame(data, ["event_id", "ts", "event_type", "value"])
    monkeypatch.setattr(
        "realparse_spark.sources.tables.load_table", lambda s, d, t: ev
    )
    (r,) = A.q_time_weighted_avg(spark, "x").collect()
    # burst occupies ~1% of the span -> TWA ~1.0, far from the row mean
    assert r["twa_e4"] < 30_000  # < 3.0


def test_ohlc_hand_values(spark, monkeypatch):
    import realparse_spark.operators.analytics as A

    ev = _events(
        spark,
        [
            (1, 0, "a", 5.0),     # open
            (2, 60, "a", 9.0),    # high
            (3, 120, "a", 1.0),   # low
            (4, 180, "a", 7.0),   # close
            (5, 3600, "a", 2.0),  # next hour bucket
        ],
    )
    monkeypatch.setattr(
        "realparse_spark.sources.tables.load_table", lambda s, d, t: ev
    )
    rows = A.q_event_ohlc(spark, "x").collect()
    assert len(rows) == 2
    first = rows[0]
    assert (first["open"], first["high"], first["low"], first["close"]) == (
        5.0,
        9.0,
        1.0,
        7.0,
    )
    assert first["n_events"] == 4
    assert rows[1]["open"] == rows[1]["close"] == 2.0


def test_timeseries_queries_jvm_side(spark, sf_dir):
    from realparse_spark.registry import all_queries

    q = all_queries()
    for name in ("time_weighted_avg", "event_ohlc"):
        df = q[name](spark, sf_dir)
        assert X.python_eval_nodes(df) == 0, name
        assert "CartesianProduct" not in X.executed_plan(df), name


def test_event_gaps_hand_values(spark, monkeypatch):
    import realparse_spark.operators.analytics as A

    # ten 1-second gaps then one 100-second gap: mean = 109s div 10 = 10s,
    # threshold 5x = 50s -> only the 100s gap is flagged
    offs = list(range(10)) + [109]
    ev = _events(spark, [(i, off, "a", 1.0) for i, off in enumerate(offs)])
    monkeypatch.setattr(
        "realparse_spark.sources.tables.load_table", lambda s, d, t: ev
    )
    rows = A.q_event_gaps(spark, "x").collect()
    assert len(rows) == 1
    (r,) = rows
    assert r["gap_us"] == 100_000_000
    assert r["gap_start"] == dt.datetime(2024, 1, 1, 0, 0, 9)
    # severity = gap*100 div mean(10.9s -> 10_900_000us) = 917 percent
    assert r["severity_pct"] == 917


def test_event_gaps_uniform_series_is_quiet(spark, monkeypatch):
    import realparse_spark.operators.analytics as A

    ev = _events(spark, [(i, i * 10, "a", 1.0) for i in range(50)])
    monkeypatch.setattr(
        "realparse_spark.sources.tables.load_table", lambda s, d, t: ev
    )
    assert A.q_event_gaps(spark, "x").collect() == []


def test_event_cusum_finds_level_shift(spark, monkeypatch):
    import realparse_spark.operators.analytics as A

    # level shift: 20 samples at 10.0 then 20 samples at 20.0 ->
    # mean 15, CUSUM descends to its extreme exactly at the shift point
    rows = [(i, i, "a", 10.0) for i in range(20)]
    rows += [(i, i, "a", 20.0) for i in range(20, 40)]
    ev = _events(spark, rows)
    monkeypatch.setattr(
        "realparse_spark.sources.tables.load_table", lambda s, d, t: ev
    )
    (r,) = A.q_event_cusum(spark, "x").collect()
    # cusum after i samples of (10-15)= -5 units: minimum at i=20 (the
    # last pre-shift sample), value -5.0000e4 * 20 = -1_000_000
    assert r["cusum_e4"] == -1_000_000
    assert r["change_ts"] == dt.datetime(2024, 1, 1, 0, 0, 19)
    assert r["n_events"] == 40


def test_event_cusum_constant_series_zero(spark, monkeypatch):
    import realparse_spark.operators.analytics as A

    ev = _events(spark, [(i, i, "a", 7.0) for i in range(30)])
    monkeypatch.setattr(
        "realparse_spark.sources.tables.load_table", lambda s, d, t: ev
    )
    (r,) = A.q_event_cusum(spark, "x").collect()
    # constant series: every deviation 0 -> extreme is 0, pinned to the
    # FIRST row by the (|cusum| desc, ts, event_id) tie-break
    assert r["cusum_e4"] == 0
    assert r["change_ts"] == dt.datetime(2024, 1, 1, 0, 0, 0)


def test_interval_coverage_merges_overlap_and_touching(spark, monkeypatch):
    import realparse_spark.operators.analytics as A

    # [0,10) overlaps [5,15); [15,20) touches (half-open: coalesces);
    # [100,101) stands alone -> 2 spans, 21s covered, 101s extent
    ev = _events(
        spark,
        [(0, 0, "a", 10.0), (1, 5, "a", 10.0), (2, 15, "a", 5.0), (3, 100, "a", 1.0)],
    )
    monkeypatch.setattr(
        "realparse_spark.sources.tables.load_table", lambda s, d, t: ev
    )
    (r,) = A.q_interval_coverage(spark, "x").collect()
    assert (r.n_spans, r.covered_us, r.extent_us) == (2, 21_000_000, 101_000_000)


def test_event_mad_outliers_hand_values(spark, monkeypatch):
    import realparse_spark.operators.analytics as A

    # values 1,2,3,4,100: median 3 -> med2=60000 (e4, doubled);
    # dev2 = |2v-med2| = 40000,20000,0,20000,1940000, median 20000 ->
    # mad4=40000; outlier test 2*dev2 > 3*mad4 flags only the 100
    ev = _events(spark, [(i, i, "a", v) for i, v in enumerate([1, 2, 3, 4, 100])])
    monkeypatch.setattr(
        "realparse_spark.sources.tables.load_table", lambda s, d, t: ev
    )
    (r,) = A.q_event_mad_outliers(spark, "x").collect()
    assert (r.n, r.med2_e4, r.mad4_e4, r.n_outliers, r.max_outlier_e4) == (
        5, 60000, 40000, 1, 1000000
    )


def test_hist_quantiles_within_one_bucket_of_exact(spark):
    """The histogram estimate's hard error bound: the selected bucket
    CONTAINS the rank-ceil(n*q/100) order statistic, so each estimate
    lands within one bucket width of that exact order statistic."""
    import realparse_spark.operators.analytics as A
    from realparse_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    est = {r.event_type: r for r in A.q_hist_quantiles(spark, sf).collect()}
    ev = load_table(spark, sf, "events").select(
        "event_type", F.floor(F.col("value") * 10000).cast("bigint").alias("v")
    )
    by_type = {}
    for r in ev.collect():
        by_type.setdefault(r.event_type, []).append(r.v)
    assert est and est.keys() == by_type.keys()
    for t, e in est.items():
        vs = sorted(by_type[t])
        n = len(vs)
        width = (vs[-1] - vs[0]) // A.HIST_BUCKETS + 1
        for q in (50, 95, 99):
            got = getattr(e, f"p{q}_e4")
            want = vs[(n * q + 99) // 100 - 1]  # rank-r order statistic
            assert abs(got - want) <= width, (t, q, got, want, width)


def test_event_ewma_smooths_toward_recent_level(spark, monkeypatch, tmp_path):
    """EWMA invariants on a planted two-level series: on the flat prefix
    ewma == the level exactly (weights renormalize); after a step change
    the smoothed value moves toward the new level but lags it (strictly
    between old and new); a gap day contributes nothing (n_days drops)."""
    import datetime

    from realparse_spark.operators.analytics import q_event_ewma

    rows = []
    d0 = datetime.datetime(2020, 1, 1, 12, 0, 0)
    for i in range(6):  # level 10 for 6 days
        rows.append((i, d0 + datetime.timedelta(days=i), 1, "a", 10.0, "{}"))
    rows.append((10, d0 + datetime.timedelta(days=7), 1, "a", 100.0, "{}"))  # gap at day 6, jump
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    import realparse_spark.sources.tables as tables

    real = tables.load_table

    def fake(spark_, sf_dir, name):
        if name == "events":
            return spark_.read.parquet(str(tmp_path / "events.parquet"))
        return real(spark_, sf_dir, name)

    monkeypatch.setattr(tables, "load_table", fake)
    import realparse_spark.operators.analytics as an

    monkeypatch.setattr(an, "load_table", fake)
    out = {str(r.day): r for r in q_event_ewma(spark, "unused").collect()}
    flat = out["2020-01-05"]  # 5 prior flat days in window
    assert flat.ewma == 10.0
    jump = out["2020-01-08"]
    assert jump.n_days >= 2  # the jump day + surviving flat tail
    assert 10.0 < jump.ewma < 100.0
    assert jump.ewma > 50.0  # weight 1 on the new level dominates the tail


def test_forecast_backtest_perfect_weekly_cycle(spark, monkeypatch, tmp_path):
    """A perfectly weekly-periodic series backtests to MAE = bias =
    wape = 0 (the seasonal-naive forecast is exact); breaking one day
    by +delta yields mae = bias = delta/n on the evaluated days; days
    without a d-7 partner are excluded from n_days."""
    import datetime

    from realparse_spark.operators.analytics import q_forecast_backtest

    d0 = datetime.datetime(2020, 3, 1, 9, 0, 0)
    rows = []
    i = 0
    for day in range(21):  # 3 exact weekly cycles
        v = float(10 + (day % 7))
        rows.append((i, d0 + datetime.timedelta(days=day), 1, "clean", v, "{}")); i += 1
    for day in range(21):
        v = float(10 + (day % 7)) + (5.0 if day == 14 else 0.0)  # one broken day
        rows.append((i, d0 + datetime.timedelta(days=day), 1, "broken", v, "{}")); i += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    import realparse_spark.operators.analytics as an
    import realparse_spark.sources.tables as tables

    real = tables.load_table

    def fake(spark_, sf_dir, name):
        if name == "events":
            return spark_.read.parquet(str(tmp_path / "events.parquet"))
        return real(spark_, sf_dir, name)

    monkeypatch.setattr(tables, "load_table", fake)
    monkeypatch.setattr(an, "load_table", fake)
    out = {r.event_type: r for r in q_forecast_backtest(spark, "unused").collect()}
    clean, broken = out["clean"], out["broken"]
    assert clean.n_days == 14  # days 7..20 have a d-7 partner
    assert clean.mae == 0.0 and clean.bias == 0.0 and clean.wape == 0.0
    assert broken.n_days == 14
    # only day 14 misses (by +5 vs its day-7 forecast); day 21, where the
    # broken value would serve as forecast, does not exist
    assert broken.mae == round(5.0 / 14, 4)
    assert broken.bias == round(5.0 / 14, 4)
    assert broken.wape > 0
