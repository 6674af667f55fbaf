"""Unit tests for bench.py's regression gates via the remeasure
callback — these code paths only execute during a real drift event, so
a live bench run cannot exercise them."""

from __future__ import annotations

from bench import gate_regressions


def _mk(floors_warm, floors_extra, sf=0.1):
    return {"sf": sf, "warm": floors_warm, "extra_warm": floors_extra}


def test_sf_mismatch_skips_all_gates():
    base = _mk({"a": 0.1}, {}, sf=0.01)
    regs, rem, ratio = gate_regressions(
        base, 0.1, {"a": 99.0}, {}, lambda n, k: 0.0
    )
    assert regs == [] and rem == {} and ratio is None


def test_clean_run_no_suspects_no_remeasure_calls():
    calls = []

    def never(n, k):
        calls.append(n)
        return 0.0

    base = _mk({"a": 1.0}, {"b": 0.5})
    regs, rem, ratio = gate_regressions(base, 0.1, {"a": 1.1}, {"b": 0.52}, never)
    assert regs == [] and rem == {} and calls == []
    assert ratio == round((1.1 + 0.52) / 1.5, 3)


def test_per_query_load_burst_does_not_reproduce():
    # first pass 5x over floor; retry lands at floor -> no regression,
    # but BOTH samples are published
    base = _mk({"a": 1.0}, {})
    regs, rem, ratio = gate_regressions(base, 0.1, {"a": 5.0}, {}, lambda n, k: 1.0)
    assert regs == []
    assert rem["a"] == {"first": 5.0, "retry_min": 1.0}
    # aggregate: got 5.0 vs floor 1.0 -> 5.0 > 1.25 triggers the
    # aggregate retry too; retry min(5.0, 1.0) = 1.0 -> ratio 1.0, clean
    assert rem["__aggregate__"] == {"first": 5.0, "retry_min": 1.0}
    assert ratio == 1.0


def test_per_query_real_regression_reproduces():
    base = _mk({"a": 1.0}, {})
    regs, rem, ratio = gate_regressions(base, 0.1, {"a": 5.0}, {}, lambda n, k: 4.9)
    assert len(regs) == 2  # per-query AND aggregate both reproduce
    assert "a:" in regs[0] and "aggregate" in regs[1]
    assert rem["a"] == {"first": 5.0, "retry_min": 4.9}
    assert rem["__aggregate__"]["retry_min"] == ratio == 4.9


def test_aggregate_drift_without_any_per_query_suspect():
    # every query 1.5x its sub-second floor: under 2x+0.5s individually,
    # but the fleet slid — exactly the round-6 blind spot
    floors = {f"q{i}": 0.4 for i in range(20)}
    got = {k: 0.6 for k in floors}
    base = _mk({}, floors)
    # retry reproduces the slide
    regs, rem, ratio = gate_regressions(base, 0.1, {}, dict(got), lambda n, k: 0.6)
    assert len(regs) == 1 and "aggregate" in regs[0]
    assert ratio == 1.5
    # retry comes back clean (load burst) -> published, not failed
    regs2, rem2, ratio2 = gate_regressions(
        base, 0.1, {}, dict(got), lambda n, k: 0.4
    )
    assert regs2 == []
    assert rem2["__aggregate__"] == {"first": 1.5, "retry_min": 1.0}
    assert ratio2 == 1.0


def test_retry_never_lowers_published_per_query_values():
    floors = {"a": 0.4, "b": 0.4}
    got = {"a": 0.7, "b": 0.7}
    base = _mk({}, floors)
    gate_regressions(base, 0.1, {}, got, lambda n, k: 0.1)
    # the aggregate retry min-merges into ITS OWN total; the caller's
    # per-query map must keep the first-pass protocol values
    assert got == {"a": 0.7, "b": 0.7}


def test_empty_floors_yield_none_ratio():
    regs, rem, ratio = gate_regressions(
        _mk({}, {}), 0.1, {"a": 1.0}, {}, lambda n, k: 0.0
    )
    assert regs == [] and ratio is None


def test_missing_floored_query_is_reported():
    # a floored query that produced no timing (errored / dropped from the
    # benched set) must surface as a regression, not silently vanish
    base = _mk({"a": 1.0}, {"b": 0.5, "c": 0.5})
    regs, rem, ratio = gate_regressions(
        base, 0.1, {"a": 1.0}, {"b": 0.5}, lambda n, k: 0.0
    )
    assert len(regs) == 1
    assert "absent" in regs[0] and "c" in regs[0]
    # the present queries still gate normally (clean here)
    assert ratio == 1.0


def test_aggregate_retry_reuses_per_query_min_of_3():
    # query "a" trips the per-query gate, collecting a min-of-3 retry;
    # the aggregate retry must min-merge THAT value, not re-measure
    calls = []

    def remeasure(n, k):
        calls.append((n, k))
        return 2.4

    base = _mk({"a": 1.0, "b": 1.0}, {})
    regs, rem, ratio = gate_regressions(
        base, 0.1, {"a": 9.0, "b": 1.2}, {}, remeasure
    )
    # per-query pass re-measured only the suspect (min of 3); the
    # aggregate pass re-measured only "b" (1 run) and reused a's 2.4
    assert calls == [("a", 3), ("b", 1)]
    assert rem["a"] == {"first": 9.0, "retry_min": 2.4}
    assert ratio == round((2.4 + 1.2) / 2.0, 3)


def test_driver_window_integrity():
    """The driver's CORRECTNESS run hard-caps at the first 50 registered
    queries, so the _PRIORITY window must be exactly 50 unique,
    registered names emitted FIRST — a typo would silently shrink the
    verified window."""
    from realparse_spark.registry import _PRIORITY, all_queries

    q = all_queries()
    assert len(_PRIORITY) == 50
    assert len(set(_PRIORITY)) == 50
    assert all(name in q for name in _PRIORITY)
    assert list(q)[:50] == list(_PRIORITY)


def test_wipe_snapshots_removes_only_snapshot_dirs(monkeypatch, tmp_path):
    """bench.py's cold-pass guard must delete exactly the installed
    <family-prefix><12-hex> snapshot dirs — never per-process scratch
    (realparse_results_*, realparse_stream_*), partial .tmp-<pid> dirs
    (the install protocol owns those), or the warehouse."""
    import tempfile

    from realparse_spark.cache import SNAPSHOT_PREFIXES, wipe_snapshots

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    keep = [
        "realparse_results_ab12cd34ef56",  # scratch family, not a snapshot
        "realparse_stream_e2e_x1",
        "realparse-warehouse",
        "realparse_lsh_0123456789ab.tmp-4242",  # partial builder dir
        "realparse_lsh_0123",  # wrong hash width
    ]
    wipe = [p + "0123456789ab" for p in SNAPSHOT_PREFIXES]
    for name in keep + wipe:
        (tmp_path / name).mkdir()
    assert wipe_snapshots() == len(wipe)
    left = {p.name for p in tmp_path.iterdir()}
    assert left == set(keep)
