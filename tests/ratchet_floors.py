"""Ratchet bench floors DOWN from a clean-host run.

Usage: python tests/ratchet_floors.py [BENCH_DETAIL.json] [--first-time-only]

--first-time-only relaxes the run-eligibility requirements (clean host,
green agg_ratio, empty regressions list) and ONLY for queries that have
no committed floor yet: a floor captured on a starved or drifting host
is LENIENT (inflated), so recording it cannot mis-flag anyone — it just
arms the regression gate for new queries until a clean-host run ratchets
it down (the round-9 precedent: first-time selection-family floors were
recorded from a 22/32-core run, annotated as conservative; round 11
extended the same argument to agg-red runs after two rounds of host
co-tenancy kept new queries floorless).  Existing floors are never
touched in this mode.

Reads the bench DETAIL output (default: repo BENCH_DETAIL.json — the
stdout summary/bench_out.json lacks `queries_extra_warm`, so extra floors
could never ratchet from it), refuses unless the run is PROVABLY
floor-eligible — agg_ratio green (<= 1.25), zero regressions, and
effective_cores >= 80% of nominal (a starved-host run would bake the
co-tenant's tax into the floors); a run MISSING any of those fields is
refused too, never waved through — then rewrites bench_baseline.json:

- existing floors: min(committed, this run)  (floors only ratchet down)
- queries benched for the first time: floor = this run's warm time
- never deletes a floor (a query dropped from EXTRA keeps its history;
  bench.py's missing-query gate decides what absence means)

Prints one line per change and a summary; appends a provenance note to
the baseline's extra_source field.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    out_path = (
        sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH_DETAIL.json")
    )
    base_path = os.path.join(REPO, "bench_baseline.json")
    run = json.load(open(out_path))
    base = json.load(open(base_path))

    n_cpu = os.cpu_count() or 1
    # absent evidence is refused, not waved through: a run that can't
    # show its agg_ratio / probe / regressions list is not floor-eligible
    for field in ("agg_ratio", "effective_cores", "regressions"):
        if field not in run or run[field] is None:
            print(f"REFUSE: run lacks {field} — not a gate-evaluated capture")
            return 1
    if "queries_extra_warm" not in run:
        print("REFUSE: no queries_extra_warm — pass BENCH_DETAIL.json, not the summary")
        return 1
    first_time_only = "--first-time-only" in sys.argv
    agg = run["agg_ratio"]
    eff = run["effective_cores"]
    if run["regressions"] and not first_time_only:
        print(f"REFUSE: run has regressions: {run['regressions']}")
        return 1
    if agg > 1.25 and not first_time_only:
        print(f"REFUSE: agg_ratio {agg} > 1.25 — not a green run")
        return 1
    if eff < 0.8 * n_cpu and not first_time_only:
        print(f"REFUSE: effective_cores {eff} < 80% of {n_cpu} — starved host")
        return 1
    if run.get("sf") != base.get("sf"):
        print(f"REFUSE: run sf {run.get('sf')} != baseline sf {base.get('sf')}")
        return 1

    changes = []
    for section_run, section_base in (
        ("queries_warm", "warm"),
        ("queries_extra_warm", "extra_warm"),
    ):
        got = run.get(section_run) or {}
        floors = base.setdefault(section_base, {})
        for name, t in sorted(got.items()):
            old = floors.get(name)
            if old is None:
                floors[name] = round(t, 3)
                changes.append(f"  + {section_base}.{name}: new floor {t:.3f}")
            elif t < old and not first_time_only:
                floors[name] = round(t, 3)
                changes.append(f"  v {section_base}.{name}: {old:.3f} -> {t:.3f}")

    if not changes:
        print("no floors to ratchet (run >= committed floors everywhere)")
        return 0
    mode = " first-time-only (conservative floors from a contended host)" if first_time_only else ""
    note = (
        f" Ratchet run{mode} (agg_ratio {agg}, effective_cores {eff}):"
        f" {len(changes)} floor(s) lowered/added."
    )
    base["extra_source"] = base.get("extra_source", "") + note
    with open(base_path, "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
        f.write("\n")
    print("\n".join(changes))
    print(f"ratcheted {len(changes)} floors; baseline updated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
