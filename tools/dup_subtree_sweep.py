"""Sweep all registered queries for duplicated heavy subtrees.

For each query's executedPlan (pre-execution, AQE initial): normalize
expression ids, then fingerprint each HashAggregate/Generate/Window/
SortMergeJoin node together with its indent-based subtree, and report
nodes whose normalized subtree text appears >= 2 times in one plan.
"""
import re, sys, time
sys.path.insert(0, "/root/repo")
from realparse_spark.registry import all_queries
from realparse_spark.session import get_spark
from realparse_spark.plans import explain as X

SF = "/root/testdata/sf0.001"
spark = get_spark("dup-sweep")
qs = all_queries()

def normalize(s):
    s = re.sub(r"#\d+[L]?", "#x", s)
    s = re.sub(r"plan_id=\d+", "plan_id=x", s)
    s = re.sub(r"MapPartitionsRDD\[\d+\]", "MPR[x]", s)
    s = re.sub(r"cached_\w+", "cached_x", s)
    return s

HEAVY = ("HashAggregate", "Generate", "Window", "SortMergeJoin", "ObjectHashAggregate", "SortAggregate")

report = []
for name in sorted(qs):
    t0 = time.time()
    try:
        plan = X.executed_plan(qs[name](spark, SF))
    except Exception as ex:
        print(f"ERR {name}: {str(ex)[:80]}", flush=True)
        continue
    lines = plan.splitlines()
    # indent of tree chars: find subtree spans by tree prefix length
    def indent(l):
        m = re.match(r"^[\s:+|-]*", l)
        return len(m.group(0))
    seen = {}
    n = len(lines)
    for i, l in enumerate(lines):
        if not any(h in l for h in HEAVY):
            continue
        if "Exchange" in l:
            pass
        ind = indent(l)
        # subtree: following lines with greater indent
        j = i + 1
        block = [normalize(l.strip())]
        while j < n and indent(lines[j]) > ind:
            block.append(normalize(lines[j].strip()))
            j += 1
        key = "\n".join(block)
        if len(block) < 2:
            continue
        seen.setdefault(key, []).append(i)
    dups = {k: v for k, v in seen.items() if len(v) >= 2}
    if dups:
        worst = max(dups.items(), key=lambda kv: (len(kv[1]), len(kv[0].splitlines())))
        depth = len(worst[0].splitlines())
        report.append((name, len(dups), len(worst[1]), depth, worst[0].splitlines()[0][:90]))
    if time.time() - t0 > 20:
        print(f"slow {name} {time.time()-t0:.0f}s", flush=True)

report.sort(key=lambda r: -(r[2] * r[3]))
print(f"\n{len(report)} queries with duplicated heavy subtrees (top 40 by count*depth):")
for name, ndups, cnt, depth, head in report[:40]:
    print(f"{name:32s} dup_groups={ndups:2d} worst_count={cnt} depth={depth:3d}  {head}")
