"""Property tests for the round-6 session-2 operators: the Spark plans
must agree with straight-line Python reference implementations of the
same published algorithms (the same discipline as the winnowing
reference test in test_properties.py)."""

from __future__ import annotations

import random

from realparse_spark.operators.graph import _SCALE, pagerank
from realparse_spark.operators.linkage import blocked_fuzzy_pairs


def _pagerank_reference(edges: set[tuple[str, str]], iterations: int) -> dict[str, int]:
    """The exact integer recurrence, straight-line Python."""
    nodes = sorted({s for s, _ in edges})
    deg = {n: sum(1 for s, _ in edges if s == n) for n in nodes}
    n = len(nodes)
    r = {v: _SCALE // n for v in nodes}
    for _ in range(iterations):
        contrib: dict[str, int] = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0) + r[s] // deg[s]
        r = {
            v: (15 * (_SCALE // n) + 85 * contrib.get(v, 0)) // 100
            for v in nodes
        }
    return r


def _levenshtein_reference(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_pagerank_matches_reference_on_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(4):
        n_nodes = rng.randint(4, 12)
        names = [f"v{i}" for i in range(n_nodes)]
        undirected = set()
        for _ in range(rng.randint(n_nodes, 3 * n_nodes)):
            a, b = rng.sample(names, 2)
            undirected.add((a, b))
            undirected.add((b, a))
        edges = spark.createDataFrame(sorted(undirected), ["src", "dst"])
        iters = rng.randint(1, 4)
        got = {
            r["node"]: r["rank_micro"]
            for r in pagerank(edges, iterations=iters).collect()
        }
        want = _pagerank_reference(undirected, iters)
        assert got == want, (trial, iters)


def test_fuzzy_pairs_match_reference_dp(spark):
    rng = random.Random(7)
    vocab = ["cold", "old", "bold", "gold", "blue", "glue", "axle", "apple"]
    rows = [
        (f"B{rng.randint(0, 1)}", f"{rng.choice(vocab)} {rng.choice(vocab)}")
        for _ in range(40)
    ]
    df = spark.createDataFrame(rows, ["blk", "name"])
    got = {
        (r["blk"], r["name_a"], r["name_b"]): r["dist"]
        for r in blocked_fuzzy_pairs(df, "blk", "name", max_dist=3).collect()
    }
    # reference: all distinct within-block pairs under the DP distance
    names_by_blk: dict[str, set[str]] = {}
    for blk, name in rows:
        names_by_blk.setdefault(blk, set()).add(name)
    want = {}
    for blk, names in names_by_blk.items():
        for a in names:
            for b in names:
                if a < b and _levenshtein_reference(a, b) <= 3:
                    want[(blk, a, b)] = _levenshtein_reference(a, b)
    assert got == want
