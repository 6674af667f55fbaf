"""Graph + linkage operator tests: PageRank's integer recurrence against
hand-computed values on a known graph; blocked fuzzy matching semantics
(blocking, distinct-first counts, threshold)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realparse_spark.operators.graph import pagerank
from realparse_spark.operators.linkage import blocked_fuzzy_pairs
from realparse_spark.plans import explain as X


def test_pagerank_hand_computed_path_graph(spark):
    # symmetric path A - B - C: deg A=1, B=2, C=1, N=3
    edges = spark.createDataFrame(
        [("A", "B"), ("B", "A"), ("B", "C"), ("C", "B")], ["src", "dst"]
    )
    out = {r["node"]: r for r in pagerank(edges, iterations=1).collect()}
    # r0 = 10^12 div 3 = 333333333333 for every node
    # A <- B/2: (15*333333333333 + 85*166666666666) div 100 = 191666666666
    # B <- A + C: (15*333333333333 + 85*666666666666) div 100 = 616666666666
    assert out["A"]["rank_micro"] == 191666666666
    assert out["C"]["rank_micro"] == 191666666666
    assert out["B"]["rank_micro"] == 616666666666
    assert out["A"]["deg"] == 1 and out["B"]["deg"] == 2


def test_pagerank_mass_conserved_and_converging(spark):
    edges = spark.createDataFrame(
        [("A", "B"), ("B", "A"), ("B", "C"), ("C", "B")], ["src", "dst"]
    )
    r3 = {r["node"]: r["rank_micro"] for r in pagerank(edges, iterations=3).collect()}
    # total mass stays ~SCALE (integer truncation only loses < N*100 units)
    assert abs(sum(r3.values()) - 1_000_000_000_000) < 3 * 100 + 3
    # hub keeps the highest rank at every depth
    assert r3["B"] > r3["A"] == r3["C"]


def test_pagerank_duplicate_edges_collapse(spark):
    # the operator declares distinct-edge semantics: repeating an edge
    # must not double its contribution
    once = spark.createDataFrame([("A", "B"), ("B", "A")], ["src", "dst"])
    dup = once.union(once)
    assert sorted(map(tuple, pagerank(once, 2).collect())) == sorted(
        map(tuple, pagerank(dup, 2).collect())
    )


def test_pagerank_edges_unique_skips_dedup_same_result(spark):
    # callers that guarantee one row per (src, dst) — e.g. the co-order
    # snapshot, whose build ends in groupBy(src, dst) — may skip the
    # per-iteration distinct shuffle; the ranks must be identical
    once = spark.createDataFrame(
        [("A", "B"), ("B", "A"), ("B", "C"), ("C", "B")], ["src", "dst"]
    )
    assert sorted(map(tuple, pagerank(once, 2).collect())) == sorted(
        map(tuple, pagerank(once, 2, edges_unique=True).collect())
    )
    # and the dedup aggregation is really gone from the plan
    from realparse_spark.plans import explain as X

    plan = X.executed_plan(pagerank(once, 2, edges_unique=True))
    import re

    # (single-key aggregates remain: deg's groupBy(src) is legitimate)
    assert not re.search(r"HashAggregate\(keys=\[src#\d+L?, dst#\d+", plan)


def test_weighted_pagerank_hand_computed(spark):
    # A - B heavy (w=3), B - C light (w=1): strength A=3, B=4, C=1, N=3
    edges = spark.createDataFrame(
        [("A", "B", 3), ("B", "A", 3), ("B", "C", 1), ("C", "B", 1)],
        ["src", "dst", "w"],
    )
    out = {
        r["node"]: r["rank_micro"]
        for r in pagerank(edges, iterations=1, weighted=True).collect()
    }
    # r0 = 333333333333 each
    # A <- B: (r0*3) div 4 = 249999999999 -> rA = (15*r0 + 85*249999999999) div 100
    base = 333333333333
    ra = (15 * base + 85 * ((base * 3) // 4)) // 100
    rc = (15 * base + 85 * ((base * 1) // 4)) // 100
    rb = (15 * base + 85 * (((base * 3) // 3) + ((base * 1) // 1))) // 100
    assert out == {"A": ra, "B": rb, "C": rc}
    # weights matter: A (heavy neighbor) outranks C (light neighbor)
    assert out["A"] > out["C"]


def test_fuzzy_pairs_blocking_and_counts(spark):
    df = spark.createDataFrame(
        [
            ("T1", "cold anvil"),
            ("T1", "cold anvil"),
            ("T1", "old anvil"),
            ("T2", "cold anvil"),  # same name, other block: must NOT pair
            ("T1", "blue widget"),  # far from everything in T1
        ],
        ["blk", "name"],
    )
    rows = blocked_fuzzy_pairs(df, "blk", "name", max_dist=2).collect()
    assert len(rows) == 1
    (r,) = rows
    assert (r["blk"], r["name_a"], r["name_b"], r["dist"]) == (
        "T1",
        "cold anvil",
        "old anvil",
        1,
    )
    # distinct-first counts carry the collapsed record mass
    assert (r["n_a"], r["n_b"]) == (2, 1)


def test_fuzzy_pairs_threshold_inclusive(spark):
    df = spark.createDataFrame(
        [("B", "abcd"), ("B", "abXY"), ("B", "abcZ")], ["blk", "name"]
    )
    out = blocked_fuzzy_pairs(df, "blk", "name", max_dist=2)
    got = {(r["name_a"], r["name_b"]): r["dist"] for r in out.collect()}
    # abcZ~abcd dist 1, abXY~abcd dist 2 (inclusive), abXY~abcZ dist 2
    assert got == {("abcZ", "abcd"): 1, ("abXY", "abcd"): 2, ("abXY", "abcZ"): 2}


def test_new_ops_stay_jvm_side(spark, sf_dir):
    from realparse_spark.registry import all_queries

    q = all_queries()
    for name in ("pagerank_parts", "fuzzy_match_parts"):
        df = q[name](spark, sf_dir)
        assert X.python_eval_nodes(df) == 0, name
        assert "CartesianProduct" not in X.executed_plan(df), name


def _sym_edges(spark, pairs):
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src long, dst long")


def test_triangle_counts_hand_graph(spark):
    """K4 plus a pendant vertex: each K4 vertex sits in C(3,2)=3
    triangles, the pendant in none (absent from output)."""
    from realparse_spark.operators.graph import triangle_counts

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    edges = _sym_edges(spark, k4)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    got = {r.node: r.n_triangles for r in triangle_counts(edges, deg).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_orientation_bounds_outdegree(spark):
    """A star graph (hub h joined to n spokes) has zero triangles, and
    orientation must point every edge AT the hub — the hub's out-degree
    is 0, so no wedge ever forms through it (the scale property)."""
    from realparse_spark.operators.graph import triangle_counts

    star = [(100, i) for i in range(1, 21)]
    edges = _sym_edges(spark, star)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    assert triangle_counts(edges, deg).count() == 0


def test_khop_rings_hand_graph(spark):
    """Path graph 1-2-3-4-5 seeded at 1: rings 0/1/2 are {1},{2},{3};
    4 and 5 sit beyond the 2-hop horizon (dist -1)."""
    from realparse_spark.operators.graph import khop_rings

    edges = _sym_edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    seed = spark.createDataFrame([(1,)], "node long")
    got = {r.dist: r.n_nodes for r in khop_rings(edges, seed, hops=2).collect()}
    assert got == {0: 1, 1: 1, 2: 1, -1: 2}
