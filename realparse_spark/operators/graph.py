"""Iterative graph algorithms as DataFrame plans: PageRank.

The reference has no graph surface; a training-data pipeline does —
link-graph centrality ranks crawl frontiers and weights documents by
authority (the original PageRank use case), and the same join-aggregate
iteration underlies label propagation and influence scoring.

Exactness discipline
--------------------
Power iteration is inherently float — and float sums are
order-dependent, so a Spark result and a DuckDB oracle would drift in
the last bits.  Here ranks are BIGINT micro-units (SCALE = 1e12):

    r0(v)     = SCALE div N
    r_{k+1}(v) = (15 * (SCALE div N) + 85 * sum_{u->v} (r_k(u) div deg(u))) div 100

Every operation is integral (div = truncating integer division; all
values non-negative so truncation == floor in both engines), every sum
is an exact BIGINT sum — associative, partitioning-invariant, and
engine-identical.  The oracle unrolls the same recurrence in SQL.

100 TB design
-------------
- The edge list is the big table; it is shuffled ONCE per iteration on
  `src` (join with ranks) and once on `dst` (contribution sum) — the
  same two-exchange shape GraphX/Pregel lowers to.  In production the
  edge list is bucketed by `src` so the rank join co-locates without a
  shuffle, leaving one exchange per iteration.
- Per-iteration state is one (node, rank) row per vertex — O(V), tiny
  next to O(E); the iteration count is fixed (compile-time unrolled
  into one lazy plan), so lineage depth is bounded.  For >10
  iterations, `localCheckpoint` per iteration caps plan growth (same
  discipline as dedup.py's connected components, dedup.py:552).
- Candidate-pair generation (co-order graph) is a self-join on the
  basket key: the quadratic term is bounded by basket size (max lines
  per order), not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCALE = 1_000_000_000_000  # rank micro-units per unit of probability mass


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    broadcast_ranks: bool = False,
    deg: DataFrame | None = None,
    weighted: bool = False,
    edges_unique: bool = False,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list (src, dst).

    Returns (node, deg, rank_micro): rank in SCALE-denominated integer
    units (sum over nodes ~= SCALE up to truncation).  Nodes are the
    distinct `src` values; with a symmetric edge list that is every
    vertex.  `iterations` is compile-time: the loop unrolls into one
    lazy DataFrame plan.

    The edge list is consumed 1 + k times (deg, then once per
    iteration); callers should hand in a MATERIALIZED edge table (a
    parquet/bucketed scan), not an expensive derivation — Spark will
    re-evaluate the input subtree per consumer.  `broadcast_ranks=True`
    turns each iteration's contribution join into a broadcast hash join:
    correct whenever the O(V) rank table fits an executor (V is
    typically orders of magnitude below E); with billions of vertices
    leave it False and bucket the edge table by `src` so the
    shuffle-join co-locates instead.

    `weighted=True` distributes each node's rank proportionally to edge
    weight instead of uniformly: contribution = (r_u * w_uv) div
    strength_u with strength_u = sum of u's outgoing weights.  The
    edge list must then carry a `w` column with ONE row per (src, dst),
    and `deg` (if supplied) must hold the strength in its `deg` column.
    Still all-BIGINT, still bit-exact.
    """
    if weighted:
        edges = edges.select("src", "dst", F.col("w").cast("bigint").alias("w"))
    elif edges_unique:
        # caller guarantees one row per (src, dst) — e.g. the co-order
        # snapshot, whose build pass ends in groupBy(src, dst).  The
        # dedup below is then "a distinct on data that is already
        # unique" (guide §2.4), and because `edges` is re-read once per
        # iteration it would cost a FULL edge shuffle per iteration —
        # the duplicated-subtree sweep found it evaluated 3x in
        # q_pagerank_parts' executed plan.
        edges = edges.select("src", "dst")
    else:
        edges = edges.select("src", "dst").distinct()
    if deg is None:
        # deg's subtree is re-evaluated per iteration (it seeds every
        # rebuild of the rank table) — when the edge list is a derived
        # plan this is a full shuffle of E rows per iteration.  Callers
        # on big graphs should pass a materialized (src, deg) table,
        # turning each re-evaluation into a trivial O(V) scan.
        if weighted:
            deg = edges.groupBy("src").agg(
                F.sum("w").cast("bigint").alias("deg")
            )
        else:
            deg = edges.groupBy("src").agg(
                F.count(F.lit(1)).cast("bigint").alias("deg")
            )
    else:
        deg = deg.select("src", F.col("deg").cast("bigint").alias("deg"))
    n_nodes = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    # 1-row broadcast scalar (same idiom as the other scalar-threshold
    # queries): keeps N in-plan without a driver collect
    base = deg.crossJoin(F.broadcast(n_nodes)).select(
        F.col("src").alias("node"), "deg", "n_nodes"
    )
    ranks = base.select(
        "node", "deg", F.expr(f"{_SCALE} div n_nodes").alias("r"), "n_nodes"
    )
    # Each iteration rebuilds ranks from the STATIC base table + the new
    # contribution sums, so ranks_{k-1} appears exactly ONCE in
    # ranks_k's lineage (inside contrib).  Referencing the previous
    # ranks on both sides of the update join would double-evaluate it
    # per iteration — a 2^k lineage blowup Spark will happily execute.
    for _ in range(iterations):
        rank_side = F.broadcast(ranks) if broadcast_ranks else ranks
        per_edge = "(r * w) div deg" if weighted else "r div deg"
        contrib = (
            edges.join(rank_side, edges["src"] == rank_side["node"])
            .select("dst", F.expr(per_edge).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("bigint").alias("s"))
        )
        if broadcast_ranks:
            contrib = F.broadcast(contrib)
        ranks = (
            base.join(contrib, base["node"] == contrib["dst"], "left")
            .select(
                "node",
                "deg",
                F.expr(
                    f"(15 * ({_SCALE} div n_nodes) + 85 * coalesce(s, 0L)) div 100"
                ).alias("r"),
                "n_nodes",
            )
        )
    return ranks.select("node", "deg", F.col("r").alias("rank_micro"))


# Materialized graph snapshot, fingerprint-keyed per corpus (same cache
# discipline as dedup's cluster table, dedup.py:650): weighted edges,
# degree, per-item supports, and the basket total, all derived in one
# build pass.  The iterative consumer reads the edge list 1 + k times
# and market_basket reads the same snapshot (analytics.py), so
# production pipelines derive the graph ONCE per snapshot and every
# consumer scans the compact tables — re-running the basket self-join
# per consumer/iteration would multiply the most expensive stage by
# their count.
_EDGES: dict[tuple, str] = {}


def _co_order_edges_for(spark: SparkSession, sf_dir: str) -> str:
    import os

    from realparse_spark.cache import fingerprint_key, snapshot_path

    def _build(tmp: str) -> None:
        from realparse_spark.sources.tables import load_table

        li = (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
        b = li.select(
            F.col("l_orderkey").alias("ok_b"), F.col("l_partkey").alias("dst")
        )
        edges = (
            a.join(b, (F.col("ok") == F.col("ok_b")) & (F.col("src") != F.col("dst")))
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        )
        # Both the edge list and the degree table are part of the
        # snapshot — the iterative consumer reads deg once per iteration,
        # so it must be an O(V) scan, not a recomputed O(E) shuffle.
        edges.write.mode("overwrite").parquet(os.path.join(tmp, "edges"))
        spark.read.parquet(os.path.join(tmp, "edges")).groupBy("src").agg(
            F.count(F.lit(1)).cast("bigint").alias("deg"),
            F.sum("w").cast("bigint").alias("strength"),
        ).write.mode("overwrite").parquet(os.path.join(tmp, "deg"))
        # per-item support and the basket total round out the snapshot:
        # market_basket's lift needs them, and both are one cheap narrow
        # aggregate at build time vs a corpus re-scan per consumer
        li.groupBy(F.col("l_partkey").alias("part")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_item")
        ).write.mode("overwrite").parquet(os.path.join(tmp, "items"))
        li.agg(
            F.count_distinct(F.col("l_orderkey")).cast("bigint").alias("n_orders")
        ).write.mode("overwrite").parquet(os.path.join(tmp, "totals"))
        # snapshot_path adds the top-level _SUCCESS marker only after
        # ALL sub-tables landed

    # v3: edges carry the co-order count `w` (market_basket and
    # weighted PageRank read it; unweighted PageRank's column pruning
    # never materializes it) and deg carries strength alongside degree
    return snapshot_path(
        _EDGES,
        fingerprint_key(sf_dir, "lineitem", 3),
        "realparse_coedges_",
        _build,
    )


def q_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph: parts are vertices,
    symmetric edges link parts bought in the same order (basket
    self-join, quadratic only in basket size).  3 iterations, damping
    0.85, exact integer arithmetic — the oracle unrolls the identical
    recurrence in SQL, so values must hash-match, not merely correlate.
    The rank table is O(|parts|) — far under the broadcast threshold at
    any scale where the part dim itself broadcasts — so each iteration
    is a broadcast join + one map-side-combined shuffle of partials."""
    import os

    snap = _co_order_edges_for(spark, sf_dir)
    edges = spark.read.parquet(os.path.join(snap, "edges"))
    deg = spark.read.parquet(os.path.join(snap, "deg"))
    out = pagerank(
        edges, iterations=3, broadcast_ranks=True, deg=deg, edges_unique=True
    )
    return (
        out.select(
            F.col("node").cast("bigint").alias("part"),
            "deg",
            "rank_micro",
        )
        .orderBy(F.col("rank_micro").desc(), "part")
        .limit(100)
    )


def q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the same co-purchase snapshot: a node's
    rank is distributed proportionally to co-order counts (strength),
    so frequently-paired parts pull more authority than incidental
    ones.  Same integer exactness, same snapshot tables (edges read
    WITH the weight column, deg table read for its strength)."""
    import os

    snap = _co_order_edges_for(spark, sf_dir)
    edges = spark.read.parquet(os.path.join(snap, "edges"))
    strength = spark.read.parquet(os.path.join(snap, "deg")).select(
        "src", F.col("strength").alias("deg")
    )
    out = pagerank(
        edges, iterations=3, broadcast_ranks=True, deg=strength, weighted=True
    )
    return (
        out.select(
            F.col("node").cast("bigint").alias("part"),
            F.col("deg").alias("strength"),
            "rank_micro",
        )
        .orderBy(F.col("rank_micro").desc(), "part")
        .limit(100)
    )


def _pagerank_sql(iterations: int = 3, weighted: bool = False) -> str:
    contrib = "sum((r.r * p.w) // r.s)" if weighted else "sum(r.r // r.deg)"
    divisor_col = "s" if weighted else "deg"
    div_def = (
        "SELECT src, CAST(sum(w) AS BIGINT) AS s FROM pairs GROUP BY src"
        if weighted
        else "SELECT src, CAST(count(*) AS BIGINT) AS deg FROM pairs GROUP BY src"
    )
    out_div = "s AS strength" if weighted else "deg"
    prev = "r0"
    iters = []
    for k in range(1, iterations + 1):
        iters.append(
            f"""it{k} AS (
  SELECT d.src AS node, d.{divisor_col},
    CAST((15 * (1000000000000 // (SELECT n_nodes FROM n))
          + 85 * coalesce(c.c, 0)) // 100 AS BIGINT) AS r
  FROM divisor d LEFT JOIN (
    SELECT p.dst AS dst, CAST({contrib} AS BIGINT) AS c
    FROM pairs p JOIN {prev} r ON p.src = r.node GROUP BY p.dst
  ) c ON d.src = c.dst
)"""
        )
        prev = f"it{k}"
    joined_iters = ",\n".join(iters)
    return f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst, CAST(count(*) AS BIGINT) AS w
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
),
divisor AS ({div_def}),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM divisor),
r0 AS (
  SELECT src AS node, {divisor_col},
    CAST(1000000000000 // (SELECT n_nodes FROM n) AS BIGINT) AS r
  FROM divisor
),
{joined_iters}
SELECT CAST(node AS BIGINT) AS part, {out_div}, r AS rank_micro
FROM {prev}
ORDER BY rank_micro DESC, part
LIMIT 100
"""


def triangle_counts(edges: DataFrame, deg: DataFrame) -> DataFrame:
    """Per-vertex triangle counts over a SYMMETRIC edge list via
    degree-ordered orientation (Cohen / Suri-Vassilvitskii MapReduce
    triangle counting): direct every undirected edge from its
    (deg, node)-smaller endpoint to the larger, so each triangle
    survives as exactly ONE oriented wedge + closing edge, and — the
    scale property — every vertex's out-degree is O(sqrt(E)) no matter
    how big a hub it is.  The wedge self-join's intermediate is
    sum(outdeg^2) <= E^1.5 instead of the sum(deg^2) blowup a naive
    wedge join suffers on power-law graphs.

    The oriented closure is evaluated by ADJACENCY INTERSECTION, not a
    wedge self-join: each oriented edge (u, v) picks up both endpoints'
    sorted out-neighbor arrays and explodes ``array_intersect(N+(u),
    N+(v))`` — one output row per TRIANGLE.  A wedge self-join
    materializes and shuffles sum(outdeg^2) rows before the closing
    edge prunes them; on a dense graph that dwarfs the triangle count
    (measured at sf0.1: 49M wedges vs 1.2M oriented edges, 18 s -> 3 s).
    The intersection does the same sum(outdeg^2) comparisons but inside
    one codegen stage, emitting only closures.  The out-neighbor table
    is O(V) rows of O(sqrt(E))-bounded arrays (the orientation bound),
    so it broadcasts; beyond broadcast reach the two attach-joins
    become shuffle joins on the edge endpoints and the shape still
    holds — nothing sum(outdeg^2)-sized is ever shuffled.

    Returns (node, n_triangles), every vertex of each triangle
    credited.  Exact, integer, engine-portable."""
    d = F.broadcast(deg.select("node", "deg"))
    da = d.select(F.col("node").alias("src"), F.col("deg").alias("dsrc"))
    db = d.select(F.col("node").alias("dst"), F.col("deg").alias("ddst"))
    oriented = (
        edges.select("src", "dst")
        .join(da, "src")
        .join(db, "dst")
        .filter(
            (F.col("dsrc") < F.col("ddst"))
            | ((F.col("dsrc") == F.col("ddst")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst")
    )
    nbrs = oriented.groupBy("src").agg(
        F.array_sort(F.collect_list("dst")).alias("nb")
    )
    na = F.broadcast(
        nbrs.select(F.col("src").alias("a"), F.col("nb").alias("nb_a"))
    )
    nc = F.broadcast(
        nbrs.select(F.col("src").alias("b"), F.col("nb").alias("nb_b"))
    )
    tri = (
        oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .join(na, "a")
        .join(nc, "b")
        .select(
            "a",
            "b",
            F.explode(F.array_intersect("nb_a", "nb_b")).alias("c"),
        )
    )
    # materialized once: the 3-way member union references `tri` three
    # times, and without the lineage cut the attach-joins + intersection
    # (the dominant stage) would run once per branch
    tri = tri.localCheckpoint()
    member = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return member.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by triangle participation in the co-purchase graph —
    the local-clustering signal (is this part bought in tight bundles or
    incidental pairs?).  Reads the shared co-order snapshot; the deg
    table is O(V) and broadcasts."""
    import os

    snap = _co_order_edges_for(spark, sf_dir)
    edges = spark.read.parquet(os.path.join(snap, "edges"))
    deg = spark.read.parquet(
        os.path.join(snap, "deg")
    ).select(F.col("src").alias("node"), "deg")
    return (
        triangle_counts(edges, deg)
        .select(F.col("node").cast("bigint").alias("part"), "n_triangles")
        .orderBy(F.col("n_triangles").desc(), "part")
        .limit(20)
    )


GRAPH_TRIANGLES_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
edges AS (
  SELECT a.p AS src, b.p AS dst
  FROM li a JOIN li b ON a.ok = b.ok AND a.p <> b.p
  GROUP BY 1, 2
),
deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
oriented AS (
  SELECT e.src, e.dst
  FROM edges e
  JOIN deg da ON da.node = e.src
  JOIN deg db ON db.node = e.dst
  WHERE da.deg < db.deg OR (da.deg = db.deg AND e.src < e.dst)
),
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM oriented e1
  JOIN oriented e2 ON e1.dst = e2.src
  JOIN oriented e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
member AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT CAST(node AS BIGINT) AS part,
       CAST(count(*) AS BIGINT) AS n_triangles
FROM member
GROUP BY node
ORDER BY n_triangles DESC, part
LIMIT 20
"""


def khop_rings(edges: DataFrame, seed: DataFrame, hops: int = 2) -> DataFrame:
    """BFS ring sizes from a seed set: how many vertices sit at
    distance 0, 1, .., ``hops``, plus one row (dist = -1) for vertices
    beyond the horizon — the reachability profile a crawl scheduler or
    blast-radius query needs.

    Unrolled frontier BFS: per hop, frontier ⋈ edges -> distinct ->
    anti-join visited.  The frontier and visited sets are O(V) (node
    ids only, never paths); each hop is one equi-join on the edge list
    plus one distinct — the Pregel lowering, with hop count fixed at
    plan time so lineage stays bounded.  Exact and engine-portable."""
    verts = edges.select(F.col("src").alias("node")).distinct()
    rings = [seed.select("node").distinct()]
    visited = rings[0]
    for _ in range(hops):
        frontier = rings[-1]
        nxt = (
            edges.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
        )
        rings.append(nxt)
        visited = visited.unionAll(nxt)
    out = None
    for d, ring in enumerate(rings):
        row = ring.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes")).select(
            F.lit(d).cast("int").alias("dist"), "n_nodes"
        )
        out = row if out is None else out.unionAll(row)
    beyond = (
        verts.join(visited, "node", "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .select(F.lit(-1).cast("int").alias("dist"), "n_nodes")
    )
    return out.unionAll(beyond).orderBy("dist")


def q_graph_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop reach profile of the co-purchase graph from its smallest
    part id (deterministic seed)."""
    import os

    snap = _co_order_edges_for(spark, sf_dir)
    edges = spark.read.parquet(os.path.join(snap, "edges")).select("src", "dst")
    seed = edges.agg(F.min("src").alias("node"))
    return khop_rings(edges, seed, hops=2)


GRAPH_KHOP_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
edges AS (
  SELECT a.p AS src, b.p AS dst
  FROM li a JOIN li b ON a.ok = b.ok AND a.p <> b.p
  GROUP BY 1, 2
),
verts AS (SELECT DISTINCT src AS node FROM edges),
d0 AS (SELECT min(src) AS node FROM edges),
d1 AS (
  SELECT DISTINCT e.dst AS node FROM edges e JOIN d0 ON e.src = d0.node
  WHERE e.dst NOT IN (SELECT node FROM d0)
),
d2 AS (
  SELECT DISTINCT e.dst AS node FROM edges e JOIN d1 ON e.src = d1.node
  WHERE e.dst NOT IN (SELECT node FROM d0)
    AND e.dst NOT IN (SELECT node FROM d1)
)
SELECT CAST(0 AS INTEGER) AS dist, CAST(count(*) AS BIGINT) AS n_nodes FROM d0
UNION ALL SELECT 1, count(*) FROM d1
UNION ALL SELECT 2, count(*) FROM d2
UNION ALL SELECT -1, count(*) FROM verts
  WHERE node NOT IN (SELECT node FROM d0)
    AND node NOT IN (SELECT node FROM d1)
    AND node NOT IN (SELECT node FROM d2)
ORDER BY dist
"""


# 64 sits under the fixture graph's median degree (~115 at every SF) so
# hub centers are excluded at all scales while low-degree centers still
# produce candidates — the knob a deployment tunes to its degree
# distribution (wedge work is sum over centers of deg², cap² bounded)
_CN_DEG_CAP = 64


def common_neighbor_candidates(
    edges: DataFrame, deg: DataFrame, center_cap: int = _CN_DEG_CAP, top: int = 20
) -> DataFrame:
    """Link prediction by common-neighbor count: the top NON-adjacent
    vertex pairs sharing the most neighbors — 'parts that should be
    bundled but never were' over the co-order graph.

    Scale shape: wedge enumeration is sum(deg(center)²) and a hub center
    connects everything-to-everything while carrying no discriminative
    signal (the same reason Adamic-Adar down-weights high-degree common
    neighbors to ~0) — so centers above `center_cap` are EXCLUDED, the
    documented policy knob mirroring the dedup df_cap.  Surviving
    centers' neighbor arrays are O(cap), so candidate pairs generate
    IN-ROW (index-aware transform over the sorted array — no quadratic
    shuffle; the wire only carries (u, v, partial-count) rows), existing
    edges are removed with a left-anti join, and the ranking is
    TakeOrdered."""
    centers = deg.filter(F.col("deg") <= center_cap).select("node")
    nb = (
        edges.join(centers, edges.src == centers.node)
        .groupBy("src")
        .agg(F.array_sort(F.collect_list("dst")).alias("nb"))
    )
    pairs = nb.select(
        F.explode(
            F.expr(
                "flatten(transform(nb, (x, i) ->"
                " transform(slice(nb, i + 2, size(nb)), y -> struct(x AS u, y AS v))))"
            )
        ).alias("p")
    ).select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
    cn = pairs.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common")
    )
    # candidates always have u < v (in-row generation walks a SORTED
    # neighbor array), and the edge list is symmetric — so the anti-join
    # needs only the src < dst half, which halves both the scan (the
    # filter pushes to parquet) and the anti-join shuffle
    nonadj = cn.join(
        edges.filter(F.col("src") < F.col("dst")).select(
            F.col("src").alias("u"), F.col("dst").alias("v")
        ),
        ["u", "v"],
        "left_anti",
    )
    return (
        nonadj.select(
            F.col("u").cast("bigint").alias("part_a"),
            F.col("v").cast("bigint").alias("part_b"),
            "n_common",
        )
        .orderBy(F.col("n_common").desc(), "part_a", "part_b")
        .limit(top)
    )


def adamic_adar_candidates(
    edges: DataFrame, deg: DataFrame, center_cap: int = _CN_DEG_CAP, top: int = 20
) -> DataFrame:
    """Adamic-Adar-weighted link prediction: like common neighbors, but
    each shared neighbor contributes inversely to its own degree (the
    rational surrogate 1e9 div deg — monotone like 1/ln(deg) but
    integer-exact cross-engine, same discipline as the tf-idf integer
    idf), so promiscuous hubs stop dominating the score.  The center's
    weight is a CONSTANT per adjacency row, so candidate pairs still
    generate in-row from the sorted neighbor array with the weight
    attached — the wire carries (u, v, partial-weight) only."""
    centers = deg.filter(F.col("deg") <= center_cap).select(
        "node", F.expr(f"CAST(1000000000 div deg AS BIGINT)").alias("cw")
    )
    nb = (
        edges.join(centers, edges.src == centers.node)
        .groupBy("src", "cw")
        .agg(F.array_sort(F.collect_list("dst")).alias("nb"))
    )
    pairs = nb.select(
        "cw",
        F.explode(
            F.expr(
                "flatten(transform(nb, (x, i) ->"
                " transform(slice(nb, i + 2, size(nb)), y -> struct(x AS u, y AS v))))"
            )
        ).alias("p"),
    ).select(F.col("p.u").alias("u"), F.col("p.v").alias("v"), "cw")
    aa = pairs.groupBy("u", "v").agg(
        F.sum("cw").cast("bigint").alias("aa_ppb"),
        F.count(F.lit(1)).cast("bigint").alias("n_common"),
    )
    # same src < dst halving as common_neighbor_candidates: candidates
    # come from a sorted array, edges are symmetric
    nonadj = aa.join(
        edges.filter(F.col("src") < F.col("dst")).select(
            F.col("src").alias("u"), F.col("dst").alias("v")
        ),
        ["u", "v"],
        "left_anti",
    )
    return (
        nonadj.select(
            F.col("u").cast("bigint").alias("part_a"),
            F.col("v").cast("bigint").alias("part_b"),
            "n_common",
            "aa_ppb",
        )
        .orderBy(F.col("aa_ppb").desc(), "part_a", "part_b")
        .limit(top)
    )


def q_graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    snap = _co_order_edges_for(spark, sf_dir)
    edges = spark.read.parquet(os.path.join(snap, "edges"))
    deg = spark.read.parquet(os.path.join(snap, "deg")).select(
        F.col("src").alias("node"), "deg"
    )
    return adamic_adar_candidates(edges, deg)


GRAPH_ADAMIC_ADAR_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
edges AS (
  SELECT a.p AS src, b.p AS dst
  FROM li a JOIN li b ON a.ok = b.ok AND a.p <> b.p
  GROUP BY 1, 2
),
deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
ce AS (
  SELECT e.src AS c, e.dst AS x, CAST(1000000000 // deg.deg AS BIGINT) AS cw
  FROM edges e JOIN deg ON deg.node = e.src
  WHERE deg.deg <= {_CN_DEG_CAP}
),
wedges AS (
  SELECT a.x AS u, b.x AS v, a.cw FROM ce a JOIN ce b ON a.c = b.c AND a.x < b.x
),
aa AS (
  SELECT u, v, CAST(sum(cw) AS BIGINT) AS aa_ppb,
         CAST(count(*) AS BIGINT) AS n_common
  FROM wedges GROUP BY u, v
),
nonadj AS (
  SELECT aa.* FROM aa
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = aa.u AND e.dst = aa.v)
)
SELECT CAST(u AS BIGINT) AS part_a, CAST(v AS BIGINT) AS part_b, n_common, aa_ppb
FROM nonadj
ORDER BY aa_ppb DESC, part_a, part_b
LIMIT 20
"""


def q_graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    snap = _co_order_edges_for(spark, sf_dir)
    edges = spark.read.parquet(os.path.join(snap, "edges"))
    deg = spark.read.parquet(os.path.join(snap, "deg")).select(
        F.col("src").alias("node"), "deg"
    )
    return common_neighbor_candidates(edges, deg)


GRAPH_COMMON_NEIGHBORS_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
edges AS (
  SELECT a.p AS src, b.p AS dst
  FROM li a JOIN li b ON a.ok = b.ok AND a.p <> b.p
  GROUP BY 1, 2
),
deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
ce AS (
  SELECT e.src AS c, e.dst AS x
  FROM edges e JOIN deg ON deg.node = e.src
  WHERE deg.deg <= {_CN_DEG_CAP}
),
wedges AS (
  SELECT a.x AS u, b.x AS v FROM ce a JOIN ce b ON a.c = b.c AND a.x < b.x
),
cn AS (SELECT u, v, CAST(count(*) AS BIGINT) AS n_common FROM wedges GROUP BY u, v),
nonadj AS (
  SELECT cn.* FROM cn
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = cn.u AND e.dst = cn.v)
)
SELECT CAST(u AS BIGINT) AS part_a, CAST(v AS BIGINT) AS part_b, n_common
FROM nonadj
ORDER BY n_common DESC, part_a, part_b
LIMIT 20
"""


QUERIES = {
    "pagerank_parts": q_pagerank_parts,
    "pagerank_weighted": q_pagerank_weighted,
    "graph_triangles": q_graph_triangles,
    "graph_khop": q_graph_khop,
    "graph_common_neighbors": q_graph_common_neighbors,
    "graph_adamic_adar": q_graph_adamic_adar,
}
ORACLES = {
    "pagerank_parts": _pagerank_sql(3),
    "pagerank_weighted": _pagerank_sql(3, weighted=True),
    "graph_triangles": GRAPH_TRIANGLES_SQL,
    "graph_khop": GRAPH_KHOP_SQL,
    "graph_common_neighbors": GRAPH_COMMON_NEIGHBORS_SQL,
    "graph_adamic_adar": GRAPH_ADAMIC_ADAR_SQL,
}
