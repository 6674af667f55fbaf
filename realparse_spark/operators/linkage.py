"""Record linkage: blocked fuzzy matching over string keys.

The reference's matching surface is exact equi-joins plus one LIKE-pattern
join (`pull_report.pl:61-77`); this module adds the entity-resolution
operator a training-data pipeline needs on top of that: find records that
refer to the same real-world entity despite typos/variant spellings
(e.g. scraped product names, author fields, near-identical source URLs).

100 TB design
-------------
The naive formulation is an all-pairs edit-distance join — O(n²) and
impossible at scale.  The standard discipline (Fellegi-Sunter style
blocking) is applied here, entirely in DataFrame ops:

1. **Distinct-first.**  Linkage compares *keys*, not rows: collapse the
   table to distinct (block, key) with a count.  At 100 TB the distinct
   cardinality is orders of magnitude below the row count, and the
   downstream quadratic term only sees distinct keys.
2. **Blocking.**  Candidate pairs are generated only WITHIN a block
   (equi-join on the block column) — the quadratic term is bounded by the
   largest block, not the corpus.  Block choice is the user's lever; a
   hot block can be further split upstream (e.g. by key length band).
3. **Cheap prefilter before the expensive predicate.**  levenshtein is
   O(|a|·|b|) per pair; a length-band filter (|len(a)-len(b)| <= d, a
   necessary condition for edit distance <= d) is evaluated first and
   cuts most candidates before any DP matrix is built.  Both predicates
   are JVM expressions inside whole-stage codegen — no Python.

The self-join shuffles the distinct-key table once on the block column;
all scoring is map-side within the joined partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realparse_spark.operators.distrank import rank_distributed


def blocked_fuzzy_pairs(
    df: DataFrame,
    block_col: str,
    key_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """All distinct key pairs within a block at edit distance <= max_dist.

    Returns columns: <block_col>, name_a, name_b, dist, n_a, n_b where
    n_* are the source-row counts collapsed into each distinct key
    (i.e. how many records each side of a merge represents).
    """
    names = df.groupBy(block_col, key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    a = names.select(
        F.col(block_col).alias("_blk"),
        F.col(key_col).alias("name_a"),
        F.col("n").alias("n_a"),
    )
    b = names.select(
        F.col(block_col).alias("_blk_b"),
        F.col(key_col).alias("name_b"),
        F.col("n").alias("n_b"),
    )
    pairs = a.join(
        b,
        (F.col("_blk") == F.col("_blk_b"))
        & (F.col("name_a") < F.col("name_b"))
        # length band: necessary condition for lev <= d, evaluated before
        # the O(|a||b|) DP — this is the cheap gate that makes the
        # within-block quadratic term tolerable on hot blocks
        & (
            F.abs(F.length("name_a") - F.length("name_b")) <= max_dist
        )
        & (F.levenshtein("name_a", "name_b") <= max_dist),
    )
    return pairs.select(
        F.col("_blk").alias(block_col),
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("int").alias("dist"),
        "n_a",
        "n_b",
    )


def q_fuzzy_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over part names blocked by p_type: variant
    spellings at edit distance <= 2 ('cold anvil' ~ 'old anvil'), with the
    record mass each merge would collapse.  Oracle is the literal
    blocked self-join in SQL — the distinct-first + length-band plan must
    produce EXACTLY the naive formulation's answer."""
    from realparse_spark.sources.tables import load_table

    part = load_table(spark, sf_dir, "part")
    out = blocked_fuzzy_pairs(part, "p_type", "p_name", max_dist=2)
    return out.orderBy("p_type", "name_a", "name_b")


FUZZY_MATCH_PARTS_SQL = """
WITH names AS (
  SELECT p_type, p_name, CAST(count(*) AS BIGINT) AS n
  FROM part GROUP BY p_type, p_name
)
SELECT a.p_type AS p_type, a.p_name AS name_a, b.p_name AS name_b,
  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist,
  a.n AS n_a, b.n AS n_b
FROM names a JOIN names b
  ON a.p_type = b.p_type AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 2
ORDER BY p_type, name_a, name_b
"""


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    window: int = 5,
    max_dist: int = 2,
    n_ranges: int = 8,
) -> DataFrame:
    """Sorted-neighborhood record linkage (Hernandez-Stolfo): sort the
    distinct keys by a SORT KEY (here the reversed string, so suffix-
    sharing variants land adjacent even when the typo hits the first
    character — the case equality blocking misses), then compare each key
    only to its `window` successors in the global order.

    The global rank uses the two-phase distributed pattern, not a
    single-partition window: `repartitionByRange` on the sort key, a
    per-partition row_number, and a broadcast prefix-offset join — each
    executor ranks its own range, O(rows/partitions) state anywhere.
    Range boundaries come from sampling and can differ run to run, but
    the final rank is the position in a total order over UNIQUE keys, so
    the output is deterministic regardless of where the cuts fall.
    Candidates come from ONE equi-join on the rank bucket (each row
    probes its own and the previous width-`window` bucket), so the
    neighborhood comparison is O(keys x window), never quadratic."""
    names = df.groupBy(key_col).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    keyed = names.select(
        F.col(key_col).alias("name"), "n", F.reverse(key_col).alias("sk")
    )
    ranked = rank_distributed(keyed, ["sk", "name"], n_ranges=n_ranges).select(
        "name", "n", "sk", "rn"
    )
    bkt = F.floor((F.col("rn") - 1) / window).cast("bigint")
    a = ranked.select(
        F.col("name").alias("name_a"),
        F.col("n").alias("n_a"),
        F.col("rn").alias("rn_a"),
        F.explode(F.array(bkt, bkt + 1)).alias("_bkt"),
    )
    b = ranked.select(
        F.col("name").alias("name_b"),
        F.col("n").alias("n_b"),
        F.col("rn").alias("rn_b"),
        bkt.alias("_bkt"),
    )
    return (
        a.join(b, ["_bkt"])
        .filter(
            (F.col("rn_b") - F.col("rn_a") >= 1)
            & (F.col("rn_b") - F.col("rn_a") <= window)
            & (F.abs(F.length("name_a") - F.length("name_b")) <= max_dist)
            & (F.levenshtein("name_a", "name_b") <= max_dist)
        )
        .select(
            "name_a",
            "name_b",
            (F.col("rn_b") - F.col("rn_a")).cast("int").alias("rank_gap"),
            F.levenshtein("name_a", "name_b").cast("int").alias("dist"),
            "n_a",
            "n_b",
        )
    )


def q_snm_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood pass over part names, sort key = reversed name
    (window 5, edit distance <= 2) — the complement of the p_type-blocked
    pass: it catches variant spellings whose first characters differ.
    Oracle is the literal single-sequence row_number formulation."""
    from realparse_spark.sources.tables import load_table

    part = load_table(spark, sf_dir, "part")
    return sorted_neighborhood_pairs(part, "p_name", window=5, max_dist=2).orderBy(
        "name_a", "name_b"
    )


SNM_LINKAGE_SQL = """
WITH names AS (
  SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n FROM part GROUP BY p_name
),
ranked AS (
  SELECT name, n,
    row_number() OVER (ORDER BY reverse(name), name) AS rn
  FROM names
)
SELECT a.name AS name_a, b.name AS name_b,
  CAST(b.rn - a.rn AS INTEGER) AS rank_gap,
  CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist,
  a.n AS n_a, b.n AS n_b
FROM ranked a JOIN ranked b
  ON b.rn - a.rn BETWEEN 1 AND 5
WHERE abs(length(a.name) - length(b.name)) <= 2
  AND levenshtein(a.name, b.name) <= 2
ORDER BY name_a, name_b
"""


def q_linkage_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution END-TO-END: blocked fuzzy pairs -> connected
    components -> one row per resolved entity (cluster) with its member
    and source-row mass.  This is the step that turns a pair list into
    the merge an MDM/dedup pipeline actually applies; components reuse
    `dup_clusters` (size-adaptive union-find / min-label propagation),
    so the same CC engine serves text near-dup AND record linkage.

    Names are mapped to stable long ids (min p_partkey per name) before
    clustering — CC propagates longs, and the id doubles as the
    deterministic cluster representative.  Oracle = recursive CTE over
    the identical pair list."""
    from realparse_spark.operators.dedup import dup_clusters
    from realparse_spark.sources.tables import load_table

    part = load_table(spark, sf_dir, "part")
    pairs = (
        blocked_fuzzy_pairs(part, "p_type", "p_name", max_dist=2)
        .select("name_a", "name_b")
        .distinct()
    )
    ids = part.groupBy("p_name").agg(
        F.min("p_partkey").alias("id"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    edges = (
        pairs.join(
            ids.select(F.col("p_name").alias("name_a"), F.col("id").alias("doc_a")),
            "name_a",
        )
        .join(
            ids.select(F.col("p_name").alias("name_b"), F.col("id").alias("doc_b")),
            "name_b",
        )
        .select("doc_a", "doc_b")
    )
    clusters = dup_clusters(edges)
    stats = clusters.join(
        ids.select(F.col("id").alias("doc_id"), "n_rows"), "doc_id"
    )
    return (
        stats.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )
        .orderBy("cluster_id")
    )


LINKAGE_CLUSTERS_SQL = """
WITH RECURSIVE names AS (
  SELECT p_type, p_name FROM part GROUP BY p_type, p_name
),
ids AS (
  SELECT p_name, CAST(min(p_partkey) AS BIGINT) AS id,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM part GROUP BY p_name
),
npairs AS (
  SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
  FROM names a JOIN names b ON a.p_type = b.p_type AND a.p_name < b.p_name
  WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
    AND levenshtein(a.p_name, b.p_name) <= 2
),
ip AS (
  SELECT ia.id AS a, ib.id AS b
  FROM npairs JOIN ids ia ON ia.p_name = npairs.name_a
              JOIN ids ib ON ib.p_name = npairs.name_b
),
edges AS (SELECT a, b FROM ip UNION SELECT b, a FROM ip),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
clus AS (SELECT least(a, min(b)) AS cluster_id, a AS doc_id FROM reach GROUP BY a)
SELECT c.cluster_id,
  CAST(count(*) AS BIGINT) AS n_members,
  CAST(sum(i.n_rows) AS BIGINT) AS n_rows
FROM clus c JOIN ids i ON i.id = c.doc_id
GROUP BY c.cluster_id ORDER BY c.cluster_id
"""


QUERIES = {
    "fuzzy_match_parts": q_fuzzy_match_parts,
    "snm_linkage": q_snm_linkage,
    "linkage_clusters": q_linkage_clusters,
}
ORACLES = {
    "fuzzy_match_parts": FUZZY_MATCH_PARTS_SQL,
    "snm_linkage": SNM_LINKAGE_SQL,
    "linkage_clusters": LINKAGE_CLUSTERS_SQL,
}
