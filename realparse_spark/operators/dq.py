"""Data-quality gate: named integrity checks over the star schema, one
result row per check (SURVEY.md §2.6 extension; the reference's guards —
non-zero counts, `sent<=file`, null→'N/A', `real_parse.pl:141-170` — are
the inline ancestors of an explicit DQ suite a pipeline runs before
promoting a batch).

Each check is expressed as an aggregate the optimizer can run efficiently
at 100 TB: referential orphans are LEFT ANTI joins on the key columns only
(column pruning reaches every scan, the dim side broadcasts when small),
duplicate-key and null-rate checks are single partial+final aggregations.
The union of 1-row results is driver-free — no collect, no loops."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realparse_spark.sources.tables import load_table


def _check(name: str, bad: DataFrame, total: DataFrame) -> DataFrame:
    """One named check row: bad/total counts plus exact ppm.  floor(+0.5)
    keeps the ppm IEEE-deterministic in both engines (ties at .5 exist
    whenever total divides 1e6 * bad)."""
    b = bad.agg(F.count(F.lit(1)).cast("bigint").alias("n_bad"))
    t = total.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    # empty table -> NULL ppm (an ANSI cast of the 0/0 NaN would throw)
    ppm = F.when(
        F.col("n_total") != 0,
        F.floor(F.lit(1000000.0) * F.col("n_bad") / F.col("n_total") + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    return b.crossJoin(F.broadcast(t)).select(
        F.lit(name).alias("check_name"),
        "n_bad",
        "n_total",
        ppm.alias("bad_ppm"),
    )


def dq_checks(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """The five standing integrity checks: two referential (orphan foreign
    keys), one uniqueness (duplicate primary keys), one completeness
    (null priority), one domain (non-positive quantity)."""
    orphan_orders = orders.select("o_custkey").join(
        customer.select("c_custkey"),
        orders.o_custkey == customer.c_custkey,
        "left_anti",
    )
    orphan_lines = lineitem.select("l_orderkey").join(
        orders.select("o_orderkey"),
        lineitem.l_orderkey == orders.o_orderkey,
        "left_anti",
    )
    dup_custkey = (
        customer.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
    )
    null_priority = orders.filter(F.col("o_orderpriority").isNull())
    bad_qty = lineitem.filter(F.col("l_quantity") <= 0)
    checks = [
        _check("orders_orphan_custkey", orphan_orders, orders),
        _check("lineitem_orphan_orderkey", orphan_lines, lineitem),
        _check("customer_dup_custkey", dup_custkey, customer),
        _check("orders_null_priority", null_priority, orders),
        _check("lineitem_nonpositive_qty", bad_qty, lineitem),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check_name")


def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dq_checks(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


DQ_CHECKS_SQL = """
WITH c AS (
  SELECT 'orders_orphan_custkey' AS check_name,
    (SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS n_bad,
    (SELECT count(*) FROM orders) AS n_total
  UNION ALL
  SELECT 'lineitem_orphan_orderkey',
    (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
    (SELECT count(*) FROM lineitem)
  UNION ALL
  SELECT 'customer_dup_custkey',
    (SELECT count(*) FROM (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING count(*) > 1)),
    (SELECT count(*) FROM customer)
  UNION ALL
  SELECT 'orders_null_priority',
    (SELECT count(*) FROM orders WHERE o_orderpriority IS NULL),
    (SELECT count(*) FROM orders)
  UNION ALL
  SELECT 'lineitem_nonpositive_qty',
    (SELECT count(*) FROM lineitem WHERE l_quantity <= 0),
    (SELECT count(*) FROM lineitem)
)
SELECT check_name,
  CAST(n_bad AS BIGINT) AS n_bad,
  CAST(n_total AS BIGINT) AS n_total,
  CASE WHEN n_total <> 0
    THEN CAST(floor(1000000.0 * n_bad / n_total + 0.5) AS BIGINT)
  END AS bad_ppm
FROM c
ORDER BY check_name
"""


def dq_embeddings(emb: DataFrame, dim: int = 64) -> DataFrame:
    """Vector-table QA — the gate a pipeline runs BEFORE building any ANN
    index (a zero-norm or NaN vector silently poisons cosine math; a
    wrong-dimension vector crashes the encode kernel mid-job): dimension
    mismatches, non-finite components, zero norms, and null labels, one
    row per check with exact ppm.  All pure array expressions over one
    scan — `exists` short-circuits per row, nothing leaves the JVM."""
    # size(NULL) is -1 in Spark while DuckDB's len(NULL) is NULL (dropped by
    # the filter) — an explicit isNull branch on BOTH sides keeps a
    # null-vector row counted identically in engine and oracle.
    bad_dim = emb.filter(
        F.col("embedding").isNull() | (F.size("embedding") != dim)
    )
    nonfinite = emb.filter(
        F.exists("embedding", lambda x: F.isnan(x) | (F.abs(x) > F.lit(1e30)))
    )
    zero_norm = emb.filter(
        F.aggregate(
            "embedding", F.lit(0.0), lambda a, x: a + x.cast("double") * x
        )
        == 0.0
    )
    null_label = emb.filter(F.col("label").isNull())
    return (
        _check("embedding_dim", bad_dim, emb)
        .unionByName(_check("non_finite_component", nonfinite, emb))
        .unionByName(_check("zero_norm", zero_norm, emb))
        .unionByName(_check("null_label", null_label, emb))
    )


def q_dq_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dq_embeddings(load_table(spark, sf_dir, "embeddings"))


DQ_EMBEDDINGS_SQL = """
WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM embeddings),
c AS (
  SELECT 'embedding_dim' AS check_name,
    CAST(count(*) FILTER (WHERE embedding IS NULL OR len(embedding) <> 64) AS BIGINT) AS n_bad FROM embeddings
  UNION ALL
  SELECT 'non_finite_component',
    CAST(count(*) FILTER (WHERE EXISTS (
      SELECT 1 FROM unnest(embedding) AS u(x) WHERE isnan(x) OR abs(x) > 1e30
    )) AS BIGINT) FROM embeddings
  UNION ALL
  SELECT 'zero_norm',
    CAST(count(*) FILTER (WHERE list_aggregate(
      list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'
    ) = 0.0 OR len(embedding) = 0) AS BIGINT) FROM embeddings
  UNION ALL
  SELECT 'null_label',
    CAST(count(*) FILTER (WHERE label IS NULL) AS BIGINT) FROM embeddings
)
SELECT check_name, n_bad, n_total,
  CASE WHEN n_total <> 0
    THEN CAST(floor(1000000.0 * n_bad / n_total + 0.5) AS BIGINT)
  END AS bad_ppm
FROM c, t
"""


def profile_table(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Per-column data profile — the first report a pipeline runs on an
    unfamiliar table: null count, distinct count, min/max (as strings so
    one schema fits every column type).

    One row per column, computed in a SINGLE aggregate pass: Spark plans
    the multi-column count(DISTINCT) set via Expand (one shuffle carrying
    |cols| streams), never one job per column.  At 100 TB pass
    ``approx=True``: exact per-column distinct is an Expand-multiplied
    shuffle of every row, while approx_count_distinct (HLL) is one
    map-side sketch per column — the profile every warehouse actually
    runs at scale.  (The driver query uses exact so the DuckDB oracle
    hash-matches; `approx_distinct` covers the sketch path.)"""
    columns = columns or df.columns
    nd = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.countDistinct(c))
    )
    aggs = []
    for c in columns:
        aggs += [
            # coalesce: Spark's sum over ZERO rows is NULL while DuckDB's
            # filtered count is 0 — align the empty-table profile
            F.coalesce(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)), F.lit(0)
            ).cast("bigint").alias(f"_null_{c}"),
            nd(c).cast("bigint").alias(f"_nd_{c}"),
            # min/max on the NATIVE type, cast to string after — casting
            # first would make numeric columns compare lexicographically
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(F.count(F.lit(1)).cast("bigint").alias("_n"), *aggs)
    stacked = ", ".join(
        f"'{c}', _null_{c}, _nd_{c}, _min_{c}, _max_{c}" for c in columns
    )
    return wide.selectExpr(
        f"stack({len(columns)}, {stacked}) AS "
        "(column_name, n_null, n_distinct, min_repr, max_repr)",
        "_n AS n_rows",
    ).orderBy("column_name")


def q_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_table(
        load_table(spark, sf_dir, "documents"),
        ["doc_id", "lang", "source", "n_chars"],
    )


DQ_PROFILE_SQL = """
WITH w AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
    CAST(count(*) FILTER (WHERE doc_id IS NULL) AS BIGINT) AS null_doc_id,
    CAST(count(DISTINCT doc_id) AS BIGINT) AS nd_doc_id,
    CAST(min(doc_id) AS VARCHAR) AS min_doc_id, CAST(max(doc_id) AS VARCHAR) AS max_doc_id,
    CAST(count(*) FILTER (WHERE lang IS NULL) AS BIGINT) AS null_lang,
    CAST(count(DISTINCT lang) AS BIGINT) AS nd_lang,
    min(lang) AS min_lang, max(lang) AS max_lang,
    CAST(count(*) FILTER (WHERE source IS NULL) AS BIGINT) AS null_source,
    CAST(count(DISTINCT source) AS BIGINT) AS nd_source,
    min(source) AS min_source, max(source) AS max_source,
    CAST(count(*) FILTER (WHERE n_chars IS NULL) AS BIGINT) AS null_n_chars,
    CAST(count(DISTINCT n_chars) AS BIGINT) AS nd_n_chars,
    CAST(min(n_chars) AS VARCHAR) AS min_n_chars, CAST(max(n_chars) AS VARCHAR) AS max_n_chars
  FROM documents
)
SELECT column_name, n_null, n_distinct, min_repr, max_repr, n_rows FROM (
  SELECT 'doc_id' AS column_name, null_doc_id AS n_null, nd_doc_id AS n_distinct,
         min_doc_id AS min_repr, max_doc_id AS max_repr, n_rows FROM w
  UNION ALL
  SELECT 'lang', null_lang, nd_lang, min_lang, max_lang, n_rows FROM w
  UNION ALL
  SELECT 'source', null_source, nd_source, min_source, max_source, n_rows FROM w
  UNION ALL
  SELECT 'n_chars', null_n_chars, nd_n_chars, min_n_chars, max_n_chars, n_rows FROM w
)
ORDER BY column_name
"""


def table_diff(
    old: DataFrame, new: DataFrame, key_col: str, compare_cols: list[str]
) -> DataFrame:
    """Keyed snapshot reconciliation (CDC validation): classify every key
    as added / removed / changed / unchanged between two table versions,
    plus a per-column changed count.  Returns one row per label.

    100 TB shape: ONE full-outer join on the key (both sides shuffled
    once on the same key — in production the snapshots are bucketed on
    it and the join co-locates), then a single aggregate over CASE
    flags; column comparisons are codegen expressions.  Output is
    O(labels), never row-level (row-level diffs are a filter on the
    same join, not a different plan)."""
    o = old.select(
        F.col(key_col).alias("_k"),
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        F.col(key_col).alias("_k2"),
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    j = o.join(n, o["_k"] == n["_k2"], "full_outer")
    col_changed = [
        (~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))).cast("int").alias(f"_ch_{c}")
        for c in compare_cols
    ]
    any_changed = None
    for c in compare_cols:
        term = ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        any_changed = term if any_changed is None else (any_changed | term)
    flagged = j.select(
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(any_changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        *col_changed,
        (F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull()).alias("_both"),
    )
    summary = flagged.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    percol = [
        flagged.filter(F.col("_both"))
        .agg(F.sum(f"_ch_{c}").cast("bigint").alias("n_rows"))
        .select(F.lit(f"changed:{c}").alias("status"), "n_rows")
        for c in compare_cols
    ]
    out = summary
    for p in percol:
        out = out.unionAll(p)
    return out.orderBy("status")


def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconcile two deterministic epochs of the orders table: the old
    epoch drops keys divisible by 7, the new epoch drops keys divisible
    by 10 and bumps totalprice/priority on keys divisible by 3 — so
    added/removed/changed/unchanged and both per-column change counts
    are all non-trivially exercised.  Oracle is the literal full-outer
    reconciliation in SQL."""
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 7 != 0)
    new = orders.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + F.lit(1.0)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("RECLASSIFIED"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    )
    return table_diff(old, new, "o_orderkey", ["o_totalprice", "o_orderpriority"])


TABLE_DIFF_SQL = """
WITH old_t AS (
  SELECT o_orderkey AS k, o_totalprice AS p, o_orderpriority AS pr
  FROM orders WHERE o_orderkey % 7 <> 0
),
new_t AS (
  SELECT o_orderkey AS k,
    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS p,
    CASE WHEN o_orderkey % 3 = 0 THEN 'RECLASSIFIED' ELSE o_orderpriority END AS pr
  FROM orders WHERE o_orderkey % 10 <> 0
),
j AS (
  SELECT o.k AS ok, n.k AS nk,
    o.p AS op, n.p AS np, o.pr AS opr, n.pr AS npr
  FROM old_t o FULL OUTER JOIN new_t n ON o.k = n.k
),
flagged AS (
  SELECT
    CASE WHEN ok IS NULL THEN 'added'
         WHEN nk IS NULL THEN 'removed'
         WHEN op IS DISTINCT FROM np OR opr IS DISTINCT FROM npr THEN 'changed'
         ELSE 'unchanged' END AS status,
    CASE WHEN op IS DISTINCT FROM np THEN 1 ELSE 0 END AS ch_p,
    CASE WHEN opr IS DISTINCT FROM npr THEN 1 ELSE 0 END AS ch_pr,
    (ok IS NOT NULL AND nk IS NOT NULL) AS both_present
  FROM j
)
SELECT status, CAST(count(*) AS BIGINT) AS n_rows FROM flagged GROUP BY status
UNION ALL
SELECT 'changed:o_totalprice', CAST(sum(ch_p) AS BIGINT) FROM flagged WHERE both_present
UNION ALL
SELECT 'changed:o_orderpriority', CAST(sum(ch_pr) AS BIGINT) FROM flagged WHERE both_present
ORDER BY status
"""


QUERIES = {
    "dq_checks": q_dq_checks,
    "dq_embeddings": q_dq_embeddings,
    "dq_profile": q_dq_profile,
    "table_diff": q_table_diff,
}
ORACLES = {
    "dq_checks": DQ_CHECKS_SQL,
    "dq_embeddings": DQ_EMBEDDINGS_SQL,
    "dq_profile": DQ_PROFILE_SQL,
    "table_diff": TABLE_DIFF_SQL,
}
