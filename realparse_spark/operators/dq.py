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


QUERIES = {"dq_checks": q_dq_checks, "dq_embeddings": q_dq_embeddings}
ORACLES = {"dq_checks": DQ_CHECKS_SQL, "dq_embeddings": DQ_EMBEDDINGS_SQL}
