"""Classic TPC-H query shapes over the fixture star schema — each one a
DISTINCT physical-plan pattern the engine must handle at 100 TB
(SURVEY.md §2.5-2.6 extensions; the reference's report stage,
``real_parse.pl:120-196``, is the degenerate 1-table version of these):

- Q12 analog (``q12_priority_class``): big⋈big equi-join feeding a
  conditional CASE aggregation with a tiny key space.
- Q14 analog (``q14_promo_revenue``): fact⋈broadcast-dim join into a
  single-row conditional ratio.
- Q15 analog (``q15_top_supplier``): aggregate → scalar max → join-back
  (argmax without a global sort).
- Q17 analog (``q17_small_qty_revenue``): per-group average join-back
  (correlated scalar subquery decorrelated by hand).
- Q22 analog (``q22_idle_balance``): scalar threshold + anti-join.
- Q4 analog (``q4_late_orders``): EXISTS → left-semi with date residual.
- Q13 analog (``q13_order_counts``): outer join keeping the zero bucket.
- Q6 analog (``q6_forecast_revenue``): pure scan-pushdown aggregate.
- Q7 analog (``q7_nation_volume``): two dim chains off one fact, nation
  pair disjunction pre-pruned through the tiny dim.
- Q8 analog (``q8_market_share``): deepest join tree (6 tables, nation
  twice), conditional share per year.
- Q19 analog (``q19_disjunct_revenue``): disjunction-of-conjunctions with
  hand-derived superset pushdown.
- Q21 analog (``q21_waiting_supplier``): double-correlated EXISTS/NOT
  EXISTS collapsed into one per-order window.
- Q18 classic (``q18_large_volume``): the full TPC-H Q18 semantics —
  HAVING subquery + outer re-aggregation + deterministic top-100 —
  with an EXPLICIT broadcast semi-join reduction.  Complements
  analytics.py's ``big_spender_orders`` (the same shape where AQE
  decides the broadcast from the measured post-agg size): together
  they document both the hint-free and the hand-reduced plan at scale.

The remaining classic shapes (Q2/Q9/Q11/Q16/Q20) require the
``partsupp`` table, which the fixture schema does not include
(TESTDATA.md); they live in tpch_partsupp.py over a deterministic
partsupp SYNTHESIZED with identical arithmetic in Spark and in the
DuckDB oracle, so every one has a real differential check.

All math is exact-decimal until the final cast so the DuckDB oracle
hash-matches bit-for-bit; ratios are computed double-then-round(4) with the
identical association order in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realparse_spark.sources.tables import load_table


def _rev_dec() -> F.Column:
    """Exact line revenue: extprice*(1-discount) as decimal(18,4) —
    the same expression every revenue query in this repo uses."""
    return (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,2)")
    ).cast("decimal(18,4)")


# ---------------------------------------------------------------------------
# Q12 shape: priority class by line status
# ---------------------------------------------------------------------------

def q12_priority_class(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Urgent-vs-other order counts per lineitem status for one ship year.

    Plan at scale: the shipdate range filter is pushed to the lineitem
    parquet scan (only ~1/7 of the fact survives), then ONE shuffle
    equi-join on orderkey — both sides hash-partition; no dim is small
    enough to broadcast, so this is the canonical big⋈big shape.  The
    CASE aggregation collapses to 2 groups with map-side partial agg, so
    the final exchange moves a handful of rows."""
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    l = lineitem.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(orders, l.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q_q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q12_priority_class(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    )


Q12_PRIORITY_CLASS_SQL = """
SELECT l_linestatus,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Q14 shape: promotion revenue share
# ---------------------------------------------------------------------------

def q14_promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Share of one month's revenue from PROMO-type parts, as a single
    row.  Plan at scale: the one-month shipdate filter prunes the fact
    scan; ``part`` is a true dimension (|parts| ≪ |lineitem|) so the join
    broadcasts — no shuffle of the fact at all; the conditional sums run
    map-side and reduce to one row.  Both sums stay decimal until the
    final double division, which is round(4)ed with the same association
    order as the oracle."""
    lo = F.lit("1997-09-01").cast("timestamp")
    hi = F.lit("1997-10-01").cast("timestamp")
    l = lineitem.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
    rev = _rev_dec()
    agg = (
        l.join(F.broadcast(part), l.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,4)"))).alias("_p"),
            F.sum(rev).alias("_t"),
        )
    )
    # empty month / zero revenue -> NULL pct, never a 0/0 NaN
    pct = F.when(
        F.col("_t").isNotNull() & (F.col("_t") != 0),
        F.round(F.lit(100.0) * (F.col("_p").cast("double") / F.col("_t").cast("double")), 4),
    )
    return agg.select(
        pct.alias("promo_revenue_pct"),
        F.col("_p").cast("double").alias("promo_revenue"),
        F.col("_t").cast("double").alias("total_revenue"),
    )


def q_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q14_promo_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


Q14_PROMO_REVENUE_SQL = """
WITH a AS (
  SELECT
    sum(CASE WHEN p_type = 'PROMO'
        THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))
        ELSE CAST(0 AS DECIMAL(18,4)) END) AS p,
    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS t
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
)
SELECT CASE WHEN t IS NOT NULL AND t <> 0
         THEN round(100.0 * (CAST(p AS DOUBLE) / CAST(t AS DOUBLE)), 4)
       END AS promo_revenue_pct,
  CAST(p AS DOUBLE) AS promo_revenue,
  CAST(t AS DOUBLE) AS total_revenue
FROM a
"""


# ---------------------------------------------------------------------------
# Q15 shape: top supplier by quarterly revenue (argmax via join-back)
# ---------------------------------------------------------------------------

def q15_top_supplier(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """Supplier(s) with the maximum revenue for one quarter.

    Plan at scale: per-supplier revenue is ONE shuffle over the
    date-pruned fact (map-side partial sums); the max is a 1-row
    aggregate of that |suppliers|-row table, broadcast back as a
    cross-join literal — the argmax never needs a global sort, and ties
    are kept (revenue compared as exact decimal, not double).  The
    supplier dim broadcasts onto the ≤|ties| surviving rows."""
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1997-04-01").cast("timestamp")
    l = lineitem.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
    rev = (
        l.groupBy("l_suppkey").agg(F.sum(_rev_dec()).alias("_rev"))
    )
    mx = rev.agg(F.max("_rev").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("_rev") == F.col("_mx"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q15_top_supplier(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "supplier")
    )


Q15_TOP_SUPPLIER_SQL = """
WITH r AS (
  SELECT l_suppkey,
    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
FROM r JOIN supplier ON l_suppkey = s_suppkey
WHERE rev = (SELECT max(rev) FROM r)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q17 shape: small-quantity-order revenue (per-group average join-back)
# ---------------------------------------------------------------------------

def q17_small_qty_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Average yearly revenue lost if small-quantity orders (below 20% of
    the part's average order quantity) for one brand went unfilled.

    TPC-H writes this as a correlated scalar subquery; here it is
    decorrelated by hand the way Catalyst would: the brand's partkeys
    broadcast-semi-prune BOTH lineitem passes first (so the per-part
    average is computed over only ~1/25 of parts, never the full fact),
    then the per-part thresholds — a |brand parts|-row table — broadcast
    back onto the pruned fact.  Thresholds are derived sum/count in
    exact decimal, divided in double with the oracle's association
    order."""
    pk = part.filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    l = lineitem.join(F.broadcast(pk), lineitem.l_partkey == pk.p_partkey).drop(
        "p_partkey"
    )
    th = l.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("_th")
    )
    return (
        l.join(F.broadcast(th), "l_partkey")
        .filter(F.col("l_quantity") < F.col("_th"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.lit(7.0),
                4,
            ).alias("avg_yearly")
        )
    )


def q_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q17_small_qty_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


Q17_SMALL_QTY_REVENUE_SQL = """
WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'),
l AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN pk ON l_partkey = p_partkey
),
th AS (
  SELECT l_partkey,
    0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)) AS th
  FROM l GROUP BY l_partkey
)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 4) AS avg_yearly
FROM l JOIN th USING (l_partkey)
WHERE l_quantity < th
"""


# ---------------------------------------------------------------------------
# Q22 shape: idle customers with above-average balance (anti-join)
# ---------------------------------------------------------------------------

def q22_idle_balance(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Per-nation count and total balance of customers whose balance beats
    the positive-balance average and who have placed no order since
    2000-01-01 (the fixture's order stream is dense enough that
    "never ordered" is vacuous at every scale — a recency cutoff keeps
    the identical anti-join shape with a non-empty answer).

    Plan at scale: the threshold is a 1-row exact-decimal aggregate of
    the customer dim, broadcast as a cross-join literal; the survivors
    anti-join the DATE-PRUNED orders scan on custkey — the cutoff and the
    o_custkey-only column pruning both reach the scan, and the anti-join
    hash-partitions both sides once.  The final per-nation agg is a
    handful of groups with map-side partials."""
    thr = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_avg")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        customer.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def q_q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q22_idle_balance(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


Q22_IDLE_BALANCE_SQL = """
WITH thr AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS a
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey,
  count(*) AS numcust,
  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, thr
WHERE c_acctbal > a
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# ---------------------------------------------------------------------------
# Q4 shape: late orders per priority (EXISTS semi-join with residual)
# ---------------------------------------------------------------------------

def q4_late_orders(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Orders (per priority) having at least one line shipped more than 90
    days after the order date — TPC-H Q4's EXISTS, decorrelated to a LEFT
    SEMI join whose date comparison rides the orderkey equi-join as a
    RESIDUAL condition (never a cross product).  Plan at scale: the
    quarter filter prunes the orders scan; the semi-join stops probing an
    order after its first late line (no fan-out), and the final agg is a
    5-row map-side collapse."""
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1997-04-01").cast("timestamp")
    o = orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    late = (o.o_orderkey == lineitem.l_orderkey) & (
        lineitem.l_shipdate > o.o_orderdate + F.expr("interval 90 days")
    )
    return (
        o.join(lineitem, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q4_late_orders(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    )


Q4_LATE_ORDERS_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q13 shape: customer order-count distribution (outer join + double agg)
# ---------------------------------------------------------------------------

def q13_order_counts(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Distribution of customers by how many (urgent-ish) orders they
    placed, INCLUDING zero-order customers — the shape that needs a LEFT
    OUTER join (an inner join silently drops the c_count=0 bucket, the
    largest one).  Plan at scale: orders pre-filter, one shuffle outer
    join on custkey, per-customer count, then a second tiny agg over
    |distinct counts| groups."""
    o = orders.filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        customer.join(o, customer.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count skips NULLs
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q_q13_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q13_order_counts(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


Q13_ORDER_COUNTS_SQL = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q6 shape: forecast revenue change (pure scan-pushdown aggregate)
# ---------------------------------------------------------------------------

def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """Revenue increase if discounts in a band were eliminated for one ship
    year — TPC-H Q6, the canonical predicate-pushdown benchmark: ALL three
    filters (shipdate range, discount band, quantity cap) must reach the
    parquet scan so a 100 TB fact reads only the row groups whose min/max
    stats overlap; the aggregate is a zero-shuffle map-side sum reduced to
    one row.  The sum stays exact decimal until the final double cast."""
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * F.col("l_discount").cast("decimal(18,2)")
                ).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q6_forecast_revenue(load_table(spark, sf_dir, "lineitem"))


Q6_FORECAST_REVENUE_SQL = """
SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q7 shape: volume shipping between two nations
# ---------------------------------------------------------------------------

def q7_nation_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Revenue shipped between two nations (either direction) per year —
    TPC-H Q7's shape: TWO independent dimension chains hang off the same
    fact (supplier→nation on l_suppkey, orders→customer→nation on
    l_orderkey).  Plan at scale: the nation filter is applied to the TINY
    nation dim FIRST, so supplier and customer are semi-pruned to ~2/25 of
    their rows before ever touching the fact — the pair disjunction then
    only has 2×2 combinations left to test as a residual.  supplier⋈nation
    broadcasts; lineitem⋈orders is the one unavoidable big⋈big shuffle;
    customer is mid-sized so its join is left to AQE (broadcast at fixture
    scale, shuffle at 100 TB)."""
    pair = ("NATION_1", "NATION_2")
    n1 = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation")
    )
    s = supplier.join(F.broadcast(n1), F.col("s_nationkey") == F.col("_snk")).select(
        "s_suppkey", "supp_nation"
    )
    c = customer.join(F.broadcast(n2), F.col("c_nationkey") == F.col("_cnk")).select(
        "c_custkey", "cust_nation"
    )
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    l = lineitem.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(orders.select("o_orderkey", "o_custkey"), l.l_orderkey == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev_dec()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q7_nation_volume(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


Q7_NATION_VOLUME_SQL = """
SELECT supp_nation, cust_nation, l_year,
  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    CAST(year(l_shipdate) AS INTEGER) AS l_year, l_extendedprice, l_discount
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('NATION_1','NATION_2')
    AND n2.n_name IN ('NATION_1','NATION_2')
    AND n1.n_name <> n2.n_name
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) t
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q8 shape: national market share within a region
# ---------------------------------------------------------------------------

def q8_market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
) -> DataFrame:
    """One nation's share of a region's revenue for one part type, per
    order year — TPC-H Q8: the deepest join tree in the suite (6 tables +
    the nation dim used TWICE).  Plan at scale: the part-type filter
    semi-prunes the fact through the broadcast part join first (~1/6
    survives), region→nation→customer pre-filters the customer side before
    it meets orders, and the supplier chain only TAGS rows (no filter) —
    so the numerator CASE rides the same rows as the denominator, one
    shuffle for lineitem⋈orders, one for the final 2-group agg.  Ratio is
    decimal/decimal in double with a zero-denominator NULL guard."""
    pk = part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    asia_nk = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("_rnk"))
    )
    c = customer.join(F.broadcast(asia_nk), customer.c_nationkey == F.col("_rnk")).select(
        "c_custkey"
    )
    s = supplier.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    o = orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    rev = _rev_dec()
    agg = (
        lineitem.join(F.broadcast(pk), lineitem.l_partkey == pk.p_partkey)
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
              lineitem.l_orderkey == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(s), lineitem.l_suppkey == s.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(
                    F.lit(0).cast("decimal(18,4)")
                )
            ).alias("_n"),
            F.sum(rev).alias("_d"),
        )
    )
    share = F.when(
        F.col("_d").isNotNull() & (F.col("_d") != 0),
        F.round(F.col("_n").cast("double") / F.col("_d").cast("double"), 4),
    )
    return agg.select("o_year", share.alias("mkt_share")).orderBy("o_year")


def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q8_market_share(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
        load_table(spark, sf_dir, "part"),
    )


Q8_MARKET_SHARE_SQL = """
WITH t AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4)) AS rev,
    n1.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
  CASE WHEN sum(rev) IS NOT NULL AND sum(rev) <> 0
    THEN round(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN rev ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
               / CAST(sum(rev) AS DOUBLE), 4)
  END AS mkt_share
FROM t
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive brand/size/quantity revenue
# ---------------------------------------------------------------------------

def q19_disjunct_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Revenue from three brand-specific (size, quantity) windows OR-ed
    together — TPC-H Q19's disjunction-of-conjunctions.  Plan at scale:
    the OR cannot be pushed as-is, so each side gets its DERIVED superset
    predicate pushed first (part: brand IN the 3 brands AND size ≤ the max
    window; lineitem: quantity within the hull of the 3 ranges) — the scan
    reads a fraction of both tables and the exact disjunction runs as a
    cheap residual after the broadcast part join.  This derived-pushdown
    rewrite is the part Catalyst does NOT do for you; the residual
    evaluation is whole-stage codegen either way."""
    l = lineitem.filter((F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30))
    p = part.filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_brand", "p_size")
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    disj = (
        ((b == "Brand#1") & sz.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#2") & sz.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#3") & sz.between(1, 15) & q.between(20, 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(disj)
        .agg(F.sum(_rev_dec()).cast("double").alias("revenue"))
    )


def q_q19_disjunct_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q19_disjunct_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


Q19_DISJUNCT_REVENUE_SQL = """
SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q21 shape: suppliers who alone held up multi-supplier orders
# ---------------------------------------------------------------------------

def q21_waiting_supplier(
    lineitem: DataFrame, orders: DataFrame, supplier: DataFrame
) -> DataFrame:
    """Late lines whose supplier was the ONLY late one in a multi-supplier
    order — TPC-H Q21's EXISTS(other supplier) + NOT EXISTS(other LATE
    supplier) double correlation.  The fixture has no commit/receipt
    dates, so "late" is shipped > 60 days after order date (same residual
    family as q4_late_orders; reference analog: the sanity bound F8,
    ``pull_report.pl:139``).

    Plan at scale: the naive form is TWO fact self-joins; here both
    correlations collapse into ONE window over l_orderkey — per-order
    distinct-supplier and distinct-late-supplier counts via
    size(collect_set) — so the fact shuffles ONCE on orderkey (bounded
    per-order state: ≤7 lines), and the EXISTS/NOT-EXISTS pair becomes
    the predicate n_supp > 1 AND n_late_supp = 1 on the late rows.  The
    oracle keeps the literal EXISTS/NOT EXISTS form to prove the rewrite
    exact."""
    from pyspark.sql.window import Window

    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("interval 60 days")
    w = Window.partitionBy("l_orderkey")
    tagged = li.select(
        "l_orderkey",
        "l_suppkey",
        late.alias("_late"),
    ).select(
        "*",
        F.size(F.collect_set("l_suppkey").over(w)).alias("_n_supp"),
        F.size(
            F.collect_set(F.when(F.col("_late"), F.col("l_suppkey"))).over(w)
        ).alias("_n_late"),
    )
    return (
        tagged.filter(F.col("_late") & (F.col("_n_supp") > 1) & (F.col("_n_late") == 1))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


def q_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q21_waiting_supplier(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "supplier"),
    )


Q21_WAITING_SUPPLIER_SQL = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


# ---------------------------------------------------------------------------
# Q18 shape: large-volume customer (aggregate semi-join reduction)
# ---------------------------------------------------------------------------

def q18_large_volume_customer(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, threshold: int = 300
) -> DataFrame:
    """Orders whose total line quantity exceeds ``threshold``, with the
    owning customer — the classic Q18 "HAVING subquery equals the outer
    aggregate" shape, decorrelated the way a 100 TB plan must be:

    1. ONE shuffle aggregates lineitem per orderkey (map-side partial
       combine collapses ~7 lines/order before the exchange).
    2. The ``> threshold`` filter keeps a few rows per million orders,
       so the survivor set BROADCASTS into the orders join — the fact
       table is never shuffled for the semi-join, and neither is
       customer: the orders⋈survivors result is again tiny and
       broadcasts into the customer join.  Total: one fact shuffle,
       zero big-side shuffles, a TakeOrdered top-100 instead of a
       global sort.

    The naive plan (correlated HAVING subquery re-aggregating lineitem
    per outer row) re-scans the fact once per order; Catalyst cannot
    rescue that formulation at scale, which is why the reduction is
    expressed explicitly here.  `big_spender_orders` (analytics.py) is
    the hint-free variant of this shape — AQE decides whether the
    survivor keyset broadcasts; here the classic 300-qty threshold
    makes survivors provably rare, so the hint is safe and saves AQE
    the runtime decision.

    ``l_quantity`` is integral (1..50) so the double sum is exact and
    casts to BIGINT identically in both engines."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > threshold)
        .select("l_orderkey", F.col("_q").cast("bigint").alias("total_qty"))
    )
    hit = orders.join(
        F.broadcast(big), orders.o_orderkey == big.l_orderkey
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "total_qty")
    return (
        customer.join(F.broadcast(hit), customer.c_custkey == hit.o_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )


def q_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q18_large_volume_customer(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


Q18_LARGE_VOLUME_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(l_quantity) AS BIGINT) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


QUERIES = {
    "q12_priority_class": q_q12_priority_class,
    "q18_large_volume": q_q18_large_volume,
    "q4_late_orders": q_q4_late_orders,
    "q13_order_counts": q_q13_order_counts,
    "q14_promo_revenue": q_q14_promo_revenue,
    "q15_top_supplier": q_q15_top_supplier,
    "q17_small_qty_revenue": q_q17_small_qty_revenue,
    "q22_idle_balance": q_q22_idle_balance,
    "q6_forecast_revenue": q_q6_forecast_revenue,
    "q7_nation_volume": q_q7_nation_volume,
    "q8_market_share": q_q8_market_share,
    "q19_disjunct_revenue": q_q19_disjunct_revenue,
    "q21_waiting_supplier": q_q21_waiting_supplier,
}

ORACLES = {
    "q12_priority_class": Q12_PRIORITY_CLASS_SQL,
    "q18_large_volume": Q18_LARGE_VOLUME_SQL,
    "q4_late_orders": Q4_LATE_ORDERS_SQL,
    "q13_order_counts": Q13_ORDER_COUNTS_SQL,
    "q14_promo_revenue": Q14_PROMO_REVENUE_SQL,
    "q15_top_supplier": Q15_TOP_SUPPLIER_SQL,
    "q17_small_qty_revenue": Q17_SMALL_QTY_REVENUE_SQL,
    "q22_idle_balance": Q22_IDLE_BALANCE_SQL,
    "q6_forecast_revenue": Q6_FORECAST_REVENUE_SQL,
    "q7_nation_volume": Q7_NATION_VOLUME_SQL,
    "q8_market_share": Q8_MARKET_SHARE_SQL,
    "q19_disjunct_revenue": Q19_DISJUNCT_REVENUE_SQL,
    "q21_waiting_supplier": Q21_WAITING_SUPPLIER_SQL,
}
