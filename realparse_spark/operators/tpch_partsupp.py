"""The five classic TPC-H shapes that need ``partsupp`` (Q2/Q9/Q11/Q16/Q20)
— previously excluded because the driver fixture has no partsupp table
(TESTDATA.md).  Instead of claiming their plan patterns "by analogy"
(tpch_extra.py), this module SYNTHESIZES a deterministic partsupp from
``part`` × ``supplier`` with identical integer arithmetic in Spark and in
the DuckDB oracle (the same discipline parse_queries.py uses for log
lines), so each shape gets a real differential check:

- Q2 analog (``q2_min_cost_supplier``): per-group min + join-back on the
  grouping key (argmin without a window), region-filtered dim chain.
- Q9 analog (``q9_product_profit``): profit = revenue − supply cost; the
  fact joins partsupp on a COMPOSITE key (partkey, suppkey) — the one
  join in the suite whose right side is itself fact-sized.
- Q11 analog (``q11_important_stock``): grouped value vs a scalar
  threshold derived from the SAME filtered set (HAVING over a broadcast
  1-row aggregate).
- Q16 analog (``q16_supplier_counts``): NOT-IN supplier exclusion as a
  LEFT ANTI join + count(DISTINCT) per 3-column group.
- Q20 analog (``q20_promotable_stock``): nested semi-joins — availqty vs
  half the shipped quantity per (part, supplier), then suppliers having
  ANY qualifying stock.

Synthesis (mirrors TPC-H dbgen's own partsupp construction: 4 suppliers
per part at stride ~S/4): for i in 0..3, with S = |supplier| and
q = max(1, S div 4),

    ps_suppkey    = (p_partkey + i*q) mod S            (0-based keys)
    ps_availqty   = (p_partkey*17 + ps_suppkey*3) mod 9999 + 1
    ps_supplycost = ((p_partkey*31 + ps_suppkey*7) mod 100000 + 100) / 100.0

All operands stay integer until the single final /100.0 (one exact-input
IEEE division), so both engines produce bit-identical doubles.  Value
comparisons in the queries use exact decimal/integer math only
(e.g. Q20 tests 2*availqty > Σqty instead of availqty > 0.5*Σqty).

Scale notes (100 TB): partsupp is 4×|part| rows derived from the part
scan by a 4-way explode + a 1-row broadcast scalar — no shuffle to build.
In production it would be a real bucketed table; every plan below treats
it as fact-sized (never broadcast), while part/supplier/nation/region
dims ARE broadcast.  Reference parity: the reference's report joins
(pull_report.pl:99-139) are the 1-dim degenerate case of these shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realparse_spark.operators.tpch_extra import _rev_dec
from realparse_spark.sources.tables import load_table

_DEC2 = "decimal(18,2)"
_DEC4 = "decimal(18,4)"


# ---------------------------------------------------------------------------
# synthesized partsupp (Spark side)
# ---------------------------------------------------------------------------

def synth_partsupp(part: DataFrame, supplier: DataFrame) -> DataFrame:
    """part × {0..3} → deterministic partsupp.  The supplier count is the
    only corpus-dependent input: a 1-row aggregate broadcast into the
    part scan (scalar cross join — never a shuffle)."""
    scnt = supplier.agg(F.count(F.lit(1)).cast("bigint").alias("_s"))
    fours = F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(4)]))
    with_key = (
        part.select("p_partkey")
        .crossJoin(F.broadcast(scnt))
        .select("p_partkey", "_s", fours.alias("_i"))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            (
                (F.col("p_partkey") + F.col("_i") * F.expr("greatest(1L, _s div 4)"))
                % F.col("_s")
            ).cast("bigint").alias("ps_suppkey"),
        )
    )
    return with_key.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 17 + F.col("ps_suppkey") * 3) % 9999 + 1)
        .cast("int")
        .alias("ps_availqty"),
        (
            ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 7) % 100000 + 100)
            .cast("double")
            / 100.0
        ).alias("ps_supplycost"),
    )


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synth_partsupp(
        load_table(spark, sf_dir, "part"), load_table(spark, sf_dir, "supplier")
    )


# identical synthesis as a DuckDB CTE (prepended to every oracle below)
_PARTSUPP_CTE = """
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
    CAST((ps_partkey * 17 + ps_suppkey * 3) % 9999 + 1 AS INTEGER) AS ps_availqty,
    CAST((ps_partkey * 31 + ps_suppkey * 7) % 100000 + 100 AS DOUBLE) / 100.0 AS ps_supplycost
  FROM (
    SELECT p_partkey AS ps_partkey,
      (p_partkey + t.i * greatest(1, s.c // 4)) % s.c AS ps_suppkey
    FROM part,
      (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(3 AS BIGINT))) AS t(i),
      (SELECT CAST(count(*) AS BIGINT) AS c FROM supplier) AS s
  )
)"""


def _region_suppliers(
    supplier: DataFrame, nation: DataFrame, region: DataFrame, r_name: str
) -> DataFrame:
    """s_suppkey (+ name/balance/nation name) for suppliers in one region
    — a two-hop broadcast dim chain, resolved before any fact is touched."""
    nk = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == r_name)),
            nation.n_regionkey == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    return supplier.join(
        F.broadcast(nk), supplier.s_nationkey == nk.n_nationkey
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")


# ---------------------------------------------------------------------------
# Q2 shape: minimum-cost supplier per part (min + join-back)
# ---------------------------------------------------------------------------

def q2_min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    partsupp: DataFrame,
) -> DataFrame:
    """For mid-size ECONOMY/PROMO parts, the European supplier(s) offering
    the region's minimum supply cost — TPC-H Q2's correlated MIN subquery,
    decorrelated to aggregate + join-back on the grouping key.

    Plan at scale: the region dim chain collapses to a broadcast supplier
    list BEFORE partsupp is scanned, so the fact-sized partsupp is
    filtered by a broadcast hash join (no shuffle); the per-part MIN is
    one hash aggregate, and the join-back re-joins on ps_partkey —
    AQE co-partitions both sides off the same shuffle.  A window
    (min over partition) would need the identical shuffle but keep every
    row alive into the sort; the aggregate form is strictly narrower."""
    eu = _region_suppliers(supplier, nation, region, "EUROPE")
    ps_eu = partsupp.join(F.broadcast(eu), partsupp.ps_suppkey == eu.s_suppkey)
    mins = ps_eu.groupBy(F.col("ps_partkey").alias("_mk")).agg(
        F.min("ps_supplycost").alias("_minc")
    )
    pk = part.filter(
        F.col("p_size").between(10, 20) & F.col("p_type").isin("ECONOMY", "PROMO")
    ).select("p_partkey", "p_type")
    return (
        ps_eu.join(
            mins,
            (ps_eu.ps_partkey == mins._mk)
            & (ps_eu.ps_supplycost == mins._minc),
        )
        .join(F.broadcast(pk), ps_eu.ps_partkey == pk.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "ps_partkey", "p_type",
            "ps_supplycost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "ps_partkey"
        )
        .limit(100)
    )


def q_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q2_min_cost_supplier(
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
        _partsupp(spark, sf_dir),
    )


Q2_MIN_COST_SUPPLIER_SQL = f"""
WITH {_PARTSUPP_CTE},
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, ps_partkey, p_type, ps_supplycost
FROM partsupp
JOIN eu ON ps_suppkey = s_suppkey
JOIN part ON ps_partkey = p_partkey
WHERE p_size BETWEEN 10 AND 20
  AND p_type IN ('ECONOMY', 'PROMO')
  AND ps_supplycost = (
    SELECT min(ps2.ps_supplycost)
    FROM partsupp ps2
    JOIN eu e2 ON ps2.ps_suppkey = e2.s_suppkey
    WHERE ps2.ps_partkey = partsupp.ps_partkey
  )
ORDER BY s_acctbal DESC, n_name, s_name, ps_partkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q9 shape: product profit by nation and year (composite-key fact join)
# ---------------------------------------------------------------------------

def q9_product_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    partsupp: DataFrame,
) -> DataFrame:
    """Profit (revenue − supply cost × qty) per supplier nation per order
    year, for 'widget' parts — TPC-H Q9.  The distinguishing plan element:
    lineitem ⋈ partsupp on the COMPOSITE (partkey, suppkey) key, where
    BOTH sides are fact-sized at 100 TB.

    Plan at scale: the p_name filter broadcast-prunes lineitem first
    (~1/7 survives), then the composite-key join hash-partitions both
    facts ONCE on (partkey, suppkey); orders arrives by orderkey (second
    fact shuffle, unavoidable — different key), and supplier→nation rides
    as a broadcast tag.  All money math exact-decimal until the final
    cast, so the oracle hash-matches bit-for-bit."""
    pk = part.filter(F.col("p_name").like("%widget%")).select("p_partkey")
    sn = supplier.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation"))),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    cost = (
        F.col("ps_supplycost").cast(_DEC2) * F.col("l_quantity").cast(_DEC2)
    ).cast(_DEC4)
    return (
        lineitem.join(F.broadcast(pk), lineitem.l_partkey == pk.p_partkey)
        .join(
            partsupp,
            (lineitem.l_partkey == partsupp.ps_partkey)
            & (lineitem.l_suppkey == partsupp.ps_suppkey),
        )
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(sn), lineitem.l_suppkey == sn.s_suppkey)
        .groupBy(
            "nation", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg((F.sum(_rev_dec() - cost)).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q9_product_profit(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        _partsupp(spark, sf_dir),
    )


Q9_PRODUCT_PROFIT_SQL = f"""
WITH {_PARTSUPP_CTE}
SELECT n_name AS nation,
  CAST(year(o_orderdate) AS INTEGER) AS o_year,
  CAST(sum(
    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))
    - CAST(CAST(ps_supplycost AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4))
  ) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# Q11 shape: important stock (HAVING vs a scalar from the same set)
# ---------------------------------------------------------------------------

def q11_important_stock(
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    partsupp: DataFrame,
) -> DataFrame:
    """Parts whose Asian stock value exceeds 1.6× the average per-part
    value of the SAME filtered set — TPC-H Q11's grouped-sum vs
    scalar-subquery HAVING (the fixed fraction is replaced by a
    count-scaled one so the selectivity is stable at every SF; TPC-H
    itself scales the fraction by 1/SF for the same reason).

    Plan at scale: partsupp is filtered by the broadcast region-supplier
    list, then aggregated TWICE from the same pre-filtered scan — per
    part (shuffle on ps_partkey) and globally.  The global branch is a
    1-row partial-agg tree: a second scan, but ZERO shuffle (each task
    emits one partial row).  Measured alternative: deriving the total
    from the grouped aggregate re-runs the groupBy shuffle without an
    actual ReuseExchange and is ~1.6× slower — the shuffle-free rescan
    wins at every scale where the scan is cheaper than a shuffle.  The
    1-row side comes back as a broadcast scalar, so the HAVING is a
    map-side filter, not a join.  Value math exact-decimal; the threshold
    comparison is double on both engines with the identical association
    order ((1.6 × total) / n_parts)."""
    asia = _region_suppliers(supplier, nation, region, "ASIA").select("s_suppkey")
    val = (
        F.col("ps_supplycost").cast(_DEC2) * F.col("ps_availqty").cast(_DEC2)
    ).cast(_DEC4)
    ps = partsupp.join(F.broadcast(asia), partsupp.ps_suppkey == asia.s_suppkey)
    grouped = ps.groupBy("ps_partkey").agg(F.sum(val).alias("_v"))
    tot = ps.agg(
        F.sum(val).cast("double").alias("_t"),
        F.countDistinct("ps_partkey").cast("double").alias("_np"),
    )
    return (
        grouped.crossJoin(F.broadcast(tot))
        .filter(
            F.col("_v").cast("double") > (F.lit(1.6) * F.col("_t")) / F.col("_np")
        )
        .select(
            "ps_partkey", F.col("_v").cast("double").alias("stock_value")
        )
        .orderBy(F.col("stock_value").desc(), "ps_partkey")
    )


def q_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q11_important_stock(
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
        _partsupp(spark, sf_dir),
    )


Q11_IMPORTANT_STOCK_SQL = f"""
WITH {_PARTSUPP_CTE},
asia AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
),
ps AS (
  SELECT ps_partkey,
    CAST(CAST(ps_supplycost AS DECIMAL(18,2)) * CAST(ps_availqty AS DECIMAL(18,2)) AS DECIMAL(18,4)) AS v
  FROM partsupp JOIN asia ON ps_suppkey = s_suppkey
),
tot AS (
  SELECT CAST(sum(v) AS DOUBLE) AS t,
    CAST(count(DISTINCT ps_partkey) AS DOUBLE) AS np
  FROM ps
)
SELECT ps_partkey, CAST(sum(v) AS DOUBLE) AS stock_value
FROM ps, tot
GROUP BY ps_partkey, t, np
HAVING CAST(sum(v) AS DOUBLE) > (1.6 * t) / np
ORDER BY stock_value DESC, ps_partkey
"""


# ---------------------------------------------------------------------------
# Q16 shape: supplier counts per brand/type/size (NOT-IN anti-join)
# ---------------------------------------------------------------------------

def q16_supplier_counts(
    part: DataFrame, supplier: DataFrame, partsupp: DataFrame
) -> DataFrame:
    """Distinct-supplier counts per (brand, type, size) over square-size
    non-PROMO parts, excluding a blocklisted supplier set — TPC-H Q16,
    whose NOT IN subquery becomes a LEFT ANTI join.

    Plan at scale: the blocklist (a filtered dim) broadcasts into the
    anti-join, so partsupp is scanned once with a map-side exclusion;
    the part filter also broadcasts; the only shuffle is the final
    3-column group for count(DISTINCT ps_suppkey), which Spark expands
    to a two-level aggregate (partial distinct map-side)."""
    excl = supplier.filter(F.col("s_name").like("%7")).select("s_suppkey")
    pf = part.filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").like("PROMO%"))
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        partsupp.join(
            F.broadcast(excl), partsupp.ps_suppkey == excl.s_suppkey, "left_anti"
        )
        .join(F.broadcast(pf), partsupp.ps_partkey == pf.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def q_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q16_supplier_counts(
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        _partsupp(spark, sf_dir),
    )


Q16_SUPPLIER_COUNTS_SQL = f"""
WITH {_PARTSUPP_CTE}
SELECT p_brand, p_type, p_size,
  CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp
JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q20 shape: promotable stock (nested semi-joins)
# ---------------------------------------------------------------------------

def q20_promotable_stock(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    partsupp: DataFrame,
) -> DataFrame:
    """American suppliers holding excess stock of 'bolt' parts — stock
    exceeding half of what they shipped in 1997 — TPC-H Q20's two nested
    IN subqueries, flattened to: per-(part, supplier) shipped-quantity
    aggregate → inner join to partsupp → threshold filter → LEFT SEMI
    into the supplier dim.

    Plan at scale: the 1997 filter prunes the lineitem scan, the shipped
    aggregate shuffles on the SAME composite key the partsupp join needs
    (one exchange, reused); the part-name filter broadcasts.  The
    threshold uses integer/decimal math only (2·availqty > Σqty, exactly
    equivalent to availqty > 0.5·Σqty) so no float divergence exists.
    The final semi-join probes the small supplier dim with the distinct
    qualifying suppkeys."""
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    shipped = (
        lineitem.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC2)).alias("_qty"))
    )
    bolts = part.filter(F.col("p_name").like("%bolt%")).select("p_partkey")
    qual = (
        partsupp.join(F.broadcast(bolts), partsupp.ps_partkey == bolts.p_partkey)
        .join(
            shipped,
            (partsupp.ps_partkey == shipped.l_partkey)
            & (partsupp.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.col("ps_availqty").cast(_DEC2) * 2 > F.col("_qty"))
        .select("ps_suppkey")
    )
    america = _region_suppliers(supplier, nation, region, "AMERICA")
    return (
        america.join(qual, america.s_suppkey == qual.ps_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def q_q20_promotable_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q20_promotable_stock(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
        _partsupp(spark, sf_dir),
    )


Q20_PROMOTABLE_STOCK_SQL = f"""
WITH {_PARTSUPP_CTE}
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
  AND s_suppkey IN (
    SELECT ps_suppkey
    FROM partsupp
    JOIN part ON ps_partkey = p_partkey
    JOIN (
      SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ) sh ON ps_partkey = sh.l_partkey AND ps_suppkey = sh.l_suppkey
    WHERE p_name LIKE '%bolt%'
      AND CAST(ps_availqty AS DECIMAL(18,2)) * 2 > qty
  )
ORDER BY s_name
"""


QUERIES = {
    "q2_min_cost_supplier": q_q2_min_cost_supplier,
    "q9_product_profit": q_q9_product_profit,
    "q11_important_stock": q_q11_important_stock,
    "q16_supplier_counts": q_q16_supplier_counts,
    "q20_promotable_stock": q_q20_promotable_stock,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_MIN_COST_SUPPLIER_SQL,
    "q9_product_profit": Q9_PRODUCT_PROFIT_SQL,
    "q11_important_stock": Q11_IMPORTANT_STOCK_SQL,
    "q16_supplier_counts": Q16_SUPPLIER_COUNTS_SQL,
    "q20_promotable_stock": Q20_PROMOTABLE_STOCK_SQL,
}
