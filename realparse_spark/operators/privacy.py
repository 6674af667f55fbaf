"""Privacy operators for log pipelines: IP anonymization.

The reference stores raw client IPs (`real_parse.pl:96-177` INSERTs the
parsed address verbatim); a modern pipeline must be able to anonymize at
ingest.  Two standard schemes, both pure column expressions (scan-speed,
shuffle-free):

- pseudonymize: keyed digest token (md5 over salt:ip, 48-bit prefix) —
  referentially consistent (same IP -> same token, joins/sessionization
  still work) but not reversible without the salt.
- truncate: /24 zeroing (GDPR-style coarsening) — preserves network
  locality for geo/abuse aggregation, drops host identity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def pseudonymize_ip(ip: Column, salt: str = "realparse") -> Column:
    """Keyed, referentially-consistent 12-hex-char token for an IP."""
    return F.substring(F.md5(F.concat(F.lit(salt + ":"), ip)), 1, 12)


def truncate_ip(ip: Column) -> Column:
    """/24 truncation: last octet zeroed."""
    return F.regexp_replace(ip, r"\.[0-9]+$", ".0")


def anonymize_ips(df: DataFrame, ip_col: str = "client_ip_address", salt: str = "realparse") -> DataFrame:
    """Replace the raw IP column with pseudonym + truncated forms."""
    return df.withColumn("ip_pseudo", pseudonymize_ip(F.col(ip_col), salt)).withColumn(
        "ip_trunc", truncate_ip(F.col(ip_col))
    ).drop(ip_col)


# ---------------------------------------------------------------------------
# driver query: anonymized style-5 parse
# ---------------------------------------------------------------------------


def q_anonymize_ips(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realparse_spark.operators.parse import parse_style5
    from realparse_spark.operators.parse_queries import synth_style5
    from realparse_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    parsed = parse_style5(synth_style5(events))
    anon = anonymize_ips(parsed.select("event_id", "client_ip_address", "name"))
    return anon.select("event_id", "ip_pseudo", "ip_trunc", "name")


def _anonymize_sql() -> str:
    from realparse_spark.operators.parse_queries import _STYLE5_LINES_SQL

    return (
        "WITH "
        + _STYLE5_LINES_SQL.strip()
        + r""",
ips AS (
  SELECT event_id,
    regexp_extract(value, '^(\S+)', 1) AS ip,
    regexp_extract(value, '"(\S+) (.*?) (\S+)"', 2) AS fn
  FROM lines
),
named AS (
  SELECT event_id, ip,
    string_split(fn, '/')[-1] AS raw_name
  FROM ips
)
SELECT event_id,
  substring(md5('realparse:' || ip), 1, 12) AS ip_pseudo,
  regexp_replace(ip, '\.[0-9]+$', '.0') AS ip_trunc,
  CASE WHEN regexp_extract(raw_name, '^(.+\.\w*)', 1) = '' THEN raw_name
       ELSE regexp_extract(raw_name, '^(.+\.\w*)', 1) END AS name
FROM named
"""
    )


# ---------------------------------------------------------------------------
# PII redaction (emails / phone-shaped numbers) for document corpora
# ---------------------------------------------------------------------------

# dialect-portable patterns: same semantics under Java regex (Spark) and
# RE2 (DuckDB) — no lookarounds, no backrefs
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b[0-9]{3}-[0-9]{4}\b"


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Count and mask email addresses and phone-shaped numbers in a text
    column.  Pure column expressions (two regexp_replace passes + two
    regexp_count) — scan-speed, shuffle-free, the shape a 100 TB corpus
    scrub must have.  Counts are kept so the pipeline can audit how much
    PII each source carries before/after."""
    t = F.col(text_col)
    return docs.withColumn("n_emails", F.regexp_count(t, F.lit(_EMAIL_RE))).withColumn(
        "n_phones", F.regexp_count(t, F.lit(_PHONE_RE))
    ).withColumn(
        text_col,
        F.regexp_replace(
            F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ),
    )


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture corpus carries no PII, so the query plants a
    deterministic email + phone per doc (same arithmetic in the oracle)
    and scrubs it — the redaction itself is what's under test."""
    from realparse_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.format_string(
                " contact user%d@example.com or call 555-%04d now",
                F.col("doc_id"),
                F.pmod(F.col("doc_id"), F.lit(10000)),
            ),
        ).alias("text"),
    )
    return redact_pii(planted).select("doc_id", "n_emails", "n_phones", "text")


REDACT_PII_SQL = r"""
WITH planted AS (
  SELECT doc_id,
    text || printf(' contact user%d@example.com or call 555-%04d now',
                   doc_id, doc_id % 10000) AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
  CAST(len(regexp_extract_all(text, '\b[0-9]{3}-[0-9]{4}\b')) AS INTEGER) AS n_phones,
  regexp_replace(
    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\b[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g') AS text
FROM planted
"""


def k_anonymity(df: DataFrame, quasi_cols: list[str], k: int = 5) -> DataFrame:
    """k-anonymity audit over a set of quasi-identifier columns: every
    row must be indistinguishable from at least k-1 others on those
    columns before a dataset is released/trained on.  Returns one row
    per equivalence-class size bucket: (class_size_bucket, n_classes,
    n_rows, at_risk) where at_risk marks buckets under k.

    100 TB shape: ONE map-side-combined groupBy on the quasi-identifier
    tuple (the equivalence classes), then a second tiny aggregation over
    the O(classes) counts.  Output is O(distinct class sizes) — the
    audit never materializes row-level data, so it can run on the raw
    table without itself becoming a disclosure risk."""
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size")
    )
    return (
        classes.groupBy("class_size")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            (F.count(F.lit(1)) * F.col("class_size")).cast("bigint").alias("n_rows"),
        )
        .select(
            F.col("class_size").alias("class_size_bucket"),
            "n_classes",
            "n_rows",
            (F.col("class_size") < k).alias("at_risk"),
        )
        .orderBy("class_size_bucket")
    )


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit the customer table on the (c_nationkey, c_mktsegment)
    quasi-identifier pair at k=5: the class-size histogram with at-risk
    flags.  Oracle is the literal double aggregation."""
    from realparse_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer")
    return k_anonymity(cust, ["c_nationkey", "c_mktsegment"], k=5)


K_ANONYMITY_SQL = """
WITH classes AS (
  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS class_size
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT class_size AS class_size_bucket,
  CAST(count(*) AS BIGINT) AS n_classes,
  CAST(count(*) * class_size AS BIGINT) AS n_rows,
  class_size < 5 AS at_risk
FROM classes
GROUP BY class_size
ORDER BY class_size_bucket
"""


def l_diversity(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int = 3
) -> DataFrame:
    """l-diversity audit — k-anonymity's complement: an equivalence
    class where everyone shares the SAME sensitive value leaks that
    value even when the class is large, so each class must contain at
    least `l` distinct sensitive values.  Returns one row per diversity
    level: (n_sensitive, n_classes, n_rows, at_risk).

    100 TB shape mirrors k_anonymity: the distinct count per class is a
    first groupBy on (quasi, sensitive) then a count per quasi tuple —
    two map-side-combined shuffles, output O(distinct diversity levels);
    the audit never materializes row-level data."""
    pairs = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    classes = pairs.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sensitive"),
        F.sum("n").cast("bigint").alias("class_rows"),
    )
    return (
        classes.groupBy("n_sensitive")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum("class_rows").cast("bigint").alias("n_rows"),
        )
        .select(
            "n_sensitive",
            "n_classes",
            "n_rows",
            (F.col("n_sensitive") < l).alias("at_risk"),
        )
        .orderBy("n_sensitive")
    )


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit the customer table: within each (nationkey, mktsegment)
    class, how many distinct account-balance signs/buckets appear — the
    sensitive attribute is the balance bucketed to thousands, l=3."""
    from realparse_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer").withColumn(
        "bal_bucket", F.floor(F.col("c_acctbal") / 1000).cast("int")
    )
    return l_diversity(cust, ["c_nationkey", "c_mktsegment"], "bal_bucket", l=3)


L_DIVERSITY_SQL = """
WITH pairs AS (
  SELECT c_nationkey, c_mktsegment,
    CAST(floor(c_acctbal / 1000) AS INTEGER) AS bal_bucket,
    CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2, 3
),
classes AS (
  SELECT c_nationkey, c_mktsegment,
    CAST(count(*) AS BIGINT) AS n_sensitive,
    CAST(sum(n) AS BIGINT) AS class_rows
  FROM pairs GROUP BY 1, 2
)
SELECT n_sensitive,
  CAST(count(*) AS BIGINT) AS n_classes,
  CAST(sum(class_rows) AS BIGINT) AS n_rows,
  n_sensitive < 3 AS at_risk
FROM classes
GROUP BY n_sensitive
ORDER BY n_sensitive
"""


T_CLOSENESS_PPM = 200_000  # t = 0.2


def t_closeness(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t_ppm: int = T_CLOSENESS_PPM,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    third leg of the release trio: k-anonymity bounds class size,
    l-diversity bounds distinct sensitive values, but a class can pass
    both while its sensitive DISTRIBUTION still leaks (e.g. 90% of one
    bucket vs 10% globally).  t-closeness bounds the Earth Mover's
    Distance between each equivalence class's sensitive distribution
    and the global one; for an ORDERED attribute with m buckets,
    EMD = (1/(m-1)) * sum_i |cumsum_i(p - q)|.

    ALL-INTEGER arithmetic: p_j - q_j is kept as the exact BIGINT
    numerator cnt_cj*N - g_j*Nc over the common denominator Nc*N, so
    emd_ppm = sum|cumdiff| * 1e6 div ((m-1)*Nc*N) is exact and the
    oracle hash-matches with no float anywhere.  (At extreme corpus
    sizes the triple product needs DECIMAL headroom — int64 holds
    comfortably to ~1e9-row tables, documented rather than silent.)

    Scale: two map-side-combined groupBys (cells, class totals), the
    O(m)-row global distribution broadcast into an O(classes x m)
    dense grid, one per-class PARTITIONED window for the cumulative
    sums, and a final O(classes) rollup.  Nothing row-level survives
    the first aggregation — the audit is release-safe like its two
    siblings."""
    from pyspark.sql import Window

    cell = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    cls_tot = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("class_rows")
    )
    g = df.groupBy(sensitive_col).agg(F.count(F.lit(1)).cast("bigint").alias("g"))
    tot = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.countDistinct(sensitive_col).cast("bigint").alias("m"),
    )
    grid = (
        cls_tot.crossJoin(F.broadcast(g))
        .join(cell, [*quasi_cols, sensitive_col], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            *quasi_cols,
            sensitive_col,
            "class_rows",
            "n_total",
            "m",
            (
                F.coalesce(F.col("cnt"), F.lit(0)) * F.col("n_total")
                - F.col("g") * F.col("class_rows")
            ).alias("diff"),
        )
    )
    w = (
        Window.partitionBy(*quasi_cols)
        .orderBy(sensitive_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.withColumn("cum", F.sum("diff").over(w))
    return (
        cum.groupBy(*quasi_cols, "class_rows", "n_total", "m")
        .agg(F.sum(F.abs(F.col("cum"))).alias("s"))
        .select(
            *quasi_cols,
            "class_rows",
            F.expr(
                "s * 1000000 div (greatest(m - 1, 1) * class_rows * n_total)"
            ).alias("emd_ppm"),
        )
        .withColumn("at_risk", F.col("emd_ppm") > t_ppm)
        .orderBy(*quasi_cols)
    )


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit the customer table per (nationkey, mktsegment) class against
    the global thousand-bucketed balance distribution at t = 0.2."""
    from realparse_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer").withColumn(
        "bal_bucket", F.floor(F.col("c_acctbal") / 1000).cast("int")
    )
    return t_closeness(cust, ["c_nationkey", "c_mktsegment"], "bal_bucket")


T_CLOSENESS_SQL = f"""
WITH b AS (
  SELECT c_nationkey, c_mktsegment,
    CAST(floor(c_acctbal / 1000) AS INTEGER) AS bal_bucket
  FROM customer
),
cell AS (
  SELECT c_nationkey, c_mktsegment, bal_bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM b GROUP BY 1, 2, 3
),
cls AS (
  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS class_rows
  FROM b GROUP BY 1, 2
),
g AS (SELECT bal_bucket, CAST(count(*) AS BIGINT) AS g FROM b GROUP BY 1),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total,
         CAST(count(DISTINCT bal_bucket) AS BIGINT) AS m
  FROM b
),
grid AS (
  SELECT cls.c_nationkey, cls.c_mktsegment, g.bal_bucket,
    cls.class_rows, tot.n_total, tot.m,
    coalesce(cell.cnt, 0) * tot.n_total - g.g * cls.class_rows AS diff
  FROM cls CROSS JOIN g
  LEFT JOIN cell ON cell.c_nationkey = cls.c_nationkey
    AND cell.c_mktsegment = cls.c_mktsegment AND cell.bal_bucket = g.bal_bucket
  CROSS JOIN tot
),
cum AS (
  SELECT *, sum(diff) OVER (
    PARTITION BY c_nationkey, c_mktsegment ORDER BY bal_bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM grid
)
SELECT c_nationkey, c_mktsegment, class_rows,
  CAST(sum(abs(cum)) * 1000000
       // (greatest(m - 1, 1) * class_rows * n_total) AS BIGINT) AS emd_ppm,
  CAST(sum(abs(cum)) * 1000000
       // (greatest(m - 1, 1) * class_rows * n_total) AS BIGINT)
    > {T_CLOSENESS_PPM} AS at_risk
FROM cum
GROUP BY c_nationkey, c_mktsegment, class_rows, n_total, m
ORDER BY c_nationkey, c_mktsegment
"""


# ---------------------------------------------------------------------------
# differentially-private group counts (discrete Laplace / two-sided geometric)
# ---------------------------------------------------------------------------

# eps = 1, sensitivity 1 -> alpha = e^-eps; noise k in [-8, 8] with
# P(k) ∝ alpha^|k| (Ghosh-Roughgarden-Sundararajan's geometric mechanism,
# the integer-valued analogue of Laplace).  Truncation at ±8 carries
# ~2.5e-4 tail mass for eps=1 — documented utility, not silent.
_DP_EPS = 1.0
_DP_MAX_NOISE = 8


def _dp_probs() -> list[float]:
    import math

    alpha = math.exp(-_DP_EPS)
    return [alpha ** abs(k) for k in range(-_DP_MAX_NOISE, _DP_MAX_NOISE + 1)]


def dp_group_counts(
    df: DataFrame, group_col: str, salt: str = "dp"
) -> DataFrame:
    """Noisy group counts under the truncated geometric (discrete
    Laplace) mechanism at eps=1: the standard DP release for count
    queries, with noise drawn by inverse CDF over an md5-derived uniform
    keyed on the group value — deterministic here so the oracle (and a
    re-run audit) reproduces the release bit-for-bit; a production
    release salts per publication instead.

    Output keeps the true count alongside the released one because this
    is a correctness fixture for the MECHANISM (|released - true| <= 8
    by construction); an actual release drops n_true.

    100 TB shape: one map-side-combined groupBy; the noise is a scalar
    expression over the O(groups) aggregate — nothing row-level."""
    from realparse_spark.operators.inference import (
        _case_ladder,
        cdf_thresholds,
        hash_u32,
    )

    values = list(range(-_DP_MAX_NOISE, _DP_MAX_NOISE + 1))
    thresholds = cdf_thresholds(_dp_probs())
    grouped = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true")
    )
    u = hash_u32(salt, F.col(group_col))
    noise = _case_ladder(u, thresholds, values).cast("bigint")
    return grouped.select(
        group_col,
        "n_true",
        (F.col("n_true") + noise).alias("n_released"),
    ).orderBy(group_col)


def q_dp_group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realparse_spark.sources.tables import load_table

    return dp_group_counts(load_table(spark, sf_dir, "events"), "event_type")


def _dp_group_counts_sql() -> str:
    from realparse_spark.operators.inference import (
        _case_ladder_sql,
        _hash_u32_sql,
        cdf_thresholds,
    )

    values = list(range(-_DP_MAX_NOISE, _DP_MAX_NOISE + 1))
    u = _hash_u32_sql("dp", "event_type")
    ladder = _case_ladder_sql(u, cdf_thresholds(_dp_probs()), values)
    return f"""
WITH grouped AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
  FROM events GROUP BY event_type
)
SELECT event_type, n_true,
  n_true + CAST({ladder} AS BIGINT) AS n_released
FROM grouped ORDER BY event_type
"""


QUERIES = {
    "anonymize_ips": q_anonymize_ips,
    "redact_pii": q_redact_pii,
    "k_anonymity": q_k_anonymity,
    "l_diversity": q_l_diversity,
    "t_closeness": q_t_closeness,
    "dp_group_counts": q_dp_group_counts,
}
ORACLES = {
    "anonymize_ips": _anonymize_sql(),
    "redact_pii": REDACT_PII_SQL,
    "k_anonymity": K_ANONYMITY_SQL,
    "l_diversity": L_DIVERSITY_SQL,
    "t_closeness": T_CLOSENESS_SQL,
    "dp_group_counts": _dp_group_counts_sql(),
}
