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


QUERIES = {"anonymize_ips": q_anonymize_ips}
ORACLES = {"anonymize_ips": _anonymize_sql()}
