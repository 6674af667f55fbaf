"""Differential queries for the parse operators (SURVEY.md §2.2).

The reference offers no test corpus, so each query *synthesizes* log lines
deterministically from the ``events`` table (same arithmetic in Spark and in
the DuckDB oracle), runs the parse operators, and emits the extracted
fields.  Both engines re-extract from byte-identical strings, so any
disagreement is a real parse-semantics divergence.

The synthesized corpus deliberately covers the reference's edge cases
(FIXTURES.md §A1): digit-leading path segments (P4 heuristic), query-arg
truncation (P10), empty audio_format (C12), QuickTime vs RealPlayer vs
empty client_info (P11/P12), all three stats-mask shapes (P13).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from realparse_spark.operators.parse import (
    explode_stats_masks,
    parse_client_info,
    parse_style5,
    parse_weblog,
)
from realparse_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# shared synthesis (Spark side)
# ---------------------------------------------------------------------------


def _client_info_col() -> Column:
    eid = F.col("event_id")
    return (
        F.when(eid % 3 == 0, F.format_string("Win_5.0_6.0.9.%d_play32_RN01_EN_586_0", eid % 999))
        .when(eid % 3 == 1, F.lit("QT (qtver=6.0;os=Mac OS X)"))
        .otherwise(F.lit(""))
    )


from realparse_spark.sources.tables import fan_out as _fan_out


def synth_style5(events: DataFrame) -> DataFrame:
    """events -> one style-5 log line per row (column 'value')."""
    events = _fan_out(events)
    eid, uid = F.col("event_id"), F.col("user_id")
    ip = F.format_string("10.%d.%d.%d", eid % 200, (uid * 7) % 250, 1 + (eid % 250))
    ts_str = F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss")
    fname = (
        F.when(eid % 5 == 0, F.format_string("/media/promo 6959/clip%d.rm", eid % 100))
        .when(eid % 5 == 1, F.format_string("/media/u%d/v%d/clip%d.rm", uid % 50, eid % 9, eid % 100))
        .when(eid % 5 == 2, F.format_string("/clip%d.rm?start=10", eid % 100))
        .when(eid % 5 == 3, F.format_string("/media/archive/show%d.mov", eid % 100))
        .otherwise(F.format_string("/media/audio/track%d.wma", eid % 100))
    )
    status = F.when(eid % 10 == 0, F.lit(404)).otherwise(F.lit(200))
    guid = F.format_string("%08d-0000-0000-0000-%012d", eid, uid)
    stats = (
        F.when(
            eid % 4 == 0,
            F.lit(
                " [Stat1: 1200 3 2 1 4 audio/x-pn-realaudio]"
                " [Stat2: 80000 64000 80000 16000 60000 1200 1195 4 1.5 1 2 audio/x-pn-realaudio]"
            ),
        )
        .when(eid % 4 == 1, F.lit(" [Stat1: 1200 3 2 1 4 ]"))
        .when(eid % 4 == 2, F.format_string(" [Stat3: raw_data_%d]", eid % 77))
        .otherwise(F.lit(""))
    )
    line = F.format_string(
        '%s - - [%s -0800] "GET %s RTSP/1.0" %d %d [%s] [%s]%s %d %d %d %d %d %d',
        ip, ts_str, fname, status, (eid * 37) % 100000, _client_info_col(), guid, stats,
        (eid * 53) % 1000000, eid % 600, (eid * 3) % 600, eid % 5, eid % 3, eid % 50,
    )
    return events.select("event_id", line.alias("value"))


def synth_weblog(events: DataFrame) -> DataFrame:
    """events -> combined-format web line; ~1/3 are non-.wma/.wmv (the F4
    filter must drop them)."""
    events = _fan_out(events)
    eid, uid = F.col("event_id"), F.col("user_id")
    ip = F.format_string("10.%d.%d.%d", eid % 200, (uid * 7) % 250, 1 + (eid % 250))
    ts_str = F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss")
    fname = (
        F.when(eid % 3 == 0, F.format_string("/media/surprise/intro%d.wmv", eid % 100))
        .when(eid % 3 == 1, F.format_string("/media/surprise/track%d.wma", eid % 100))
        .otherwise(F.format_string("/index%d.html", eid % 100))
    )
    ua = F.when(eid % 2 == 0, F.lit("Mozilla/4.0 (compatible; Windows Media Player 7.1)")).otherwise(
        F.lit("NSPlayer/9.0.0.2980")
    )
    line = F.format_string(
        '%s - - [%s -0800] "GET %s HTTP/1.1" %d %d "-" "%s"',
        ip, ts_str, fname, F.when(eid % 10 == 0, F.lit(404)).otherwise(F.lit(200)),
        (eid * 37) % 100000, ua,
    )
    return events.select("event_id", line.alias("value"))


# shared DuckDB synthesis CTEs (must mirror the Spark arithmetic exactly)
_STYLE5_LINES_SQL = r"""
lines AS (
  SELECT event_id,
    printf('%s - - [%s -0800] "GET %s RTSP/1.0" %d %d [%s] [%s]%s %d %d %d %d %d %d',
      printf('10.%d.%d.%d', event_id % 200, (user_id * 7) % 250, 1 + (event_id % 250)),
      strftime(ts, '%d/%b/%Y:%H:%M:%S'),
      CASE
        WHEN event_id % 5 = 0 THEN printf('/media/promo 6959/clip%d.rm', event_id % 100)
        WHEN event_id % 5 = 1 THEN printf('/media/u%d/v%d/clip%d.rm', user_id % 50, event_id % 9, event_id % 100)
        WHEN event_id % 5 = 2 THEN printf('/clip%d.rm?start=10', event_id % 100)
        WHEN event_id % 5 = 3 THEN printf('/media/archive/show%d.mov', event_id % 100)
        ELSE printf('/media/audio/track%d.wma', event_id % 100)
      END,
      CASE WHEN event_id % 10 = 0 THEN 404 ELSE 200 END,
      (event_id * 37) % 100000,
      CASE
        WHEN event_id % 3 = 0 THEN printf('Win_5.0_6.0.9.%d_play32_RN01_EN_586_0', event_id % 999)
        WHEN event_id % 3 = 1 THEN 'QT (qtver=6.0;os=Mac OS X)'
        ELSE ''
      END,
      printf('%08d-0000-0000-0000-%012d', event_id, user_id),
      CASE
        WHEN event_id % 4 = 0 THEN ' [Stat1: 1200 3 2 1 4 audio/x-pn-realaudio] [Stat2: 80000 64000 80000 16000 60000 1200 1195 4 1.5 1 2 audio/x-pn-realaudio]'
        WHEN event_id % 4 = 1 THEN ' [Stat1: 1200 3 2 1 4 ]'
        WHEN event_id % 4 = 2 THEN printf(' [Stat3: raw_data_%d]', event_id % 77)
        ELSE ''
      END,
      (event_id * 53) % 1000000, event_id % 600, (event_id * 3) % 600,
      event_id % 5, event_id % 3, event_id % 50) AS value
  FROM events
)
"""

_WEBLOG_LINES_SQL = r"""
lines AS (
  SELECT event_id,
    printf('%s - - [%s -0800] "GET %s HTTP/1.1" %d %d "-" "%s"',
      printf('10.%d.%d.%d', event_id % 200, (user_id * 7) % 250, 1 + (event_id % 250)),
      strftime(ts, '%d/%b/%Y:%H:%M:%S'),
      CASE
        WHEN event_id % 3 = 0 THEN printf('/media/surprise/intro%d.wmv', event_id % 100)
        WHEN event_id % 3 = 1 THEN printf('/media/surprise/track%d.wma', event_id % 100)
        ELSE printf('/index%d.html', event_id % 100)
      END,
      CASE WHEN event_id % 10 = 0 THEN 404 ELSE 200 END,
      (event_id * 37) % 100000,
      CASE WHEN event_id % 2 = 0 THEN 'Mozilla/4.0 (compatible; Windows Media Player 7.1)'
           ELSE 'NSPlayer/9.0.0.2980' END) AS value
  FROM events
)
"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_parse_style5(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    parsed = parse_style5(synth_style5(events))
    return parsed.select(
        "event_id", "client_ip_address", "identuser", "authuser", "datetime",
        "epoch", "gmt_offset", "method", "protocol_version", "status_code",
        "bytes_sent", "file_size", "file_time", "sent_time", "resends",
        "failed_resends", "presentation_id", "path", "name",
        F.col("client_info").alias("client_info"),
        F.col("client_GUID").alias("client_guid"),
    )


PARSE_STYLE5_SQL = (
    "WITH "
    + _STYLE5_LINES_SQL.strip().rstrip()
    + r""",
parsed AS (
  SELECT event_id, value,
    regexp_extract(value, '^(\S+)', 1) AS client_ip_address,
    regexp_extract_all(value, '\s(\d+)', 1) AS toks_raw,
    regexp_extract_all(value, '\[([^\]]*)\]', 1) AS brackets,
    regexp_extract(value, '"(\S+) (.*?) (\S+)"', 1) AS method,
    regexp_extract(value, '"(\S+) (.*?) (\S+)"', 2) AS fn,
    regexp_extract(value, '"(\S+) (.*?) (\S+)"', 3) AS protocol_version
  FROM lines
),
toks AS (
  SELECT *,
    CASE WHEN regexp_matches(toks_raw[1], '[69_]\w') THEN toks_raw[2:] ELSE toks_raw END AS t,
    strptime(regexp_extract(brackets[1], '^(.+) -(\d+)$', 1), '%d/%b/%Y:%H:%M:%S') AS ts2,
    string_split(fn, '/')[-1] AS raw_name
  FROM parsed
)
SELECT event_id, client_ip_address,
  '-' AS identuser, '-' AS authuser,
  strftime(ts2, '%Y-%m-%d %H:%M:%S') AS datetime,
  CAST(epoch(ts2) AS BIGINT) AS epoch,
  regexp_extract(brackets[1], '^(.+) -(\d+)$', 2) AS gmt_offset,
  method, protocol_version,
  CAST(t[1] AS INTEGER) AS status_code,
  CAST(t[2] AS BIGINT) AS bytes_sent,
  CAST(t[-6] AS BIGINT) AS file_size,
  CAST(t[-5] AS INTEGER) AS file_time,
  CAST(t[-4] AS INTEGER) AS sent_time,
  CAST(t[-3] AS INTEGER) AS resends,
  CAST(t[-2] AS INTEGER) AS failed_resends,
  CAST(t[-1] AS INTEGER) AS presentation_id,
  CASE WHEN contains(fn, '/')
       THEN substring(fn, 1, length(fn) - length(raw_name) - 1) ELSE '' END AS path,
  CASE WHEN regexp_extract(raw_name, '^(.+\.\w*)', 1) = '' THEN raw_name
       ELSE regexp_extract(raw_name, '^(.+\.\w*)', 1) END AS name,
  brackets[2] AS client_info,
  brackets[3] AS client_guid
FROM toks
"""
)


def q_parse_weblog(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    parsed = parse_weblog(synth_weblog(events))
    return parsed.select(
        "event_id", "client_ip_address", "datetime", "epoch", "gmt_offset",
        "method", "protocol_version", "status_code", "bytes_sent", "path",
        "name", "user_agent",
    )


PARSE_WEBLOG_SQL = (
    "WITH "
    + _WEBLOG_LINES_SQL.strip()
    + r""",
filtered AS (
  SELECT * FROM lines WHERE regexp_matches(value, '\.wma|\.wmv')
),
parsed AS (
  SELECT event_id, value,
    regexp_extract(value, '^(\S+)', 1) AS client_ip_address,
    regexp_extract_all(value, '\s(\d+)', 1) AS t,
    regexp_extract_all(value, '\[([^\]]*)\]', 1) AS brackets,
    regexp_extract(value, '"(\S+) (.*?) (\S+)" .* "-" "(.*?)"', 1) AS method,
    regexp_extract(value, '"(\S+) (.*?) (\S+)" .* "-" "(.*?)"', 2) AS fn,
    regexp_extract(value, '"(\S+) (.*?) (\S+)" .* "-" "(.*?)"', 3) AS protocol_version,
    regexp_extract(value, '"(\S+) (.*?) (\S+)" .* "-" "(.*?)"', 4) AS user_agent
  FROM filtered
),
withts AS (
  SELECT *,
    strptime(regexp_extract(brackets[1], '^(.+) -(\d+)$', 1), '%d/%b/%Y:%H:%M:%S') AS ts2,
    string_split(fn, '/')[-1] AS raw_name
  FROM parsed
)
SELECT event_id, client_ip_address,
  strftime(ts2, '%Y-%m-%d %H:%M:%S') AS datetime,
  CAST(epoch(ts2) AS BIGINT) AS epoch,
  regexp_extract(brackets[1], '^(.+) -(\d+)$', 2) AS gmt_offset,
  method, protocol_version,
  CAST(t[1] AS INTEGER) AS status_code,
  CAST(t[2] AS BIGINT) AS bytes_sent,
  CASE WHEN contains(fn, '/')
       THEN substring(fn, 1, length(fn) - length(raw_name) - 1) ELSE '' END AS path,
  CASE WHEN regexp_extract(raw_name, '^(.+\.\w*)', 1) = '' THEN raw_name
       ELSE regexp_extract(raw_name, '^(.+\.\w*)', 1) END AS name,
  user_agent
FROM withts
"""
)


def q_client_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    df = events.select("event_id", _client_info_col().alias("client_info"))
    return parse_client_info(df).select(
        "event_id", "client_info", "platform", "os_version", "client_version",
        "type", "distribution", "language", "cpu", "embedded",
    )


CLIENT_INFO_SQL = r"""
WITH src AS (
  SELECT event_id,
    CASE
      WHEN event_id % 3 = 0 THEN printf('Win_5.0_6.0.9.%d_play32_RN01_EN_586_0', event_id % 999)
      WHEN event_id % 3 = 1 THEN 'QT (qtver=6.0;os=Mac OS X)'
      ELSE ''
    END AS client_info
  FROM events
),
flags AS (
  SELECT *,
    regexp_matches(client_info, '^[A-Za-z0-9]+_') AS is_rp,
    regexp_matches(client_info, '^Q') AS is_qt,
    string_split(client_info, '_') AS p
  FROM src
)
SELECT event_id, client_info,
  CASE WHEN is_rp THEN p[1] END AS platform,
  CASE WHEN is_rp THEN p[2]
       WHEN is_qt THEN regexp_extract(client_info, '^(Q\w*)\s\(qtver=(\d.+\d);os=([A-Za-z].+)\)', 3) END AS os_version,
  CASE WHEN is_rp THEN p[3]
       WHEN is_qt THEN regexp_extract(client_info, '^(Q\w*)\s\(qtver=(\d.+\d);os=([A-Za-z].+)\)', 2) END AS client_version,
  CASE WHEN is_rp THEN p[4]
       WHEN is_qt THEN regexp_extract(client_info, '^(Q\w*)\s\(qtver=(\d.+\d);os=([A-Za-z].+)\)', 1) END AS type,
  CASE WHEN is_rp THEN p[5] END AS distribution,
  CASE WHEN is_rp THEN p[6] END AS language,
  CASE WHEN is_rp THEN p[7] END AS cpu,
  CASE WHEN is_rp THEN p[8] END AS embedded
FROM flags
"""


def q_stats_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realparse_spark.operators.parse import bracket_groups

    events = load_table(spark, sf_dir, "events")
    lines = synth_style5(events).withColumn("_brackets", bracket_groups(F.col("value")))
    ex = explode_stats_masks(lines, key_cols=("event_id",))
    return ex.select(
        "event_id", (F.col("pos") + 1).alias("bracket_idx"), "stat_type",
        "packets_received", "out_of_order", "missing", "early", "late",
        "bandwidth", "available", "highest", "lowest", "average",
        "requested", "received", "s2_late", "rebuffering", "transport",
        "startup", "audio_format", "raw_stat",
    )


STATS_EXPLODE_SQL = (
    "WITH "
    + _STYLE5_LINES_SQL.strip()
    + r""",
ex0 AS (
  SELECT event_id,
    unnest(generate_series(1, len(regexp_extract_all(value, '\[([^\]]*)\]', 1)))) AS bracket_idx,
    unnest(regexp_extract_all(value, '\[([^\]]*)\]', 1)) AS tok
  FROM lines
),
ex AS (
  SELECT * FROM ex0
  WHERE bracket_idx >= 4 AND tok NOT IN ('GET', 'UNKNOWN') AND tok <> ''
),
typed AS (
  SELECT *,
    CASE WHEN starts_with(tok, 'Stat1:') THEN 1
         WHEN starts_with(tok, 'Stat2:') THEN 2
         WHEN starts_with(tok, 'Stat3:') THEN 3
         ELSE 0 END AS stat_type
  FROM ex
)
SELECT event_id, CAST(bracket_idx AS INTEGER) AS bracket_idx, stat_type,
  CAST(nullif(regexp_extract(tok, '^Stat1:\s*(\d+)\s+(\d+)\s+(\d+)\s+(\d+)\s+(\d+)\s*(\S*)', 1), '') AS INTEGER) AS packets_received,
  CAST(nullif(regexp_extract(tok, '^Stat1:\s*(\d+)\s+(\d+)\s+(\d+)\s+(\d+)\s+(\d+)\s*(\S*)', 2), '') AS INTEGER) AS out_of_order,
  CAST(nullif(regexp_extract(tok, '^Stat1:\s*(\d+)\s+(\d+)\s+(\d+)\s+(\d+)\s+(\d+)\s*(\S*)', 3), '') AS INTEGER) AS missing,
  CAST(nullif(regexp_extract(tok, '^Stat1:\s*(\d+)\s+(\d+)\s+(\d+)\s+(\d+)\s+(\d+)\s*(\S*)', 4), '') AS INTEGER) AS early,
  CAST(nullif(regexp_extract(tok, '^Stat1:\s*(\d+)\s+(\d+)\s+(\d+)\s+(\d+)\s+(\d+)\s*(\S*)', 5), '') AS INTEGER) AS late,
  CAST(nullif(regexp_extract(tok, '^Stat2:\s*(\d+)', 1), '') AS INTEGER) AS bandwidth,
  CAST(nullif(regexp_extract(tok, '^Stat2:\s*(?:\d+\s+){1}(\d+)', 1), '') AS INTEGER) AS available,
  CAST(nullif(regexp_extract(tok, '^Stat2:\s*(?:\d+\s+){2}(\d+)', 1), '') AS INTEGER) AS highest,
  CAST(nullif(regexp_extract(tok, '^Stat2:\s*(?:\d+\s+){3}(\d+)', 1), '') AS INTEGER) AS lowest,
  CAST(nullif(regexp_extract(tok, '^Stat2:\s*(?:\d+\s+){4}(\d+)', 1), '') AS INTEGER) AS average,
  CAST(nullif(regexp_extract(tok, '^Stat2:\s*(?:\d+\s+){5}(\d+)', 1), '') AS INTEGER) AS requested,
  CAST(nullif(regexp_extract(tok, '^Stat2:\s*(?:\d+\s+){6}(\d+)', 1), '') AS INTEGER) AS received,
  CAST(nullif(regexp_extract(tok, '^Stat2:\s*(?:\d+\s+){7}(\d+)', 1), '') AS INTEGER) AS s2_late,
  CAST(nullif(regexp_extract(tok, '^Stat2:\s*(?:\d+\s+){8}(\d+[.]?\d*)', 1), '') AS DOUBLE) AS rebuffering,
  CAST(nullif(regexp_extract(tok, '^Stat2:\s*(?:\d+\s+){8}(?:\d+[.]?\d*)\s+(\d+)', 1), '') AS INTEGER) AS transport,
  CAST(nullif(regexp_extract(tok, '^Stat2:\s*(?:\d+\s+){8}(?:\d+[.]?\d*)\s+(?:\d+)\s+(\d+)', 1), '') AS INTEGER) AS startup,
  CASE WHEN stat_type = 1 THEN
         CASE WHEN regexp_extract(tok, '^Stat1:\s*(\d+)\s+(\d+)\s+(\d+)\s+(\d+)\s+(\d+)\s*(\S*)', 6) = '' THEN 'UNKNOWN'
              ELSE regexp_extract(tok, '^Stat1:\s*(\d+)\s+(\d+)\s+(\d+)\s+(\d+)\s+(\d+)\s*(\S*)', 6) END
       WHEN stat_type = 2 THEN
         CASE WHEN regexp_extract(tok, '^Stat2:\s*(?:\d+\s+){8}(?:\d+[.]?\d*)\s+(?:\d+)\s+(?:\d+)\s*(\S*)', 1) = '' THEN 'UNKNOWN'
              ELSE regexp_extract(tok, '^Stat2:\s*(?:\d+\s+){8}(?:\d+[.]?\d*)\s+(?:\d+)\s+(?:\d+)\s*(\S*)', 1) END
  END AS audio_format,
  CASE WHEN stat_type = 3 THEN tok END AS raw_stat
FROM typed
"""
)


def q_datetime_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1-C5: format a timestamp into the log grammar, re-parse, take epoch
    — grouped per year to keep the differential output compact."""
    orders = load_table(spark, sf_dir, "orders")
    clf = F.date_format("o_orderdate", "dd/MMM/yyyy:HH:mm:ss")
    reparsed = F.to_timestamp(clf, "dd/MMM/yyyy:HH:mm:ss")
    return (
        orders.select(
            F.year("o_orderdate").alias("yr"),
            F.unix_timestamp(reparsed).alias("ep"),
            F.date_format(reparsed, "yyyy-MM-dd HH:mm:ss").alias("dt"),
        )
        .groupBy("yr")
        .agg(
            F.count("ep").alias("n"),
            F.min("ep").alias("min_epoch"),
            F.max("ep").alias("max_epoch"),
            F.min("dt").alias("min_dt"),
            F.max("dt").alias("max_dt"),
        )
    )


DATETIME_ROUNDTRIP_SQL = r"""
WITH r AS (
  SELECT year(o_orderdate) AS yr,
         CAST(epoch(strptime(strftime(o_orderdate, '%d/%b/%Y:%H:%M:%S'), '%d/%b/%Y:%H:%M:%S')) AS BIGINT) AS ep,
         strftime(strptime(strftime(o_orderdate, '%d/%b/%Y:%H:%M:%S'), '%d/%b/%Y:%H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS dt
  FROM orders
)
SELECT CAST(yr AS INTEGER) AS yr, count(ep) AS n,
       min(ep) AS min_epoch, max(ep) AS max_epoch,
       min(dt) AS min_dt, max(dt) AS max_dt
FROM r GROUP BY yr
"""


def q_parse_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14 over the (space-free-filename) weblog grammar: position map for
    the combined format — ip=1, status=9, bytes=10 (1-based)."""
    from realparse_spark.operators.parse import parse_positional

    events = load_table(spark, sf_dir, "events")
    lines = synth_weblog(events)
    parsed = parse_positional(
        lines,
        fields={
            "client_ip_address": 1,
            "identuser": 2,
            "authuser": 3,
            "method": 6,
            "filename": 7,
            "status_code": 9,
            "bytes_sent": 10,
        },
    )
    return parsed.select(
        "event_id", "client_ip_address", "identuser", "authuser",
        F.regexp_replace("method", '"', "").alias("method"),
        "filename",
        F.col("status_code").cast("int").alias("status_code"),
        F.col("bytes_sent").cast("long").alias("bytes_sent"),
    )


PARSE_POSITIONAL_SQL = (
    "WITH "
    + _WEBLOG_LINES_SQL.strip()
    + r"""
SELECT event_id,
  string_split(value, ' ')[1] AS client_ip_address,
  string_split(value, ' ')[2] AS identuser,
  string_split(value, ' ')[3] AS authuser,
  replace(string_split(value, ' ')[6], '"', '') AS method,
  string_split(value, ' ')[7] AS filename,
  CAST(string_split(value, ' ')[9] AS INTEGER) AS status_code,
  CAST(string_split(value, ' ')[10] AS BIGINT) AS bytes_sent
FROM lines
"""
)


QUERIES = {
    "parse_style5": q_parse_style5,
    "parse_positional": q_parse_positional,
    "parse_weblog": q_parse_weblog,
    "client_info_parse": q_client_info,
    "stats_mask_explode": q_stats_explode,
    "datetime_roundtrip": q_datetime_roundtrip,
}

ORACLES = {
    "parse_style5": PARSE_STYLE5_SQL,
    "parse_positional": PARSE_POSITIONAL_SQL,
    "parse_weblog": PARSE_WEBLOG_SQL,
    "client_info_parse": CLIENT_INFO_SQL,
    "stats_mask_explode": STATS_EXPLODE_SQL,
    "datetime_roundtrip": DATETIME_ROUNDTRIP_SQL,
}
