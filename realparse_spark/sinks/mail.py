"""Email sink (SURVEY.md §2.1 S9) — the reference's commented-out
sendmail pipe, rebuilt Spark-first as compose (distributed, oracled) +
deliver (pluggable transport).

Reference: ``pull_report.pl:71-79`` (the disabled ``|/usr/sbin/sendmail
-t`` pipe with To/Subject/activity body), ``pull_report.pl:34-64`` (the
per-customer report loop whose printed sections ARE the mail body the
script was built to send — "Creates reports for emailing to hosting
customers", ``pull_report.pl:3``), ``real_parse.pl:197-205`` /
``web_parse.pl:150-158`` (the same pipe in the loaders).

Spark shape: message COMPOSITION is a DataFrame query — one row per
hosting customer, body built with ``format_string`` + a sorted
``array_join`` aggregation, every line mirrored in the DuckDB oracle
(headers, the Perl ``$year."/".$month."/".$day`` unpadded date, the
``formatTime`` durations, the ``Unknown``/``N\\A`` short-circuits).
DELIVERY is a sink seam: ``deliver_mbox`` appends RFC-4155 mbox text via
the distributed text writer (one part per partition — no driver
collect), and ``smtp_transport`` is the clearly-marked stub for the
network hop this container cannot make.

Scale: the compose plan is the flagship report's plan (fact scan,
broadcast dims, one groupBy) plus an O(customers) body aggregation whose
group size is bounded by the flag alphabet; the mbox write is
embarrassingly parallel.  At 100 TB nothing here adds a shuffle beyond
the report itself.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realparse_spark.functions.scalars import duration_hms
from realparse_spark.sources.tables import load_table

MAIL_SUBJECT = "RealServer Log Parser Activity"


def compose_customer_mail(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame
) -> DataFrame:
    """One (to_addr, subject, n_sections, body) row per hosting customer
    with activity — the mail ``pull_report.pl`` prints section-by-section
    and the disabled sendmail block would have piped.

    Body = the activity header (``Logging style is`` / ``Today is`` /
    ``This RealServer log file was parsed:``, real_parse.pl:201-203) over
    the corpus's "today" (max order date — deterministic, no wall clock),
    then one ``File: / Count: / Clip Length: / Avg View: / Longest
    View:`` section per returnflag (pull_report.pl:53-57), durations via
    ``formatTime`` (C11) and the ``.wmv/.wma/.mov`` short-circuits mapped
    to the 'R' flag exactly as customer_report maps the rest of the F5-F12
    predicate family."""
    cust = customer.filter(F.col("c_mktsegment") == "BUILDING")  # F10 hosting='Yes'
    fact = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(~F.col("o_orderpriority").like("1-%"))  # F5 internal-IP exclusion
        .filter(F.col("l_quantity") != 0)  # F7
        .filter(F.col("l_discount") <= F.col("l_tax"))  # F8
    )
    sec = fact.groupBy("c_custkey", "c_name", "l_returnflag").agg(
        F.count("l_partkey").alias("n_views"),
        F.floor(F.max("l_quantity") * 100).alias("_clip_sec"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / F.count("l_extendedprice"),
            0,
        )
        .cast("long")
        .alias("_avg_sec"),
        F.floor(F.max("l_extendedprice")).alias("_long_sec"),
    )
    na = F.col("l_returnflag") == "R"  # .wmv/.wma/.mov analog
    line = F.format_string(
        "File: %s\n\tCount:\t%d\n\tClip Length:\t%s\n\tAvg View:\t%s\n\tLongest View:\t%s",
        F.col("l_returnflag"),
        F.col("n_views"),
        F.when(na, F.lit("Unknown")).otherwise(duration_hms(F.col("_clip_sec"))),
        F.when(na, F.lit("N\\A")).otherwise(duration_hms(F.col("_avg_sec"))),
        F.when(na, F.lit("N\\A")).otherwise(duration_hms(F.col("_long_sec"))),
    )
    per_cust = sec.groupBy("c_custkey", "c_name").agg(
        F.count(F.lit(1)).alias("n_sections"),
        F.array_join(F.array_sort(F.collect_list(line)), "\n").alias("_sections"),
    )
    # the corpus's "today": max order date — a 1-row broadcast, no collect
    today = orders.agg(F.max(F.to_date("o_orderdate")).alias("_d"))
    header = F.format_string(
        "Logging style is 5.\nToday is %d/%d/%d.\n"
        "This RealServer log file was parsed: rmaccess.log.%s.\n",
        F.year("_d"),
        F.month("_d"),
        F.dayofmonth("_d"),
        F.date_format("_d", "yyyyMMdd"),
    )
    to_addr = F.concat(
        F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("."))),
        F.lit("@example.com"),
    )
    return (
        per_cust.crossJoin(F.broadcast(today))
        .select(
            F.col("c_custkey").alias("custkey"),
            to_addr.alias("to_addr"),
            F.lit(MAIL_SUBJECT).alias("subject"),
            "n_sections",
            F.concat(header, F.lit("\n"), F.col("_sections")).alias("body"),
        )
        .orderBy("custkey")
    )


def q_report_mail(spark: SparkSession, sf_dir: str) -> DataFrame:
    return compose_customer_mail(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


REPORT_MAIL_SQL = r"""
WITH sec AS (
  SELECT c_custkey, c_name, l_returnflag,
    count(l_partkey) AS n_views,
    CAST(floor(max(l_quantity) * 100) AS BIGINT) AS clip_sec,
    CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / count(l_extendedprice), 0) AS BIGINT) AS avg_sec,
    CAST(floor(max(l_extendedprice)) AS BIGINT) AS long_sec
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderpriority NOT LIKE '1-%'
    AND l_quantity <> 0
    AND l_discount <= l_tax
  GROUP BY c_custkey, c_name, l_returnflag
),
fmt AS (
  SELECT c_custkey, c_name,
    printf('File: %s' || chr(10) || chr(9) || 'Count:' || chr(9) || '%d'
           || chr(10) || chr(9) || 'Clip Length:' || chr(9) || '%s'
           || chr(10) || chr(9) || 'Avg View:' || chr(9) || '%s'
           || chr(10) || chr(9) || 'Longest View:' || chr(9) || '%s',
      l_returnflag, n_views,
      CASE WHEN l_returnflag = 'R' THEN 'Unknown'
           WHEN clip_sec >= 3600 THEN printf('%d:%02d:%02d', clip_sec // 3600, (clip_sec % 3600) // 60, clip_sec % 60)
           ELSE printf('%d:%02d', clip_sec // 60, clip_sec % 60) END,
      CASE WHEN l_returnflag = 'R' THEN 'N\A'
           WHEN avg_sec >= 3600 THEN printf('%d:%02d:%02d', avg_sec // 3600, (avg_sec % 3600) // 60, avg_sec % 60)
           ELSE printf('%d:%02d', avg_sec // 60, avg_sec % 60) END,
      CASE WHEN l_returnflag = 'R' THEN 'N\A'
           WHEN long_sec >= 3600 THEN printf('%d:%02d:%02d', long_sec // 3600, (long_sec % 3600) // 60, long_sec % 60)
           ELSE printf('%d:%02d', long_sec // 60, long_sec % 60) END
    ) AS line
  FROM sec
),
per_cust AS (
  SELECT c_custkey, c_name,
    CAST(count(*) AS BIGINT) AS n_sections,
    string_agg(line, chr(10) ORDER BY line) AS sections
  FROM fmt GROUP BY c_custkey, c_name
),
today AS (SELECT max(CAST(o_orderdate AS DATE)) AS d FROM orders)
SELECT c_custkey AS custkey,
  lower(replace(c_name, '#', '.')) || '@example.com' AS to_addr,
  'RealServer Log Parser Activity' AS subject,
  n_sections,
  printf('Logging style is 5.' || chr(10) || 'Today is %d/%d/%d.' || chr(10)
         || 'This RealServer log file was parsed: rmaccess.log.%s.' || chr(10),
         year(d), month(d), day(d), strftime(d, '%Y%m%d'))
    || chr(10) || sections AS body
FROM per_cust CROSS JOIN today
ORDER BY custkey
"""


# ---------------------------------------------------------------------------
# delivery transports
# ---------------------------------------------------------------------------

def deliver_mbox(messages: DataFrame, out_dir: str) -> str:
    """Write composed messages as RFC-4155 mbox text parts under
    ``out_dir`` — the production-shaped delivery: the distributed text
    writer emits one mbox fragment per partition (concatenable, as mbox
    is by construction), so a million-customer send never funnels
    through the driver.  '>From ' quoting applies to body lines that
    would otherwise read as message separators.  Returns ``out_dir``."""
    mbox = messages.select(
        F.concat(
            F.lit("From MAILER-DAEMON Thu Jan  1 00:00:00 1970\n"),
            F.format_string("To: %s\n", "to_addr"),
            F.format_string("Subject: %s\n\n", "subject"),
            F.regexp_replace("body", r"(?m)^From ", ">From "),
            F.lit("\n"),
        ).alias("value")
    )
    mbox.write.mode("overwrite").text(out_dir)
    return out_dir


def smtp_transport(messages: DataFrame, host: str, port: int = 25) -> None:
    """STUB — the reference's own sendmail pipe is commented out
    (pull_report.pl:71-79) and this container has no SMTP egress.  The
    production shape would be ``messages.foreachPartition`` opening one
    smtplib connection per partition; compose stays identical."""
    raise NotImplementedError(
        "SMTP delivery is stubbed (no network egress here; the reference's "
        "sendmail pipe is likewise disabled) — use deliver_mbox, which "
        "exercises the same composed messages through a real sink"
    )


QUERIES = {
    "report_mail": q_report_mail,
}

ORACLES = {
    "report_mail": REPORT_MAIL_SQL,
}
