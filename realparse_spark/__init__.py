"""realparse_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of jfollansbee/RealParse.

The reference (/root/reference, 4 Perl scripts) is a log-analytics pipeline:
parse RealServer/Caudium access logs -> star schema -> per-customer aggregate
reports.  This package re-expresses that capability Spark-first:

- ``sources``    : table + log-directory readers (SURVEY.md §2.1 S1-S6)
- ``operators``  : parse, load, report, dedup, similarity, text ops (§2.2-2.5)
- ``functions``  : scalar/column expression builders (§2.7)
- ``streaming``  : Structured Streaming incremental pipeline (§2.8)
- ``plans``      : plan-inspection helpers (explain/pushdown checks)

Everything is built on the public PySpark DataFrame/SQL API; logic stays
JVM-side (no row-at-a-time Python UDFs in hot paths) so plans survive a
100 TB / 1000-executor scale-up.
"""

__version__ = "0.1.0"
