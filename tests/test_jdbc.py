"""JDBC option-plumbing tests (SURVEY.md §2.1 S6/S7 original form —
real_parse.pl:39 DBI connect, :96-177 per-row INSERTs).

Two layers: recorder doubles assert the option map our wrappers hand to
the public `spark.read/write.format('jdbc')` API — partition bounds
(parallel range queries, never a single-connection pull) and batchsize
(bulk inserts, not the reference's 6-9 round-trips per line) — and a
LIVE round-trip runs against embedded Apache Derby (shipped in Spark's
classpath for the Hive metastore), covering the real .save()/.load()
path end-to-end.
"""

from __future__ import annotations

import pytest

from realparse_spark.sources.jdbc import jdbc_reader, write_jdbc_append


class _Recorder:
    """Stands in for DataFrameReader/DataFrameWriter: records the
    format/mode/option calls the wrapper makes, returns self to chain."""

    def __init__(self):
        self.options: dict[str, str] = {}
        self.fmt = None
        self.saved = False
        self.write_mode = None

    def format(self, f):
        self.fmt = f
        return self

    def option(self, k, v):
        self.options[k] = v
        return self

    def mode(self, m):
        self.write_mode = m
        return self

    def save(self):
        self.saved = True


class _FakeSpark:
    def __init__(self, rec):
        self.read = rec


class _FakeDF:
    def __init__(self, rec):
        self.write = rec


def test_jdbc_reader_partitioned_options():
    rec = _Recorder()
    jdbc_reader(
        _FakeSpark(rec),
        "jdbc:mysql://db/real",
        "access",
        partition_column="access_id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
        fetch_size=5000,
        user="parser",
    )
    assert rec.fmt == "jdbc"
    assert rec.options["url"] == "jdbc:mysql://db/real"
    assert rec.options["dbtable"] == "access"
    # parallel range scan: all four partitioning options present and typed str
    assert rec.options["partitionColumn"] == "access_id"
    assert rec.options["lowerBound"] == "0"
    assert rec.options["upperBound"] == "1000000"
    assert rec.options["numPartitions"] == "16"
    assert rec.options["fetchsize"] == "5000"
    assert rec.options["user"] == "parser"  # extra options pass through


def test_jdbc_reader_unpartitioned_omits_bound_options():
    rec = _Recorder()
    jdbc_reader(_FakeSpark(rec), "jdbc:mysql://db/real", "customers")
    assert "partitionColumn" not in rec.options
    assert "lowerBound" not in rec.options


@pytest.mark.parametrize("lo,hi", [(None, 100), (0, None), (None, None)])
def test_jdbc_reader_rejects_partition_column_without_bounds(lo, hi):
    # without this guard Spark would receive the literal string 'None'
    with pytest.raises(ValueError, match="lower_bound and upper_bound"):
        jdbc_reader(
            _FakeSpark(_Recorder()),
            "jdbc:mysql://db/real",
            "access",
            partition_column="access_id",
            lower_bound=lo,
            upper_bound=hi,
        )


def test_jdbc_live_roundtrip_embedded_derby(spark, tmp_path):
    """LIVE JDBC round-trip — no recorder doubles.  Spark's own classpath
    ships Apache Derby (for the Hive metastore), so the one reference I/O
    path never exercised end-to-end (real_parse.pl:39 DBI connect) gets a
    real engine: write_jdbc_append CREATEs + bulk-appends over a real JDBC
    connection, jdbc_reader pulls it back with parallel range queries, and
    a second append proves append-mode lands on the existing table."""
    import os

    url = f"jdbc:derby:{tmp_path}/rpdb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    try:
        df = spark.range(0, 1000).selectExpr(
            "id AS access_id",
            "CAST(id % 7 AS INT) AS status_code",
            "concat('10.0.0.', CAST(id % 250 AS STRING)) AS client_ip_address",
        )
        write_jdbc_append(df, url, "access", batch_size=500, driver=driver)

        back = jdbc_reader(
            spark,
            url,
            "access",
            partition_column="access_id",
            lower_bound=0,
            upper_bound=1000,
            num_partitions=4,
            driver=driver,
        ).load()
        assert back.rdd.getNumPartitions() == 4  # parallel range scan, not 1 pull
        rows = {r.access_id: (r.status_code, r.client_ip_address) for r in back.collect()}
        assert len(rows) == 1000
        assert rows[13] == (6, "10.0.0.13")

        # append semantics: second write extends the existing table
        write_jdbc_append(df.limit(10), url, "access", batch_size=500, driver=driver)
        assert (
            jdbc_reader(spark, url, "access", driver=driver).load().count() == 1010
        )
    finally:
        # embedded Derby writes derby.log into the JVM's user.dir
        if os.path.exists("derby.log"):
            os.remove("derby.log")


def test_jdbc_write_append_batches():
    rec = _Recorder()
    write_jdbc_append(
        _FakeDF(rec), "jdbc:mysql://db/real", "access", batch_size=20_000,
        isolationLevel="READ_COMMITTED",
    )
    assert rec.saved and rec.write_mode == "append" and rec.fmt == "jdbc"
    assert rec.options["dbtable"] == "access"
    # S7 batched sink: one prepared statement per partition, batch_size
    # rows per round-trip (vs the reference's one INSERT per line)
    assert rec.options["batchsize"] == "20000"
    assert rec.options["isolationLevel"] == "READ_COMMITTED"
