"""Driver-visible streaming lifecycle query (§2.8): oracle-relied
invariants + exactly-once behavior.  Value parity vs DuckDB is covered by
the registry-wide test_oracle_parity suite."""

from __future__ import annotations

import glob

import duckdb
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, SF_DIR_ORACLE


def test_dedup_key_unique_in_synth_corpus():
    """The stream dedups on (client_ip_address, event_ts); the oracle has no
    dedup mirror, which is sound only while (ip, second) is unique in the
    synthesized corpus.  Pin that invariant at both test scales (the key
    derives from event_id/user_id/ts arithmetic — cheap to check in DuckDB)."""
    for sf_dir in (SF_DIR, SF_DIR_ORACLE):
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
        )
        n, d = con.execute(
            """
            SELECT count(*),
                   count(DISTINCT (printf('10.%d.%d.%d', event_id % 200,
                                          (user_id * 7) % 250, 1 + (event_id % 250)),
                                   strftime(ts, '%Y-%m-%d %H:%M:%S')))
            FROM events
            """
        ).fetchone()
        con.close()
        assert n == d, f"(ip, second) not unique at {sf_dir}: {n} rows, {d} keys"


def test_stream_load_exactly_once(spark, sf_dir):
    """Both rotations land exactly once: total loaded rows == synthesized
    lines (a re-processed rotation 1 would double its share), and the temp
    tree is removed after materialization (ADVICE /tmp-leak fix)."""
    from realparse_spark.operators.streaming_query import q_stream_load_e2e
    from realparse_spark.sources.tables import load_table

    before = set(glob.glob("/tmp/realparse_stream_e2e_*"))
    out = q_stream_load_e2e(spark, sf_dir)
    total = out.agg(F.sum("n_rows")).collect()[0][0]
    n_events = load_table(spark, sf_dir, "events").count()
    assert total == n_events
    after = set(glob.glob("/tmp/realparse_stream_e2e_*"))
    assert after <= before, f"leaked temp trees: {sorted(after - before)}"
