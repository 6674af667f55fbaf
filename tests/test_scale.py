"""Scale-utility tests: bucketed joins must be exchange-free; salted
aggregation must be result-identical to the direct groupBy."""

from __future__ import annotations

from pyspark.sql import functions as F

from realparse_spark.operators.scale import colocated_join, salted_groupby, write_bucketed
from realparse_spark.plans import explain as X
from realparse_spark.sources.tables import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    write_bucketed(lineitem.withColumnRenamed("l_orderkey", "k"), "b_lineitem", ["k"], 8)
    write_bucketed(orders.withColumnRenamed("o_orderkey", "k"), "b_orders", ["k"], 8)

    joined = spark.table("b_lineitem").hint("merge").join(spark.table("b_orders"), "k")
    agg = joined.groupBy("k").agg(F.count("*").alias("n"))
    try:
        plan = X.executed_plan(agg.filter(F.col("n") >= 0))
        # bucketed layout: the sort-merge join and the groupBy both reuse the
        # bucket partitioning — zero shuffle exchanges in the whole plan
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan
        assert joined.count() == lineitem.count()
        assert colocated_join(spark, "b_lineitem", "b_orders", "k").count() == lineitem.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_salted_groupby_matches_direct(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    direct = {
        (r.event_type,): (r.n, r.mx)
        for r in events.groupBy("event_type")
        .agg(F.count("value").alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        (r.event_type,): (r.n, r.mx)
        for r in salted_groupby(
            events,
            keys=["event_type"],
            aggs=[("count", "value", "n"), ("max", "value", "mx")],
            salt_n=8,
            salt_source="event_id",
        ).collect()
    }
    assert direct == salted


def _write_hot_key_fixture(spark, d):
    """Adversarial skew fixture (SURVEY §4.2's 100 TB risk made concrete):
    one join key owns 50% of the fact rows."""
    import os

    hot = spark.range(0, 100_000).select(
        F.lit(7).alias("k"),
        F.concat(F.lit("payload-payload-payload-payload-"), F.col("id").cast("string")).alias("v"),
    )
    cold = spark.range(0, 100_000).select(
        (F.col("id") % 5000 + 100).alias("k"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("v"),
    )
    hot.unionByName(cold).write.mode("overwrite").parquet(os.path.join(d, "facts"))
    spark.range(0, 6000).select(
        F.col("id").alias("k"), F.concat(F.lit("dim-"), F.col("id").cast("string")).alias("dv")
    ).write.mode("overwrite").parquet(os.path.join(d, "dim"))
    return (
        spark.read.parquet(os.path.join(d, "facts")),
        spark.read.parquet(os.path.join(d, "dim")),
    )


def test_aqe_splits_skewed_join(spark, tmp_path):
    """SURVEY §4.2 defers report-join skew on hot keys to AQE; this gate
    proves AQE actually engages on an adversarial fixture instead of
    leaving one straggler reducer with half the table.  Thresholds are
    lowered to make test-scale partitions 'big' (at 100 TB the defaults —
    256MB skew threshold — play the same role); the AQE-final plan must
    show the skew-split markers and the result must stay exact."""
    for k, v in {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
    }.items():
        spark.conf.set(k, v)
    try:
        facts, dim = _write_hot_key_fixture(spark, str(tmp_path))
        j = facts.join(dim, "k").select("k", "v", "dv")
        rows = j.collect()  # materializes THIS plan -> AQE finalizes it
        plan = X.executed_plan(j)
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, plan[:3000]
        assert "AQEShuffleRead skewed" in plan, plan[:3000]
        assert len(rows) == 200_000
        assert sum(1 for r in rows if r.k == 7) == 100_000  # hot key intact
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        ):
            spark.conf.unset(k)


def test_salted_groupby_parity_under_hot_key(spark, tmp_path):
    """Aggregation-side skew: salted_groupby must stay result-identical to
    the direct groupBy when one key holds 50% of the rows (the partial
    phase spreads that key over the salt space; the final combine merges
    it back losslessly)."""
    facts, _dim = _write_hot_key_fixture(spark, str(tmp_path))
    direct = {
        r.k: (r.n, r.mx)
        for r in facts.groupBy("k").agg(F.count("v").alias("n"), F.max("v").alias("mx")).collect()
    }
    salted = {
        r.k: (r.n, r.mx)
        for r in salted_groupby(
            facts, keys=["k"], aggs=[("count", "v", "n"), ("max", "v", "mx")], salt_n=16,
            salt_source="v",
        ).collect()
    }
    assert direct == salted
    assert direct[7][0] == 100_000


def test_salted_groupby_rejects_avg(spark, sf_dir):
    import pytest

    events = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        salted_groupby(events, ["event_type"], [("avg", "value", "a")])


def test_float_queries_invariant_under_partitioning(spark, sf_dir):
    """Bit-reproducibility across parallelism: every float-producing query
    here must hash identically when the shuffle-partition count (and so
    the partial-aggregation grouping and merge order) changes — the
    property the exact-decimal-sums-then-fixed-formula discipline exists
    to guarantee.  A failure means some float accumulates in partition
    order and would differ run-to-run on a real cluster."""
    from realparse_spark.registry import all_queries

    names = [
        "pricing_summary", "trend_slopes", "emb_centroids",
        "text_unigram_logprob", "event_zscore", "yearly_growth",
        "doc_source_mix", "q14_promo_revenue", "rfm_segments",
        "q8_market_share", "gap_fill", "rollup_merge",
    ]
    q = all_queries()

    def hashes(sp: int) -> dict[str, int]:
        spark.conf.set("spark.sql.shuffle.partitions", str(sp))
        try:
            out = {}
            for n in names:
                df = q[n](spark, sf_dir)
                out[n] = df.select(
                    F.sum(F.xxhash64(*df.columns)).alias("h")
                ).collect()[0].h
            return out
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "8")

    a, b = hashes(3), hashes(29)
    diffs = [n for n in names if a[n] != b[n]]
    assert not diffs, diffs


def test_salted_join_parity_under_hot_key(spark, tmp_path):
    """Join-side skew: salted_join must produce EXACTLY the plain join's
    multiset when one key holds 50% of the fact (the hot key's probes
    spread over the salt space; each fact row meets exactly one replica
    of its dim row).  Inner and left semantics both checked, including
    fact keys with no dim match under 'left'."""
    from realparse_spark.operators.scale import salted_join

    facts, dim = _write_hot_key_fixture(spark, str(tmp_path))
    sparse_dim = dim.filter(F.col("k") % 2 == 0)  # force unmatched fact keys

    for how in ("inner", "left"):
        plain = (
            facts.join(sparse_dim, facts.k == sparse_dim.k, how)
            .groupBy(facts.k)
            .agg(F.count(F.lit(1)).alias("n"), F.count("dv").alias("n_matched"))
        )
        salted = (
            salted_join(facts, sparse_dim, "k", "k", salt_n=8, how=how)
            .groupBy(facts.k)
            .agg(F.count(F.lit(1)).alias("n"), F.count("dv").alias("n_matched"))
        )
        p = {r[0]: (r.n, r.n_matched) for r in plain.collect()}
        s = {r[0]: (r.n, r.n_matched) for r in salted.collect()}
        assert p == s, how
    # hot key survives with full multiplicity (k=7 is odd -> dim-filtered,
    # so check it under left where it must appear unmatched)
    assert s[7] == (100_000, 0)


def test_salted_join_rejects_dim_preserving_modes(spark, sf_dir):
    """right/full outer would emit salt_n null-extended duplicates for
    every unmatched dim row (the dim side is replicated) — must be
    rejected, not silently wrong."""
    import pytest

    from realparse_spark.operators.scale import salted_join

    facts = load_table(spark, sf_dir, "lineitem")
    dim = load_table(spark, sf_dir, "part")
    for how in ("right", "full", "outer", "cross"):
        with pytest.raises(ValueError, match="fact-preserving"):
            salted_join(facts, dim, "l_partkey", "p_partkey", how=how)


def test_bloom_no_false_negatives(spark, sf_dir):
    """Every build-side key must pass the probe filter — the Bloom
    guarantee the exact-parity oracle relies on."""
    from realparse_spark.operators.scale import bloom_build, bloom_prune

    orders = load_table(spark, sf_dir, "orders")
    dim = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    dense, m_bits = bloom_build(dim, "o_orderkey")
    # probe the build side against its own bitmap: zero rows may drop
    kept = bloom_prune(dim, "o_orderkey", dense, m_bits).count()
    assert kept == dim.count()


def test_bloom_prune_join_parity_and_effectiveness(spark, sf_dir):
    """The pruned join equals the plain join row-for-row, and the bloom
    actually prunes (kept well under the full fact, at most matched rows
    plus a small false-positive tail)."""
    from realparse_spark.operators.scale import bloom_build, bloom_prune, bloom_prune_join

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    got = (
        bloom_prune_join(li, orders.select("o_orderkey"), "l_orderkey", "o_orderkey")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    dense, m_bits = bloom_build(orders.select("o_orderkey"), "o_orderkey")
    kept = bloom_prune(li, "l_orderkey", dense, m_bits).count()
    matched = li.join(orders, li.l_orderkey == orders.o_orderkey, "left_semi").count()
    total = li.count()
    assert matched <= kept <= matched + max(50, total // 100), (kept, matched, total)


def test_bloom_prune_join_plan_is_scan_local_filter(spark, sf_dir):
    """The bitmap rides a 1-row broadcast (BroadcastNestedLoopJoin, never
    CartesianProduct) and the real join stays an equi-join."""
    from realparse_spark.operators.scale import q_bloom_prune_join

    plan = X.executed_plan(q_bloom_prune_join(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)
