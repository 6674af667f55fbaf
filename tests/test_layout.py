"""Z-order layout tests: Morton-key bit arithmetic against hand-computed
values, and the data-skipping property the layout exists for — a 2-D box
predicate must touch far fewer files under Z clustering than under a
single-dimension sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from realparse_spark.operators.layout import cluster_by_zorder, zorder_key
from realparse_spark.plans import explain as X


def test_zorder_key_hand_bits(spark):
    # x=0b101, y=0b011 -> interleave (x owns even positions):
    # pos0=x0=1 pos1=y0=1 pos2=x1=0 pos3=y1=1 pos4=x2=1 pos5=y2=0 -> 0b011011
    df = spark.createDataFrame([(5, 3)], ["x", "y"])
    (r,) = df.select(zorder_key(["x", "y"], bits=3).alias("z")).collect()
    assert r["z"] == 0b011011 == 27
    # origin maps to zero; max corner maps to all ones
    df2 = spark.createDataFrame([(0, 0), (7, 7)], ["x", "y"])
    zs = sorted(
        r["z"] for r in df2.select(zorder_key(["x", "y"], bits=3).alias("z")).collect()
    )
    assert zs == [0, 63]


def test_zorder_key_matches_python_reference(spark):
    import random

    def ref(x: int, y: int, bits: int) -> int:
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    rng = random.Random(11)
    bits = 10
    rows = [(rng.randrange(1 << bits), rng.randrange(1 << bits)) for _ in range(64)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = [
        (r["x"], r["y"], r["z"])
        for r in df.select("x", "y", zorder_key(["x", "y"], bits=bits).alias("z")).collect()
    ]
    for x, y, z in got:
        assert z == ref(x, y, bits), (x, y)


def test_zorder_locality_beats_linear_sort(spark, tmp_path):
    # deterministic 64x64 grid
    grid = (
        spark.range(64 * 64)
        .select(
            (F.col("id") % 64).cast("bigint").alias("x"),
            (F.col("id") / 64).cast("bigint").alias("y"),
        )
    )
    z = zorder_key(["x", "y"], bits=6)
    zdir = str(tmp_path / "zclustered")
    xdir = str(tmp_path / "xsorted")
    cluster_by_zorder(grid, z, n_files=16).write.parquet(zdir)
    grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(xdir)

    box = "x < 16 AND y < 16"  # one Morton quadrant, 1/16 of the space

    def files_touched(path: str) -> int:
        return (
            spark.read.parquet(path)
            .filter(box)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    zf, xf = files_touched(zdir), files_touched(xdir)
    # Z layout: the box is one contiguous key range -> ~1 file (allow
    # boundary slop from repartitionByRange's sampled range bounds).
    # x-sorted layout: the box spans every file holding x<16 -> >=4.
    assert zf <= 2, (zf, xf)
    assert xf >= 4, (zf, xf)
    assert zf < xf


def test_compact_with_zorder_recluster(spark, tmp_path):
    from realparse_spark.operators.compact import compact_table, table_file_stats

    grid = (
        spark.range(64 * 64)
        .select(
            (F.col("id") % 64).cast("bigint").alias("x"),
            (F.col("id") / 64).cast("bigint").alias("y"),
        )
    )
    path = str(tmp_path / "frag")
    # fragment: 64 tiny row-ordered files
    grid.repartition(64).write.parquet(path)
    before_files, total = table_file_stats(spark, path)
    assert before_files == 64
    # compact to ~16 files, re-clustered on (x, y)
    target = max(1, total // 16)
    b, a = compact_table(spark, path, target_file_bytes=target, zorder_cols=["x", "y"])
    assert b == 64 and 8 <= a <= 24
    out = spark.read.parquet(path)
    # row-preserving
    assert out.count() == 64 * 64
    # locality restored: the box lives in a few files, not all of them
    touched = (
        out.filter("x < 16 AND y < 16")
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert touched <= max(3, a // 4), (touched, a)


def test_compact_zorder_rejects_partitioned(spark, tmp_path):
    import pytest

    from realparse_spark.operators.compact import compact_table

    with pytest.raises(ValueError):
        compact_table(
            spark, str(tmp_path / "x"), partition_by=["p"], zorder_cols=["x"]
        )


def test_zorder_query_jvm_side(spark, sf_dir):
    from realparse_spark.registry import all_queries

    df = all_queries()["zorder_key"](spark, sf_dir)
    assert X.python_eval_nodes(df) == 0
    assert "CartesianProduct" not in X.executed_plan(df)
