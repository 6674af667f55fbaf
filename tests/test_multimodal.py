"""Multimodal plumbing: binary schema, Arrow mapInPandas batch shape,
stub gating, frame-sample plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realparse_spark.operators.multimodal import (
    attach_payload,
    decode_features,
    frame_sample_plan,
)
from realparse_spark.sources.tables import load_table


def test_decode_requires_explicit_fake(spark, sf_dir):
    docs = attach_payload(load_table(spark, sf_dir, "documents"))
    with pytest.raises(NotImplementedError):
        decode_features(docs)


def test_decode_fake_features(spark, sf_dir):
    docs = attach_payload(load_table(spark, sf_dir, "documents"))
    feats = decode_features(docs, deterministic_fake=True)
    assert feats.schema.simpleString() == (
        "struct<doc_id:bigint,media_type:string,n_bytes:int,width:int,"
        "height:int,mean_byte:double>"
    )
    rows = feats.collect()
    assert len(rows) == docs.count()
    r = rows[0]
    assert r.n_bytes > 0 and 1 <= r.width <= 640 and 1 <= r.height <= 480
    assert 0 < r.mean_byte < 256
    # deterministic: second run identical
    again = {x.doc_id: x.mean_byte for x in decode_features(docs, deterministic_fake=True).collect()}
    assert all(again[x.doc_id] == x.mean_byte for x in rows)


def test_payload_is_binary_and_pruned(spark, sf_dir):
    docs = attach_payload(load_table(spark, sf_dir, "documents"))
    assert dict(docs.dtypes)["payload"] == "binary"
    # metadata-only projection must not reference text/payload in the scan
    meta = docs.select("doc_id", "media_type")
    plan = meta._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan.lower() or "ReadSchema" not in plan


def test_frame_sample_plan(spark, sf_dir):
    docs = attach_payload(load_table(spark, sf_dir, "documents"))
    frames = frame_sample_plan(docs, every_n_bytes=100)
    one = frames.filter(F.col("doc_id") == 0).collect()
    assert [f.frame_no for f in one] == list(range(len(one)))
    assert all(f.byte_offset == i * 100 for i, f in enumerate(one))
