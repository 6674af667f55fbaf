"""Quality gates for pipeline ops beyond oracle parity: the int8
quantizer must actually be a quantizer (bounded reconstruction error),
and the stratified sampler must reproduce a pure-Python implementation
of its hash rule."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def test_quantize_roundtrip_error_bounded(spark):
    from realparse_spark.operators.pipeline_ops import quantize_embeddings
    from realparse_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qd = quantize_embeddings(emb)
    # max |v[i] - q[i]*scale_exact| over all elements must be <= amax/254
    # (half a quantization step); use the exact scale, not the rounded
    # display column
    err = qd.select(
        F.expr(
            "array_max(zip_with(transform(embedding, x -> cast(x AS double)), q, "
            "(v, c) -> abs(v - c * (array_max(transform(embedding, x -> abs(cast(x AS double)))) / 127.0d))))"
        ).alias("e"),
        F.expr("array_max(transform(embedding, x -> abs(cast(x AS double)))) / 254.0d").alias(
            "bound"
        ),
    )
    bad = err.filter(F.col("e") > F.col("bound") + 1e-12).count()
    assert bad == 0
    # codes stay in int8 range
    rng = qd.select(F.min(F.expr("array_min(q)")).alias("lo"), F.max(F.expr("array_max(q)")).alias("hi")).first()
    assert rng.lo >= -127 and rng.hi <= 127


def test_stratified_sample_matches_python_rule(spark):
    from realparse_spark.operators.pipeline_ops import stratified_sample
    from realparse_spark.sources.tables import load_table

    rates = {"src0": 100, "src1": 0}
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    kept = {
        r.doc_id
        for r in stratified_sample(docs, rates, default_pct=30).select("doc_id").collect()
    }

    def keep(doc_id: int, source: str) -> bool:
        pct = rates.get(source, 30)
        b = int(hashlib.md5(f"sample:{doc_id}".encode()).hexdigest()[:8], 16) % 100
        return b < pct

    want = {
        r.doc_id for r in docs.select("doc_id", "source").collect() if keep(r.doc_id, r.source)
    }
    assert kept == want
