"""Multimodal column plumbing (BASELINE.json north star: image/audio/video
as opaque binary columns with typed metadata).

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic fake behind an explicit flag; real path raises
NotImplementedError) — but everything Spark-side is real and tested:
binary column schema, typed metadata projection, Arrow-batched
`mapInPandas` signature/batch shape, and partition preservation.

At 100 TB: payloads live in the parquet as binary; metadata-only queries
(`multimodal_meta`) never deserialize payload bytes into Python — column
pruning keeps them JVM-side.  Only the decode/feature stage crosses into
Arrow batches, sized by `spark.sql.execution.arrow.maxRecordsPerBatch`.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from realparse_spark.sources.tables import load_table

MEDIA_TYPES = ("image/png", "audio/wav", "video/mp4")


def attach_payload(docs: DataFrame) -> DataFrame:
    """Synthesize an opaque binary payload + media_type from documents —
    the fixture stand-in for real media bytes.  Deterministic: payload =
    utf-8 bytes of the text."""
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        mt.alias("media_type"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def decode_features(
    df: DataFrame, *, deterministic_fake: bool = False
) -> DataFrame:
    """Decode/feature-extract stage as Arrow-batched `mapInPandas`.

    Real decoding needs PIL/ffmpeg (not in this container) — stubbed:
    pass ``deterministic_fake=True`` to get stable pseudo-features derived
    from the payload bytes (so the distributed plumbing is testable);
    without it this raises NotImplementedError, marking exactly where a
    real codec plugs in.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "media decode requires PIL/ffmpeg (unavailable here); "
            "pass deterministic_fake=True for the test double"
        )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415 — executor-side import

        for pdf in it:
            payload = pdf["payload"]
            n = payload.str.len().astype("int32")
            # fake "decode": dimensions and brightness derived from bytes
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n,
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n % 480 + 1).astype("int32"),
                    "mean_byte": payload.map(
                        lambda b: float(sum(b)) / max(len(b), 1)
                    ),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling *plan* (video analog): one output row per sampled
    offset, computed with posexplode over a JVM-generated offset sequence —
    the payload slicing that a real decoder would do per frame.  No Python
    in the loop; the heavy `substring(payload, off, len)` stays columnar."""
    offsets = F.sequence(
        F.lit(0),
        F.greatest(F.length("payload") - 1, F.lit(0)),
        F.lit(every_n_bytes),
    )
    return df.select(
        "doc_id", "media_type", F.posexplode(offsets).alias("frame_no", "byte_offset")
    )


# ---------------------------------------------------------------------------
# driver query: metadata-only path (exact oracle; payload never decoded)
# ---------------------------------------------------------------------------


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_payload = attach_payload(docs)
    return with_payload.groupBy("media_type").agg(
        F.count("doc_id").alias("n_assets"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.max(F.length("payload")).alias("max_bytes"),
        F.count_distinct(F.sha2("payload", 256)).alias("n_distinct_payloads"),
    )


MULTIMODAL_META_SQL = """
WITH p AS (
  SELECT doc_id,
         encode(text) AS payload,
         ['image/png', 'audio/wav', 'video/mp4'][CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type
  FROM documents
)
SELECT media_type,
       count(doc_id) AS n_assets,
       CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
       CAST(max(octet_length(payload)) AS INTEGER) AS max_bytes,
       count(DISTINCT sha256(CAST(payload AS VARCHAR))) AS n_distinct_payloads
FROM p
GROUP BY media_type
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan over the payloads: one row per sampled byte
    offset (the addressing a real frame decoder would use), all JVM-side
    sequence/posexplode — Python only ever sees the (stubbed) decode."""
    docs = load_table(spark, sf_dir, "documents")
    return frame_sample_plan(attach_payload(docs), every_n_bytes=64)


MULTIMODAL_FRAMES_SQL = """
WITH p AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         ['image/png', 'audio/wav', 'video/mp4'][CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type
  FROM documents
),
o AS (
  SELECT doc_id, media_type,
         unnest(range(0, greatest(n_bytes - 1, 0) + 1, 64)) AS byte_offset
  FROM p
)
SELECT doc_id, media_type,
  CAST(byte_offset // 64 AS INTEGER) AS frame_no,
  CAST(byte_offset AS INTEGER) AS byte_offset
FROM o
"""


QUERIES = {
    "multimodal_meta": q_multimodal_meta,
    "multimodal_frames": q_multimodal_frames,
}
ORACLES = {
    "multimodal_meta": MULTIMODAL_META_SQL,
    "multimodal_frames": MULTIMODAL_FRAMES_SQL,
}
