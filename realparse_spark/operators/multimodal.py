"""Multimodal column plumbing (BASELINE.json north star: image/audio/video
as opaque binary columns with typed metadata).

Codec-free formats get REAL decoders (PPM/BMP headers, PNG via stdlib
zlib inflate + unfilter, WAV RIFF walk, Y4M frame walk).  Only the
genuinely codec-bound formats (JPEG/MP4) are stubbed (deterministic fake
behind an explicit flag; real path raises NotImplementedError) — and for
those too, everything Spark-side is real and tested:
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

from realparse_spark.sources.tables import fan_out, load_table

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


# ---------------------------------------------------------------------------
# Real decode path: codec-free formats (binary PPM "P6", uncompressed 24bpp
# BMP).  These need no external library — the header grammar is public and
# trivial — so unlike `decode_features` (which marks where PIL/ffmpeg would
# plug in) this path genuinely parses bytes it did not write.
# ---------------------------------------------------------------------------

PPM_TYPE = "image/x-portable-pixmap"
BMP_TYPE = "image/bmp"


def _ppm_bytes(doc_id: int, width: int, height: int) -> bytes:
    n = width * height * 3
    px = bytes((doc_id * 31 + i * 7) % 256 for i in range(n))
    return b"P6\n# synthetic\n%d %d\n255\n" % (width, height) + px


def _bmp_bytes(doc_id: int, width: int, height: int) -> bytes:
    import struct  # noqa: PLC0415 — executor-side import

    n = width * height * 3  # width is a multiple of 4 → no row padding
    px = bytes((doc_id * 31 + i * 7) % 256 for i in range(n))
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + n, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, n, 2835, 2835, 0, 0
    )
    return header + info + px


def synthesize_images(docs: DataFrame) -> DataFrame:
    """Build REAL image files (PPM for even doc_id, BMP for odd) with
    deterministic dimensions and pixel bytes: width = 12 + 4*(doc_id%5)
    (multiple of 4 → padding-free BMP rows), height = 8 + 2*(doc_id%4),
    pixel[i] = (doc_id*31 + i*7) % 256.  This is the fixture *generator*
    (per-doc Python, Arrow-batched) — at scale the payloads already live in
    parquet and only `decode_image` runs."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(it: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415 — executor-side import

        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            payloads = [
                _ppm_bytes(d, 12 + 4 * (d % 5), 8 + 2 * (d % 4))
                if d % 2 == 0
                else _bmp_bytes(d, 12 + 4 * (d % 5), 8 + 2 * (d % 4))
                for d in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(gen, schema)


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixel_sum", T.LongType()),
    ]
)


def _decode_ppm(payload: bytes) -> tuple[int, int, int]:
    """Parse a binary-PPM header (magic, comment-aware token scan) and sum
    the pixel plane.  Raises ValueError on malformed input."""
    import numpy as np  # noqa: PLC0415 — executor-side import

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    toks: list[int] = []
    pos = 2
    while len(toks) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end-of-line
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(payload) and not payload[end : end + 1].isspace():
            end += 1
        toks.append(int(payload[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval, then raster
    width, height, maxval = toks
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    n = width * height * 3
    px = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return width, height, int(px.astype(np.int64).sum())


def _decode_bmp(payload: bytes) -> tuple[int, int, int]:
    """Parse BITMAPFILEHEADER + BITMAPINFOHEADER (uncompressed 24bpp) and
    sum the pixel rows, honoring the 4-byte row stride."""
    import struct  # noqa: PLC0415 — executor-side import

    import numpy as np  # noqa: PLC0415 — executor-side import

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bitcount,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bitcount != 24 or compression != 0:
        raise ValueError("only uncompressed 24bpp supported")
    stride = (width * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * abs(height), offset=pix_off
    ).reshape(abs(height), stride)[:, : width * 3]
    return width, abs(height), int(rows.astype(np.int64).sum())


def decode_image(df: DataFrame) -> DataFrame:
    """REAL decode stage (Arrow-batched `mapInPandas`): sniff the magic,
    parse the format's own header for dimensions and raster offset, and
    reduce the pixel plane to exact-integer stats.  This is the shape a
    PIL/ffmpeg-backed decoder drops into (cf. `decode_features` for the
    codec-bound formats); batch size governed by
    `spark.sql.execution.arrow.maxRecordsPerBatch`."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415 — executor-side import

        for pdf in it:
            out = {
                "doc_id": [],
                "media_type": [],
                "width": [],
                "height": [],
                "pixel_sum": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:2] == b"P6":
                    mt, (w, h, s) = PPM_TYPE, _decode_ppm(b)
                elif b[:2] == b"BM":
                    mt, (w, h, s) = BMP_TYPE, _decode_bmp(b)
                elif b[:8] == _PNG_SIG:
                    mt, (w, h, s) = PNG_TYPE, _decode_png(b)
                else:
                    raise ValueError(f"unknown magic {b[:2]!r}")
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mt)
                out["width"].append(w)
                out["height"].append(h)
                out["pixel_sum"].append(s)
            yield pd.DataFrame(out).astype(
                {"width": "int32", "height": "int32", "pixel_sum": "int64"}
            )

    return df.mapInPandas(batches, DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# PNG: fully decodable with the stdlib alone (zlib inflate + per-row
# unfilter) — so unlike JPEG/MP4 (genuinely codec-bound, still behind
# `decode_features`' explicit stub) PNG gets the REAL treatment.
# ---------------------------------------------------------------------------

PNG_TYPE = "image/png"
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth_vec(a, b, c):
    """RFC 2083 §6.6 predictor (public spec), vectorized over numpy int
    arrays; returns the per-lane predictor as uint8."""
    import numpy as np  # noqa: PLC0415 — executor-side import

    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    ).astype(np.uint8)


def _png_bytes(doc_id: int, width: int, height: int) -> bytes:
    """A REAL PNG file (stdlib zlib only): 8-bit RGB non-interlaced, one
    IDAT, genuine chunk CRCs, and row filters CYCLING through all five
    types (None/Sub/Up/Average/Paeth) so the decoder's every unfilter
    path is exercised.  Pixel bytes use the same generator arithmetic as
    PPM/BMP: byte i = (doc_id*31 + i*7) % 256 in image order.

    The filter pass is whole-row numpy (uint8 wraparound IS the RFC's
    mod-256): encoding filters read only RAW neighbor bytes, so unlike
    the decoder there is no sequential dependency anywhere."""
    import struct  # noqa: PLC0415 — executor-side import
    import zlib  # noqa: PLC0415 — executor-side import

    import numpy as np  # noqa: PLC0415 — executor-side import

    bpp, rb = 3, width * 3
    raw = (
        (doc_id * 31 + np.arange(rb * height, dtype=np.int64) * 7) % 256
    ).astype(np.uint8).reshape(height, rb)
    zero = np.zeros(bpp, dtype=np.uint8)
    lines = bytearray()
    for r in range(height):
        row = raw[r]
        prev = raw[r - 1] if r else np.zeros(rb, dtype=np.uint8)
        a = np.concatenate([zero, row[:-bpp]])
        c = np.concatenate([zero, prev[:-bpp]])
        ft = r % 5
        if ft == 0:
            out = row
        elif ft == 1:
            out = row - a
        elif ft == 2:
            out = row - prev
        elif ft == 3:
            out = row - (
                (a.astype(np.uint16) + prev.astype(np.uint16)) // 2
            ).astype(np.uint8)
        else:
            out = row - _paeth_vec(
                a.astype(np.int16), prev.astype(np.int16), c.astype(np.int16)
            )
        lines.append(ft)
        lines += out.tobytes()

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> tuple[int, int, int]:
    """Walk the chunk stream (VERIFYING every CRC), inflate the
    concatenated IDAT with stdlib zlib, invert the per-row filter (all
    five RFC 2083 types), and sum the RGB plane.  Raises ValueError on
    any malformed byte — a flipped bit fails the CRC before it can skew a
    pixel sum."""
    import struct  # noqa: PLC0415 — executor-side import
    import zlib  # noqa: PLC0415 — executor-side import

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h = 8, None, None
    idat = bytearray()
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + ln > len(payload):
            # declared chunk length runs past EOF — raise the documented
            # signal, not struct.error from the CRC unpack below
            raise ValueError("truncated chunk")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, ctype, comp, filt, ilace) != (8, 2, 0, 0, 0):
                raise ValueError("only 8-bit RGB non-interlaced supported")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("missing IHDR")
    try:
        stream = zlib.decompress(bytes(idat))
    except zlib.error as ex:
        raise ValueError(f"corrupt IDAT stream: {ex}") from ex
    import numpy as np  # noqa: PLC0415 — executor-side import

    bpp, rb = 3, w * 3
    if len(stream) != h * (rb + 1):
        raise ValueError("raster length mismatch")
    # unfilter in numpy (uint8 wraparound IS the RFC's mod-256 add):
    # None/Up are whole-row ops, Sub is a strided cumulative sum, and
    # only Average/Paeth — whose predictor reads the RECONSTRUCTED left
    # pixel — need a per-pixel scan, vectorized across the 3 channels.
    arr = np.frombuffer(stream, dtype=np.uint8).reshape(h, rb + 1)
    fts, rows = arr[:, 0], arr[:, 1:].copy()
    prev = np.zeros(rb, dtype=np.uint8)
    for r in range(h):
        ft, row = int(fts[r]), rows[r]
        if ft == 0:
            pass
        elif ft == 1:
            for o in range(bpp):
                np.add.accumulate(row[o::bpp], dtype=np.uint8, out=row[o::bpp])
        elif ft == 2:
            row += prev
        elif ft == 3:
            row[:bpp] += prev[:bpp] // 2
            for x in range(bpp, rb, bpp):
                row[x : x + bpp] += (
                    (
                        row[x - bpp : x].astype(np.uint16)
                        + prev[x : x + bpp].astype(np.uint16)
                    )
                    // 2
                ).astype(np.uint8)
        elif ft == 4:
            # first pixel: a = c = 0 -> predictor is b
            row[:bpp] += prev[:bpp]
            for x in range(bpp, rb, bpp):
                row[x : x + bpp] += _paeth_vec(
                    row[x - bpp : x].astype(np.int16),
                    prev[x : x + bpp].astype(np.int16),
                    prev[x - bpp : x].astype(np.int16),
                )
        else:
            raise ValueError(f"unknown filter type {ft}")
        prev = row
    return w, h, int(rows.astype(np.uint64).sum())


def synthesize_images_png(docs: DataFrame) -> DataFrame:
    """Real PNG files per doc: width = 5 + doc_id%7, height = 4 +
    doc_id%5, generator byte i = (doc_id*31 + i*7) % 256 (image order —
    the filter/deflate layers are what the decoder must strip away)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(it: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415 — executor-side import

        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [
                        _png_bytes(d, 5 + d % 7, 4 + d % 5) for d in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, schema)


WAV_TYPE = "audio/wav"


def _wav_bytes(doc_id: int, n_samples: int, sample_rate: int) -> bytes:
    """A REAL RIFF/WAVE file: PCM 16-bit mono, deterministic samples
    sample[i] = ((doc_id*131 + i*17) % 4096) - 2048.  Odd doc_ids carry an
    extra LIST chunk between fmt and data, so a decoder that assumes a
    fixed 44-byte layout (instead of walking chunks) breaks."""
    import struct  # noqa: PLC0415 — executor-side import

    import numpy as np  # noqa: PLC0415 — executor-side import

    i = np.arange(n_samples, dtype=np.int64)
    pcm = ((doc_id * 131 + i * 17) % 4096 - 2048).astype("<i2").tobytes()
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    extra = b""
    if doc_id % 2 == 1:
        info = b"INFOISFT" + struct.pack("<I", 6) + b"synth\x00"
        extra = b"LIST" + struct.pack("<I", len(info)) + info
    data = b"data" + struct.pack("<I", len(pcm)) + pcm
    body = b"WAVE" + fmt + extra + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synthesize_audio(docs: DataFrame) -> DataFrame:
    """Fixture generator for the audio path (cf. `synthesize_images`):
    n_samples = 256 + 32*(doc_id%8), sample_rate = 8000 + 1000*(doc_id%3)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(it: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415 — executor-side import

        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            payloads = [
                _wav_bytes(d, 256 + 32 * (d % 8), 8000 + 1000 * (d % 3))
                for d in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(gen, schema)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("abs_sum", T.LongType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def _decode_wav(payload: bytes) -> tuple[int, int, int, int]:
    """Parse RIFF/WAVE by WALKING the chunk list (honoring sizes and odd-
    size padding) — never a fixed 44-byte offset.  PCM 16-bit mono only.
    Returns (sample_rate, n_samples, abs_sum, peak); ValueError on
    malformed or unsupported input."""
    import struct  # noqa: PLC0415 — executor-side import

    import numpy as np  # noqa: PLC0415 — executor-side import

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, end = 12, 8 + struct.unpack_from("<I", payload, 4)[0]
    rate = None
    pcm = None
    while pos + 8 <= min(end, len(payload)):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt_tag != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM 16-bit mono supported")
        elif cid == b"data":
            pcm = np.frombuffer(body, dtype="<i2")
        pos += 8 + sz + (sz & 1)  # odd chunk sizes are padded
    if rate is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    wide = pcm.astype(np.int64)
    a = np.abs(wide)
    return int(rate), int(pcm.size), int(a.sum()), int(a.max(initial=0))


def decode_audio(df: DataFrame) -> DataFrame:
    """REAL audio decode stage (Arrow-batched `mapInPandas`), the WAV/PCM
    sibling of `decode_image` — amplitude stats as exact integers so the
    oracle can recompute them arithmetically."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415 — executor-side import

        for pdf in it:
            out = {
                "doc_id": [],
                "media_type": [],
                "sample_rate": [],
                "n_samples": [],
                "abs_sum": [],
                "peak": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, n, s, p = _decode_wav(bytes(payload))
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(WAV_TYPE)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["abs_sum"].append(s)
                out["peak"].append(p)
            yield pd.DataFrame(out).astype(
                {
                    "sample_rate": "int32",
                    "n_samples": "int32",
                    "abs_sum": "int64",
                    "peak": "int32",
                }
            )

    return df.mapInPandas(batches, AUDIO_SCHEMA)


RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("src_rate", T.IntegerType()),
        T.StructField("dst_rate", T.IntegerType()),
        T.StructField("n_out", T.IntegerType()),
        T.StructField("abs_sum", T.LongType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def resample_audio(df: DataFrame, factor: int = 4) -> DataFrame:
    """REAL audio resample stage (decimation by an integer factor): walk
    the RIFF chunks, take every `factor`-th PCM sample, and reduce the
    decimated stream to exact-integer amplitude stats.  Nearest-neighbor
    decimation (no anti-alias filter) keeps every output sample an exact
    input sample, so the oracle recomputes the picked indices
    arithmetically — the audio sibling of `resize_image`'s gather.
    Arrow-batched `mapInPandas`; the payload never leaves its row."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np  # noqa: PLC0415 — executor-side import
        import pandas as pd  # noqa: PLC0415 — executor-side import

        for pdf in it:
            out = {
                "doc_id": [], "media_type": [], "src_rate": [], "dst_rate": [],
                "n_out": [], "abs_sum": [], "peak": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, _n, _s, _p = _decode_wav(bytes(payload))
                # re-walk for the raw samples (shared chunk walker)
                import struct  # noqa: PLC0415 — executor-side import

                b = bytes(payload)
                pos, end = 12, 8 + struct.unpack_from("<I", b, 4)[0]
                pcm = None
                while pos + 8 <= min(end, len(b)):
                    cid = b[pos : pos + 4]
                    (sz,) = struct.unpack_from("<I", b, pos + 4)
                    if cid == b"data":
                        pcm = np.frombuffer(b[pos + 8 : pos + 8 + sz], dtype="<i2")
                    pos += 8 + sz + (sz & 1)
                dec = pcm[::factor].astype(np.int64)
                a = np.abs(dec)
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(WAV_TYPE)
                out["src_rate"].append(rate)
                out["dst_rate"].append(rate // factor)
                out["n_out"].append(int(dec.size))
                out["abs_sum"].append(int(a.sum()))
                out["peak"].append(int(a.max(initial=0)))
            yield pd.DataFrame(out).astype(
                {"src_rate": "int32", "dst_rate": "int32", "n_out": "int32",
                 "abs_sum": "int64", "peak": "int32"}
            )

    return df.mapInPandas(batches, RESAMPLE_SCHEMA)


Y4M_TYPE = "video/x-yuv4mpeg"


def _y4m_bytes(doc_id: int, width: int, height: int, n_frames: int) -> bytes:
    """A REAL YUV4MPEG2 stream (the codec-free video container mpv/ffmpeg
    emit): plain-text stream header, then per frame a FRAME marker and raw
    C420 planes (Y then quarter-size U and V).  Luma byte f,i is
    (doc_id*37 + f*11 + i*5) % 256; chroma is a different function so a
    decoder that mis-skips planes produces wrong luma sums."""
    import numpy as np  # noqa: PLC0415 — executor-side import

    header = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg\n" % (width, height)
    ny, nc = width * height, (width // 2) * (height // 2)
    parts = [header]
    for f in range(n_frames):
        iy = np.arange(ny, dtype=np.int64)
        y = ((doc_id * 37 + f * 11 + iy * 5) % 256).astype(np.uint8)
        ic = np.arange(nc, dtype=np.int64)
        c = ((doc_id * 13 + f * 7 + ic * 3) % 256).astype(np.uint8)
        parts.append(b"FRAME\n" + y.tobytes() + c.tobytes() + c.tobytes())
    return b"".join(parts)


def synthesize_videos(docs: DataFrame) -> DataFrame:
    """Fixture generator for the video path: width = 8 + 2*(doc_id%4),
    height = 6 + 2*(doc_id%3) (both even — C420 needs it), frames =
    2 + doc_id%3."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(it: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415 — executor-side import

        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            payloads = [
                _y4m_bytes(d, 8 + 2 * (d % 4), 6 + 2 * (d % 3), 2 + d % 3)
                for d in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(gen, schema)


VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("y_sum", T.LongType()),
    ]
)


def _decode_y4m(payload: bytes) -> list[tuple[int, int, int, int]]:
    """Parse a YUV4MPEG2 stream: read W/H/C from the stream header, then
    walk FRAME markers skipping each frame's Y+U+V planes by their C420
    geometry.  Returns [(frame_no, width, height, y_sum)]; ValueError on
    malformed input or non-C420 chroma."""
    import numpy as np  # noqa: PLC0415 — executor-side import

    nl = payload.index(b"\n")
    head = payload[:nl].split(b" ")
    if head[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    width = height = None
    chroma = b"C420jpeg"
    for tok in head[1:]:
        if tok[:1] == b"W":
            width = int(tok[1:])
        elif tok[:1] == b"H":
            height = int(tok[1:])
        elif tok[:1] == b"C":
            chroma = tok
    if width is None or height is None:
        raise ValueError("missing W/H in stream header")
    if not chroma.startswith(b"C420"):
        raise ValueError(f"unsupported chroma {chroma!r}")
    ny, nc = width * height, (width // 2) * (height // 2)
    frames: list[tuple[int, int, int, int]] = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at {pos}")
        pos = payload.index(b"\n", pos) + 1  # frame params end at newline
        y = np.frombuffer(payload, dtype=np.uint8, count=ny, offset=pos)
        frames.append(
            (len(frames), width, height, int(y.astype(np.int64).sum()))
        )
        pos += ny + 2 * nc  # skip Y + U + V
    if not frames:
        raise ValueError("no frames")
    return frames


def decode_video(df: DataFrame) -> DataFrame:
    """REAL video decode stage (Arrow-batched `mapInPandas`): one output
    row per FRAME with exact-integer luma stats — the fan-out shape a real
    frame extractor has (rows multiply, so this runs AFTER any doc-level
    filters; cf. `frame_sample_plan` for the pure-JVM addressing plan)."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415 — executor-side import

        for pdf in it:
            out = {"doc_id": [], "frame_no": [], "width": [], "height": [], "y_sum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for frame_no, w, h, s in _decode_y4m(bytes(payload)):
                    out["doc_id"].append(int(doc_id))
                    out["frame_no"].append(frame_no)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["y_sum"].append(s)
            yield pd.DataFrame(out).astype(
                {"frame_no": "int32", "width": "int32", "height": "int32", "y_sum": "int64"}
            )

    return df.mapInPandas(batches, VIDEO_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("src_w", T.IntegerType()),
        T.StructField("src_h", T.IntegerType()),
        T.StructField("dst_w", T.IntegerType()),
        T.StructField("dst_h", T.IntegerType()),
        T.StructField("resized_sum", T.LongType()),
    ]
)


def _ppm_pixels(payload: bytes):
    """PPM raster as an (h, w, 3) array, top-down (PPM's file order IS
    image order)."""
    import numpy as np  # noqa: PLC0415 — executor-side import

    w, h, _ = _decode_ppm(payload)
    # re-locate the raster start exactly as _decode_ppm does
    toks, pos = 0, 2
    while toks < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        while not payload[pos : pos + 1].isspace():
            pos += 1
        toks += 1
    pos += 1
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return w, h, px.reshape(h, w, 3)


def _bmp_pixels(payload: bytes):
    """BMP raster as an (h, w, 3) array in IMAGE order: positive-height
    BMPs store rows BOTTOM-UP, so the file's first row is the image's
    last — a decoder that forgets the flip passes any sum-only check but
    resizes/crops the wrong pixels."""
    import struct  # noqa: PLC0415 — executor-side import

    import numpy as np  # noqa: PLC0415 — executor-side import

    (pix_off,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    stride = (width * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * abs(height), offset=pix_off
    ).reshape(abs(height), stride)[:, : width * 3]
    img = rows.reshape(abs(height), width, 3)
    if height > 0:  # bottom-up -> flip into image order
        img = img[::-1]
    return width, abs(height), img


def resize_image(df: DataFrame, dst_w: int = 8, dst_h: int = 8) -> DataFrame:
    """REAL nearest-neighbor resize stage (the third of the brief's four
    media ops — decode / feature-extract / RESIZE / frame-sample): decode
    the raster, gather rows ys=⌊y·h/dst_h⌋ and columns xs=⌊x·w/dst_w⌋,
    and reduce the resized plane to an exact-integer sum so the oracle can
    recompute the sampled indices arithmetically.  Honors BMP's bottom-up
    row order — the oracle indexes file bytes, so a missing flip breaks
    the hash.  Arrow-batched `mapInPandas`, one numpy gather per image."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np  # noqa: PLC0415 — executor-side import
        import pandas as pd  # noqa: PLC0415 — executor-side import

        for pdf in it:
            out = {
                "doc_id": [], "media_type": [], "src_w": [], "src_h": [],
                "dst_w": [], "dst_h": [], "resized_sum": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:2] == b"P6":
                    mt, (w, h, img) = PPM_TYPE, _ppm_pixels(b)
                elif b[:2] == b"BM":
                    mt, (w, h, img) = BMP_TYPE, _bmp_pixels(b)
                else:
                    raise ValueError(f"unknown magic {b[:2]!r}")
                ys = np.arange(dst_h, dtype=np.int64) * h // dst_h
                xs = np.arange(dst_w, dtype=np.int64) * w // dst_w
                resized = img[ys][:, xs, :]
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mt)
                out["src_w"].append(w)
                out["src_h"].append(h)
                out["dst_w"].append(dst_w)
                out["dst_h"].append(dst_h)
                out["resized_sum"].append(int(resized.astype(np.int64).sum()))
            yield pd.DataFrame(out).astype(
                {"src_w": "int32", "src_h": "int32", "dst_w": "int32",
                 "dst_h": "int32", "resized_sum": "int64"}
            )

    return df.mapInPandas(batches, RESIZE_SCHEMA)


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
    docs = fan_out(load_table(spark, sf_dir, "documents"))
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
    docs = fan_out(load_table(spark, sf_dir, "documents"))
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


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end encode→decode round trip over REAL image bytes: build
    PPM/BMP files per doc, then decode them back by parsing the formats'
    own headers (no lookup of the generator's parameters — the decoder
    only sees bytes).  Exact-integer output so the DuckDB oracle, which
    recomputes the deterministic pixel function arithmetically, must agree
    bit-for-bit."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return decode_image(synthesize_images(docs))


# The oracle never sees the binary: it recomputes what a correct
# encode→decode round trip must produce from the generator's arithmetic —
# sum over i in [0, w*h*3) of (doc_id*31 + i*7) % 256 — via a lateral
# range unnest.  Any header-parse or stride bug on the Spark side breaks
# the hash match.
MULTIMODAL_DECODE_SQL = """
SELECT d.doc_id,
       CASE WHEN d.doc_id % 2 = 0 THEN 'image/x-portable-pixmap'
            ELSE 'image/bmp' END AS media_type,
       CAST(12 + 4 * (d.doc_id % 5) AS INTEGER) AS width,
       CAST(8 + 2 * (d.doc_id % 4) AS INTEGER) AS height,
       CAST(sum((d.doc_id * 31 + t.i * 7) % 256) AS BIGINT) AS pixel_sum
FROM documents d,
     unnest(range((12 + 4 * (d.doc_id % 5)) * (8 + 2 * (d.doc_id % 4)) * 3)) AS t(i)
GROUP BY d.doc_id
"""


def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio encode→decode round trip over REAL WAV bytes (the audio/wav
    sibling of `multimodal_decode`): build a PCM file per doc — odd docs
    with an extra LIST chunk — then decode by walking the RIFF chunks.
    The oracle recomputes the amplitude arithmetic directly."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return decode_audio(synthesize_audio(docs))


MULTIMODAL_AUDIO_SQL = """
SELECT d.doc_id,
       'audio/wav' AS media_type,
       CAST(8000 + 1000 * (d.doc_id % 3) AS INTEGER) AS sample_rate,
       CAST(256 + 32 * (d.doc_id % 8) AS INTEGER) AS n_samples,
       CAST(sum(abs((d.doc_id * 131 + t.i * 17) % 4096 - 2048)) AS BIGINT) AS abs_sum,
       CAST(max(abs((d.doc_id * 131 + t.i * 17) % 4096 - 2048)) AS INTEGER) AS peak
FROM documents d,
     unnest(range(256 + 32 * (d.doc_id % 8))) AS t(i)
GROUP BY d.doc_id
"""


def q_multimodal_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode→decode→RESAMPLE round trip: build real WAV files, decimate
    each stream 4× and emit exact amplitude stats of the decimated
    samples.  The generator's sample i is ((doc_id*131 + i*17) % 4096) -
    2048, so the oracle sums over i ∈ {0, 4, 8, ...} directly — any
    off-by-one in the chunk walk or the stride breaks the hash."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return resample_audio(synthesize_audio(docs), factor=4)


MULTIMODAL_RESAMPLE_SQL = """
SELECT d.doc_id,
       'audio/wav' AS media_type,
       CAST(8000 + 1000 * (d.doc_id % 3) AS INTEGER) AS src_rate,
       CAST((8000 + 1000 * (d.doc_id % 3)) // 4 AS INTEGER) AS dst_rate,
       CAST(count(*) AS INTEGER) AS n_out,
       CAST(sum(abs((d.doc_id * 131 + t.i * 17) % 4096 - 2048)) AS BIGINT) AS abs_sum,
       CAST(max(abs((d.doc_id * 131 + t.i * 17) % 4096 - 2048)) AS INTEGER) AS peak
FROM documents d,
     unnest(range(0, 256 + 32 * (d.doc_id % 8), 4)) AS t(i)
GROUP BY d.doc_id
"""


def q_multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video encode→decode round trip over REAL Y4M streams: one output
    row per decoded FRAME with its exact luma sum.  The oracle recomputes
    the per-frame arithmetic via a doc×frame×pixel unnest — any plane-skip
    or marker-walk bug changes a luma sum and breaks the hash."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return decode_video(synthesize_videos(docs))


MULTIMODAL_VIDEO_SQL = """
WITH geo AS (
  SELECT doc_id,
         8 + 2 * (doc_id % 4) AS w,
         6 + 2 * (doc_id % 3) AS h,
         2 + doc_id % 3 AS nf
  FROM documents
),
f AS (SELECT geo.*, t.f FROM geo, unnest(range(nf)) AS t(f))
SELECT f.doc_id,
       CAST(f.f AS INTEGER) AS frame_no,
       CAST(f.w AS INTEGER) AS width,
       CAST(f.h AS INTEGER) AS height,
       CAST(sum((f.doc_id * 37 + f.f * 11 + p.i * 5) % 256) AS BIGINT) AS y_sum
FROM f, unnest(range(f.w * f.h)) AS p(i)
GROUP BY f.doc_id, f.f, f.w, f.h
"""


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode→decode→RESIZE round trip: build real PPM/BMP files, resize
    each to 8×8 nearest-neighbor, emit exact-integer sums of the resized
    plane.  The oracle recomputes the sampled byte indices arithmetically
    — including BMP's bottom-up row mapping — over a target-grid unnest,
    so a wrong gather index or a missing row flip breaks the hash."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return resize_image(synthesize_images(docs), dst_w=8, dst_h=8)


# resized pixel (y, x, c) samples source row r=⌊y·h/8⌋, col q=⌊x·w/8⌋; the
# generator wrote file byte i with value (doc_id*31 + i*7) % 256, where
# PPM file order is image order (i = (r·w+q)·3+c) but BMP rows are stored
# bottom-up (i = ((h-1-r)·w+q)·3+c).
MULTIMODAL_RESIZE_SQL = """
WITH g AS (
  SELECT doc_id,
         12 + 4 * (doc_id % 5) AS w,
         8 + 2 * (doc_id % 4) AS h
  FROM documents
),
px AS (
  SELECT doc_id, w, h,
    CASE WHEN doc_id % 2 = 0
      THEN (((y.y * h) // 8) * w + ((x.x * w) // 8)) * 3 + c.c
      ELSE ((h - 1 - ((y.y * h) // 8)) * w + ((x.x * w) // 8)) * 3 + c.c
    END AS i
  FROM g,
       unnest(range(8)) AS y(y),
       unnest(range(8)) AS x(x),
       unnest(range(3)) AS c(c)
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image/x-portable-pixmap'
            ELSE 'image/bmp' END AS media_type,
       CAST(w AS INTEGER) AS src_w,
       CAST(h AS INTEGER) AS src_h,
       CAST(8 AS INTEGER) AS dst_w,
       CAST(8 AS INTEGER) AS dst_h,
       CAST(sum((doc_id * 31 + i * 7) % 256) AS BIGINT) AS resized_sum
FROM px
GROUP BY doc_id, w, h
"""


def q_multimodal_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG encode→decode round trip over REAL compressed bytes: build a
    genuine PNG per doc (deflate + cycling row filters + chunk CRCs),
    then decode through the SAME `decode_image` stage as PPM/BMP — the
    decoder sniffs the signature and must undo zlib AND all five filter
    types to recover the pixel plane.  The oracle recomputes the
    generator arithmetic directly; any inflate/unfilter/CRC bug breaks
    the hash."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return decode_image(synthesize_images_png(docs))


MULTIMODAL_PNG_SQL = """
SELECT d.doc_id,
       'image/png' AS media_type,
       CAST(5 + d.doc_id % 7 AS INTEGER) AS width,
       CAST(4 + d.doc_id % 5 AS INTEGER) AS height,
       CAST(sum((d.doc_id * 31 + t.i * 7) % 256) AS BIGINT) AS pixel_sum
FROM documents d,
     unnest(range((5 + d.doc_id % 7) * (4 + d.doc_id % 5) * 3)) AS t(i)
GROUP BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup (pHash: 32x32 grayscale -> 2D DCT-II -> 8x8
# low-frequency block -> median-threshold 64-bit hash)
# ---------------------------------------------------------------------------

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)


def synthesize_near_dup_images(docs: DataFrame) -> DataFrame:
    """Fixture generator for image dedup: documents land in quads
    (base = doc_id // 4) over a mixed pseudo-random base texture (a
    regular sawtooth puts half the DCT block exactly ON the median — a
    knife-edge fixture where ±1 pixel flips arbitrary bits).  Variant 0
    is the base image; variant 1 adds +1 to every 97th byte (re-encode
    noise — pHash collapses it to the identical hash); variant 2 adds
    +16 to every 13th byte (a visible overlay — lands 2-18 bits away,
    so only SOME quads stay within the near-dup radius, exercising the
    hamming verify both ways); variant 3 renders a different spatial
    pattern entirely (24+ bits away, never pairs).  Dimensions are
    per-quad so in-quad rasters align.  Same PPM/BMP alternation as
    `synthesize_images`; generator-only Python, Arrow-batched."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(it: Iterator) -> Iterator:
        import numpy as np  # noqa: PLC0415 — executor-side import
        import pandas as pd  # noqa: PLC0415 — executor-side import

        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                base, variant = int(d) // 4, int(d) % 4
                w, h = 12 + 4 * (base % 5), 8 + 2 * (base % 4)
                n = w * h * 3
                i = np.arange(n, dtype=np.int64)
                if variant < 3:
                    px = ((i * 2654435761 + base * 97003) >> 7) % 256
                    if variant == 1:
                        px = px.copy()
                        px[::97] = (px[::97] + 1) % 256
                    elif variant == 2:
                        px = px.copy()
                        px[::13] = (px[::13] + 16) % 256
                else:
                    px = ((i * 40503 + base * 31 + 7) >> 3) % 256
                raw = px.astype(np.uint8).tobytes()
                if d % 2 == 0:
                    payloads.append(
                        b"P6\n# synthetic\n%d %d\n255\n" % (w, h) + raw
                    )
                else:
                    import struct  # noqa: PLC0415 — executor-side import

                    # TOP-DOWN BMP (negative biHeight, legal per the
                    # format): raster order equals image order, so a
                    # quad's PPM and BMP variants depict the SAME image
                    # — and the decoder's negative-height branch gets
                    # exercised (a bottom-up BMP here would vertically
                    # flip the twin and break every cross-format pair)
                    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + n, 0, 0, 54)
                    info = struct.pack(
                        "<IiiHHIIiiII", 40, w, -h, 1, 24, 0, n, 2835, 2835, 0, 0
                    )
                    payloads.append(header + info + raw)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(gen, schema)


def _phash64(img) -> int:
    """64-bit pHash of an (h, w, 3) uint8 raster: grayscale mean,
    nearest-neighbor 32x32 (same ⌊i·src/dst⌋ gather as `resize_image`),
    unnormalized 2D DCT-II, top-left 8x8 block, bit j set iff
    coefficient j exceeds the median of the 63 AC coefficients (DC is
    excluded from the threshold — it only encodes global brightness)."""
    import numpy as np  # noqa: PLC0415 — executor-side import

    h, w = img.shape[0], img.shape[1]
    g = img.astype(np.float64).mean(axis=2)
    ys = np.arange(32, dtype=np.int64) * h // 32
    xs = np.arange(32, dtype=np.int64) * w // 32
    s = g[ys][:, xs]
    k = np.arange(32, dtype=np.float64)
    D = np.cos(np.pi * np.outer(k, k + 0.5) / 32.0)
    d = D @ s @ D.T
    block = d[:8, :8].flatten()
    med = float(np.median(block[1:]))
    bits = block > med
    val = 0
    for j in range(64):
        if bits[j]:
            val |= 1 << j
    # wrap to signed int64 for LongType
    return val - (1 << 64) if val >= (1 << 63) else val


def phash_images(df: DataFrame) -> DataFrame:
    """(doc_id, media_type, phash) via one Arrow-batched kernel — decode
    (REAL PPM/BMP parsing, bottom-up BMP flip included), grayscale,
    resize, DCT.  At 100 TB this is the only Python stage; everything
    downstream (banding, bucket join, hamming verify) is JVM codegen.

    The DCT is BATCH-vectorized: after the (cheap, per-image) decode,
    the resized 32x32 planes of the whole Arrow batch stack into one
    (n, 32, 32) tensor and the two cosine-matrix contractions run as a
    single pair of batched matmuls — the same per-image math as
    `_phash64` (tie-broken identically; parity-gated in tests).  At
    sf0.1 the whole hash stage adds ~0.16 s over the decode; at corpus
    scale the batched BLAS path is what keeps the kernel image-bound
    rather than interpreter-bound."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np  # noqa: PLC0415 — executor-side import
        import pandas as pd  # noqa: PLC0415 — executor-side import

        k = np.arange(32, dtype=np.float64)
        D = np.cos(np.pi * np.outer(k, k + 0.5) / 32.0)
        for pdf in it:
            ids, mts, planes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:2] == b"P6":
                    mt, (w, h, img) = PPM_TYPE, _ppm_pixels(b)
                elif b[:2] == b"BM":
                    mt, (w, h, img) = BMP_TYPE, _bmp_pixels(b)
                else:
                    raise ValueError(f"unknown magic {b[:2]!r}")
                # gather the 32x32 sample BEFORE the float64 grayscale:
                # mean-of-selected == select-of-means pixel for pixel, so
                # this is bit-identical to _phash64's full-plane pass but
                # skips a (h, w) float64 alloc per image (the cold-path
                # dominator at fixture image sizes)
                ys = np.arange(32, dtype=np.int64) * h // 32
                xs = np.arange(32, dtype=np.int64) * w // 32
                ids.append(int(doc_id))
                mts.append(mt)
                planes.append(img[ys][:, xs].astype(np.float64).mean(axis=2))
            if not ids:
                continue
            S = np.stack(planes)  # (n, 32, 32)
            dcts = D @ S @ D.T  # batched over the leading axis
            blocks = dcts[:, :8, :8].reshape(len(ids), 64)
            med = np.median(blocks[:, 1:], axis=1, keepdims=True)
            bits = (blocks > med).astype(np.uint64)
            hashes = (bits << np.arange(64, dtype=np.uint64)).sum(
                axis=1, dtype=np.uint64
            )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media_type": mts,
                    "phash": hashes.astype(np.int64),
                }
            )

    return df.mapInPandas(batches, PHASH_SCHEMA)


def phash_near_dup_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs within `max_hamming` bits — the
    image analog of `simhash_pairs` (dedup.py): pigeonhole over 4
    16-bit chunks (hamming <= 3 forces at least one chunk equal), ONE
    equi-join on (chunk_id, chunk_val) buckets, exact `bit_count(xor)`
    verify inside the join condition, distinct over multi-chunk matches.
    Candidate work is Σ|bucket|², never |corpus|²; a boilerplate-image
    hot bucket would concentrate it, the same Zipf head every banded
    sketch join has — the simhash operator's hot-bucket collapse applies
    unchanged if a real corpus needs it."""
    if max_hamming >= 4:
        raise ValueError("4x16-bit pigeonhole supports max_hamming <= 3")
    chunks = F.array(
        *[
            F.shiftrightunsigned(F.col("phash"), 16 * c)
            .bitwiseAND(F.lit(0xFFFF))
            .alias(f"c{c}")
            for c in range(4)
        ]
    )
    sides = hashes.select(
        "doc_id", "phash", F.posexplode(chunks).alias("chunk_id", "chunk_val")
    )
    a, b = sides.alias("a"), sides.alias("b")
    ham = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (ham <= max_hamming),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
    )


def q_dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query for `dedup_phash`: pHash near-dup pairs over the
    synthesized near-dup image corpus (one image per document row).
    Rows-only: the DCT is not DuckDB-reproducible; the kernel is pinned
    by a pure-Python reference parity test, planted-pair recall/precision
    gates, and a fresh-run determinism gate (tests/test_multimodal.py)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    imgs = synthesize_near_dup_images(docs)
    return phash_near_dup_pairs(phash_images(imgs)).orderBy("doc_a", "doc_b")


QUERIES = {
    "dedup_phash": q_dedup_phash,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_png": q_multimodal_png,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_resample": q_multimodal_resample,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_audio": q_multimodal_audio,
    "multimodal_video": q_multimodal_video,
}
ORACLES = {
    "multimodal_meta": MULTIMODAL_META_SQL,
    "multimodal_png": MULTIMODAL_PNG_SQL,
    "multimodal_resize": MULTIMODAL_RESIZE_SQL,
    "multimodal_resample": MULTIMODAL_RESAMPLE_SQL,
    "multimodal_frames": MULTIMODAL_FRAMES_SQL,
    "multimodal_decode": MULTIMODAL_DECODE_SQL,
    "multimodal_audio": MULTIMODAL_AUDIO_SQL,
    "multimodal_video": MULTIMODAL_VIDEO_SQL,
}
