"""Multimodal plumbing: binary schema, Arrow mapInPandas batch shape,
stub gating, frame-sample plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realparse_spark.operators.multimodal import (
    _bmp_bytes,
    _decode_bmp,
    _decode_ppm,
    _ppm_bytes,
    attach_payload,
    decode_features,
    decode_image,
    frame_sample_plan,
    synthesize_images,
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


def test_ppm_roundtrip_local():
    # encode→decode round trip on known params, including a header comment
    w, h, s = _decode_ppm(_ppm_bytes(7, 16, 12))
    assert (w, h) == (16, 12)
    assert s == sum((7 * 31 + i * 7) % 256 for i in range(16 * 12 * 3))


def test_bmp_roundtrip_and_stride_local():
    import struct

    w, h, s = _decode_bmp(_bmp_bytes(3, 20, 10))
    assert (w, h) == (20, 10)
    assert s == sum((3 * 31 + i * 7) % 256 for i in range(20 * 10 * 3))
    # width NOT a multiple of 4 → 4-byte row stride with padding bytes the
    # decoder must skip (the synthesized fixtures never exercise this)
    width, height = 5, 3
    stride = (width * 3 + 3) // 4 * 4  # 16 bytes: 15 pixels + 1 pad
    rows = b"".join(
        bytes(range(r * 50, r * 50 + width * 3)) + b"\xff" * (stride - width * 3)
        for r in range(height)
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(rows), 0, 0, 0, 0
    )
    w, h, s = _decode_bmp(header + info + rows)
    assert (w, h) == (width, height)
    # padding 0xff bytes excluded from the sum
    assert s == sum(sum(range(r * 50, r * 50 + width * 3)) for r in range(height))


def test_decode_rejects_malformed_local():
    with pytest.raises(ValueError):
        _decode_ppm(b"P5\n1 1\n255\n\x00")  # greyscale PGM, not P6
    with pytest.raises(ValueError):
        _decode_bmp(b"XX" + b"\x00" * 60)
    bad_depth = bytearray(_bmp_bytes(1, 12, 8))
    bad_depth[28] = 8  # claim 8bpp
    with pytest.raises(ValueError):
        _decode_bmp(bytes(bad_depth))


def test_decode_image_distributed(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(40)
    out = decode_image(synthesize_images(docs)).collect()
    assert len(out) == 40
    for r in out:
        expect_mt = (
            "image/x-portable-pixmap" if r.doc_id % 2 == 0 else "image/bmp"
        )
        assert r.media_type == expect_mt
        assert r.width == 12 + 4 * (r.doc_id % 5)
        assert r.height == 8 + 2 * (r.doc_id % 4)
        n = r.width * r.height * 3
        assert r.pixel_sum == sum(
            (r.doc_id * 31 + i * 7) % 256 for i in range(n)
        )


def test_frame_sample_plan(spark, sf_dir):
    docs = attach_payload(load_table(spark, sf_dir, "documents"))
    frames = frame_sample_plan(docs, every_n_bytes=100)
    one = frames.filter(F.col("doc_id") == 0).collect()
    assert [f.frame_no for f in one] == list(range(len(one)))
    assert all(f.byte_offset == i * 100 for i, f in enumerate(one))


def test_wav_roundtrip_and_chunk_walk_local():
    from realparse_spark.operators.multimodal import _decode_wav, _wav_bytes

    # even doc_id: minimal layout (fmt then data)
    rate, n, s, p = _decode_wav(_wav_bytes(4, 300, 9000))
    assert (rate, n) == (9000, 300)
    expect = [((4 * 131 + i * 17) % 4096) - 2048 for i in range(300)]
    assert s == sum(abs(x) for x in expect)
    assert p == max(abs(x) for x in expect)
    # odd doc_id: extra LIST chunk between fmt and data — a decoder that
    # assumes pixel data at byte 44 would read the LIST body as samples
    rate, n, s, p = _decode_wav(_wav_bytes(5, 256, 8000))
    assert (rate, n) == (8000, 256)
    expect = [((5 * 131 + i * 17) % 4096) - 2048 for i in range(256)]
    assert s == sum(abs(x) for x in expect)


def test_wav_rejects_malformed_local():
    import struct

    from realparse_spark.operators.multimodal import _decode_wav, _wav_bytes

    with pytest.raises(ValueError):
        _decode_wav(b"RIFX" + b"\x00" * 40)  # wrong magic
    # stereo claimed in fmt -> unsupported
    stereo = bytearray(_wav_bytes(2, 64, 8000))
    off = stereo.index(b"fmt ") + 8 + 2  # channels field
    stereo[off:off + 2] = struct.pack("<H", 2)
    with pytest.raises(ValueError):
        _decode_wav(bytes(stereo))
    # truncated before the data chunk -> missing data
    head_only = _wav_bytes(2, 64, 8000)[:36]
    with pytest.raises(ValueError):
        _decode_wav(head_only)


def test_decode_audio_distributed(spark, sf_dir):
    from pyspark.sql import functions as F

    from realparse_spark.operators.multimodal import decode_audio, synthesize_audio
    from realparse_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(24)
    out = decode_audio(synthesize_audio(docs))
    rows = out.orderBy("doc_id").collect()
    assert len(rows) == 24
    for r in rows:
        assert r.sample_rate == 8000 + 1000 * (r.doc_id % 3)
        assert r.n_samples == 256 + 32 * (r.doc_id % 8)
        assert 0 <= r.peak <= 2048


def test_y4m_roundtrip_and_plane_skip_local():
    from realparse_spark.operators.multimodal import _decode_y4m, _y4m_bytes

    frames = _decode_y4m(_y4m_bytes(6, 8, 6, 3))
    assert [(f[0], f[1], f[2]) for f in frames] == [(0, 8, 6), (1, 8, 6), (2, 8, 6)]
    for fno, w, h, s in frames:
        assert s == sum((6 * 37 + fno * 11 + i * 5) % 256 for i in range(w * h))


def test_y4m_rejects_malformed_local():
    from realparse_spark.operators.multimodal import _decode_y4m, _y4m_bytes

    with pytest.raises(ValueError):
        _decode_y4m(b"MPEG4\n")
    # 4:2:2 chroma claimed -> unsupported (plane sizes would differ)
    good = _y4m_bytes(2, 8, 6, 2)
    with pytest.raises(ValueError):
        _decode_y4m(good.replace(b"C420jpeg", b"C422meow", 1))
    # corrupt a FRAME marker: the walker must notice, not read garbage
    bad = bytearray(good)
    off = bytes(bad).index(b"FRAME", 20)
    bad[off:off + 5] = b"FLAME"
    with pytest.raises(ValueError):
        _decode_y4m(bytes(bad))


def test_decode_video_distributed(spark, sf_dir):
    from realparse_spark.operators.multimodal import decode_video, synthesize_videos
    from realparse_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(12)
    rows = decode_video(synthesize_videos(docs)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 12
    for d, fr in by_doc.items():
        assert len(fr) == 2 + d % 3  # every FRAME surfaced exactly once
        assert sorted(f.frame_no for f in fr) == list(range(len(fr)))


def test_resample_identity_matches_decode(spark, sf_dir):
    """factor=1 decimation must reproduce decode_audio's exact stats —
    the stride and the chunk walk agree on every sample."""
    from pyspark.sql import functions as F

    from realparse_spark.operators.multimodal import (
        decode_audio,
        resample_audio,
        synthesize_audio,
    )
    from realparse_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    wav = synthesize_audio(docs)
    dec = {r.doc_id: (r.n_samples, r.abs_sum, r.peak)
           for r in decode_audio(wav).collect()}
    res = {r.doc_id: (r.n_out, r.abs_sum, r.peak)
           for r in resample_audio(wav, factor=1).collect()}
    assert dec == res
    # 4x decimation keeps exactly ceil(n/4) samples
    q = {r.doc_id: r.n_out for r in resample_audio(wav, factor=4).collect()}
    assert all(q[d] == -(-dec[d][0] // 4) for d in dec)


def test_resize_identity_matches_decode_local():
    """Resizing to the source dimensions must reproduce the full-plane
    pixel sum for BOTH formats (gather indices become the identity), and
    the BMP path must flip bottom-up rows: a non-identity resize of a BMP
    whose rows differ must NOT equal the flip-less gather."""
    import numpy as np

    from realparse_spark.operators.multimodal import (
        _bmp_bytes,
        _bmp_pixels,
        _decode_bmp,
        _decode_ppm,
        _ppm_bytes,
        _ppm_pixels,
    )

    for doc_id in (2, 7):
        w, h = 12 + 4 * (doc_id % 5), 8 + 2 * (doc_id % 4)
        ppm = _ppm_bytes(doc_id, w, h)
        bmp = _bmp_bytes(doc_id, w, h)
        pw, ph, pimg = _ppm_pixels(ppm)
        bw, bh, bimg = _bmp_pixels(bmp)
        assert (pw, ph) == (w, h) and (bw, bh) == (w, h)
        assert int(pimg.astype(np.int64).sum()) == _decode_ppm(ppm)[2]
        assert int(bimg.astype(np.int64).sum()) == _decode_bmp(bmp)[2]
        # BMP image order = flipped file order: row 0 of the image is the
        # LAST file row
        file_rows = np.frombuffer(bmp[54:], dtype=np.uint8).reshape(h, w * 3)
        assert (bimg.reshape(h, w * 3) == file_rows[::-1]).all()


def test_png_roundtrip_all_filters_local():
    from realparse_spark.operators.multimodal import _decode_png, _png_bytes

    # height 7 cycles filter types 0,1,2,3,4,0,1 — every unfilter path runs
    w, h, s = _decode_png(_png_bytes(9, 6, 7))
    assert (w, h) == (6, 7)
    assert s == sum((9 * 31 + i * 7) % 256 for i in range(6 * 7 * 3))
    # the compressed stream is genuinely smaller-or-reshaped, not raw bytes
    assert b"IDAT" in _png_bytes(9, 6, 7)


def test_png_rejects_tampered_and_malformed_local():
    import pytest

    from realparse_spark.operators.multimodal import _decode_png, _png_bytes

    good = bytearray(_png_bytes(4, 5, 5))
    # flip one bit inside the IDAT payload: the chunk CRC must catch it
    idat_off = bytes(good).index(b"IDAT") + 6
    tampered = bytearray(good)
    tampered[idat_off] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        _decode_png(bytes(tampered))
    with pytest.raises(ValueError):
        _decode_png(b"\x89PNG\r\n\x1a\nXXXX")  # truncated, no IHDR
    # greyscale (color type 0) is out of scope and must be refused
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    grey = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x7f"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="RGB"):
        _decode_png(grey)


def test_decode_png_distributed(spark, sf_dir):
    from realparse_spark.operators.multimodal import (
        decode_image,
        synthesize_images_png,
    )

    docs = load_table(spark, sf_dir, "documents").limit(40)
    out = decode_image(synthesize_images_png(docs)).collect()
    assert len(out) == 40
    for r in out:
        assert r.media_type == "image/png"
        assert r.width == 5 + r.doc_id % 7
        assert r.height == 4 + r.doc_id % 5
        n = r.width * r.height * 3
        assert r.pixel_sum == sum(
            (r.doc_id * 31 + i * 7) % 256 for i in range(n)
        )


def test_png_truncated_chunk_raises_valueerror_local():
    """The documented malformed-input signal is ValueError — a declared
    chunk length running past EOF must not leak struct.error, and a
    per-chunk-valid but truncated IDAT must not leak zlib.error."""
    import struct
    import zlib

    import pytest

    from realparse_spark.operators.multimodal import _decode_png, _png_bytes

    good = _png_bytes(2, 6, 6)
    # inflate the declared IDAT length beyond EOF, fix nothing else
    idat_at = good.index(b"IDAT") - 4
    bad_len = good[:idat_at] + struct.pack(">I", 10_000) + good[idat_at + 4:]
    with pytest.raises(ValueError, match="truncated"):
        _decode_png(bad_len)

    # rebuild with a VALID CRC over a truncated IDAT payload: the chunk
    # walk passes, zlib.decompress must surface as ValueError
    sig = good[:8]
    ihdr_len = struct.unpack(">I", good[8:12])[0]
    ihdr_chunk = good[8 : 8 + 12 + ihdr_len]
    idat_len = struct.unpack(">I", good[idat_at : idat_at + 4])[0]
    idat_data = good[idat_at + 8 : idat_at + 8 + idat_len][: max(1, idat_len // 2)]
    crc = zlib.crc32(b"IDAT" + idat_data) & 0xFFFFFFFF
    trunc = (
        sig
        + ihdr_chunk
        + struct.pack(">I", len(idat_data))
        + b"IDAT"
        + idat_data
        + struct.pack(">I", crc)
        + struct.pack(">I", 0)
        + b"IEND"
        + struct.pack(">I", zlib.crc32(b"IEND") & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="IDAT|raster"):
        _decode_png(trunc)


# ---------------------------------------------------------------------------
# pHash image dedup gates (rows-only query — these ARE its correctness story)
# ---------------------------------------------------------------------------


def _phash_ref(payload: bytes) -> int:
    """Independent pure-Python pHash reference (no shared code with the
    kernel beyond the documented algorithm): grayscale mean, ⌊i·src/32⌋
    gather, explicit double-loop DCT-II, median of the 63 AC coefs."""
    import math
    import statistics

    from realparse_spark.operators.multimodal import _bmp_pixels, _ppm_pixels

    if payload[:2] == b"P6":
        w, h, img = _ppm_pixels(payload)
    else:
        w, h, img = _bmp_pixels(payload)
    gray = [
        [sum(img[y][x][c] for c in range(3)) / 3.0 for x in range(w)]
        for y in range(h)
    ]
    s = [[gray[y * h // 32][x * w // 32] for x in range(32)] for y in range(32)]
    block = []
    for u in range(8):
        for v in range(8):
            acc = 0.0
            for y in range(32):
                for x in range(32):
                    acc += (
                        s[y][x]
                        * math.cos(math.pi * u * (y + 0.5) / 32.0)
                        * math.cos(math.pi * v * (x + 0.5) / 32.0)
                    )
            block.append(acc)
    med = statistics.median(block[1:])
    val = sum(1 << j for j in range(64) if block[j] > med)
    return val - (1 << 64) if val >= (1 << 63) else val


def test_phash_kernel_matches_pure_python_reference(spark, sf_dir):
    """Three-way parity: the batched kernel, the per-image numpy
    `_phash64` (whose docstring the kernel claims to match), and the
    independent double-loop reference must all agree."""
    from realparse_spark.operators.multimodal import (
        _bmp_pixels,
        _phash64,
        _ppm_pixels,
        phash_images,
        synthesize_near_dup_images,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 24)
    imgs = synthesize_near_dup_images(docs)
    got = {r.doc_id: r.phash for r in phash_images(imgs).collect()}
    payloads = {r.doc_id: bytes(r.payload) for r in imgs.collect()}
    assert len(got) == 24
    for doc_id, payload in payloads.items():
        img = (_ppm_pixels if payload[:2] == b"P6" else _bmp_pixels)(payload)[2]
        assert got[doc_id] == _phash64(img) == _phash_ref(payload), doc_id


def test_phash_near_dup_planted_recall_and_precision(spark, sf_dir):
    from realparse_spark.registry import all_queries

    rows = all_queries()["dedup_phash"](spark, sf_dir).collect()
    assert rows, "fixture must produce near-dup pairs"
    n_quads = 0
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_quads = sum(1 for b in range(n_docs // 4 + 1) if b * 4 + 1 < n_docs)
    v01 = [r for r in rows if r.doc_a // 4 == r.doc_b // 4
           and (r.doc_a % 4, r.doc_b % 4) == (0, 1)]
    # variant 1 is re-encode noise: the overwhelming majority of quads
    # collapse to the identical hash (a few knife-edge textures land at
    # hamming 4 — correct pHash behavior, gated as the tolerance here)
    assert len(v01) / n_quads >= 0.95, (len(v01), n_quads)
    # precision on the fixture is absolute: nothing crosses quads and
    # variant 3 (a different image) never pairs
    assert all(r.doc_a // 4 == r.doc_b // 4 for r in rows)
    assert all(3 not in (r.doc_a % 4, r.doc_b % 4) for r in rows)
    assert all(0 <= r.hamming <= 3 for r in rows)


def test_phash_query_deterministic(spark, sf_dir):
    from realparse_spark.registry import all_queries

    q = all_queries()["dedup_phash"]
    a = [tuple(r) for r in q(spark, sf_dir).collect()]
    b = [tuple(r) for r in q(spark, sf_dir).collect()]
    assert a == b and len(a) > 0
