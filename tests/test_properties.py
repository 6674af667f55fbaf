"""Property-based tests (hypothesis) for the risk spots SURVEY.md §7.2
names: the tail-anchored destructure P5 under adversarial filenames, and
the C11 duration formatter.  Examples are batched into one DataFrame per
hypothesis example to keep Spark job counts sane."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.test_load_pipeline import style5_line

# filenames with digits, spaces, query args, multiple dots, no extension
fname_st = st.one_of(
    st.just("/media/promo 6959/clip1.rm"),
    st.just("/6am_show/clip9.rm"),
    st.just("/a/b/c.d.e.rm"),
    st.just("/noext"),
    st.just("/"),
    st.just("/x.rm?start=99&end=100"),
    # space-injected digit tokens: 6xx/9xx are protected by the reference's
    # [6_9] heuristic; 7xx/8xx reproduce the reference's OWN misalignment
    # (real_parse.pl:71-72 only guards 6/9/_-leading tokens), so only the
    # tail-anchored fields are guaranteed for them.
    st.builds(
        lambda a, b: f"/d{a}/f {b}x/v.rm",
        st.integers(600, 999),
        st.sampled_from([600, 650, 699, 900, 950, 999]),
    ),
)

row_st = st.tuples(
    fname_st,
    st.tuples(*[st.integers(0, 10**6) for _ in range(6)]),
    st.sampled_from([200, 404]),
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(rows=st.lists(row_st, min_size=1, max_size=20))
def test_tail_anchored_destructure(spark, rows):
    """The trailing six numeric fields must always be recovered exactly,
    whatever digit junk the filename injects (P4/P5 interplay)."""
    from realparse_spark.operators.parse import parse_style5

    data = [
        (
            i,
            style5_line(
                "10.0.0.1", "13/Oct/2002:09:03:38", fname, status=status,
                tail=" ".join(str(x) for x in tail),
            ),
        )
        for i, (fname, tail, status) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "i long, value string")
    got = {
        r.i: (r.file_size, r.file_time, r.sent_time, r.resends, r.failed_resends, r.presentation_id, r.bytes_sent)
        for r in parse_style5(df).collect()
    }
    for i, (_, tail, _) in enumerate(rows):
        # the six tail-anchored fields are recovered under ANY filename;
        # bytes_sent additionally holds because every generated space-digit
        # token is [69]-led and therefore dropped by the P4 heuristic
        assert got[i] == (*tail, 1048576), (i, rows[i], got[i])


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.text(
            alphabet="ab1 .\nXY",  # case-folding, strip-chars, whitespace
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_winnow_matches_python_reference(spark, texts):
    """Winnowing fingerprints must equal a direct Python implementation of
    the SIGMOD'03 scheme — including short-doc edge cases (len < k, fewer
    than w hashes)."""
    import re

    from realparse_spark.operators.text import (
        WINNOW_B,
        WINNOW_K,
        WINNOW_P,
        WINNOW_W,
        winnow_fingerprints,
    )

    def ref(text):
        norm = re.sub(r"[^a-z0-9]", "", text.lower())
        codes = [ord(c) for c in norm]
        if len(codes) < WINNOW_K:
            return set()
        hs = []
        for i in range(len(codes) - WINNOW_K + 1):
            h = codes[i]
            for j in range(1, WINNOW_K):
                h = (h * WINNOW_B + codes[i + j]) % WINNOW_P
            hs.append(h)
        return {
            min(hs[j : j + WINNOW_W])
            for j in range(max(len(hs) - WINNOW_W + 1, 1))
        }

    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    got: dict[str, set] = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    for i, t in enumerate(texts):
        assert got.get(str(i), set()) == ref(t), (i, t)


@settings(**_SETTINGS)
@given(secs=st.lists(st.integers(0, 10**6), min_size=1, max_size=50))
def test_duration_format_matches_python(spark, secs):
    from realparse_spark.functions.scalars import duration_hms

    df = spark.createDataFrame([(i, s) for i, s in enumerate(secs)], "i long, s long")
    got = {r.i: r.d for r in df.select("i", duration_hms(F.col("s")).alias("d")).collect()}
    for i, s in enumerate(secs):
        if s >= 3600:
            want = f"{s // 3600}:{(s % 3600) // 60:02d}:{s % 60:02d}"
        else:
            want = f"{s // 60}:{s % 60:02d}"
        assert got[i] == want


# ---------------------------------------------------------------------------
# round-4 ops: chunking coverage and entropy vs a Python reference
# ---------------------------------------------------------------------------

_word_st = st.text(alphabet="abcde", min_size=1, max_size=4)
_doc_st = st.lists(_word_st, min_size=0, max_size=90).map(" ".join)


@settings(**_SETTINGS)
@given(texts=st.lists(_doc_st, min_size=1, max_size=12))
def test_chunk_documents_covers_every_token(spark, texts):
    """Every token of every document appears in at least one chunk, chunk
    ids are dense from 0, and every non-trailing chunk is exactly
    chunk_tokens long (the overlap rule never drops or duplicates a
    token position)."""
    from realparse_spark.operators.pipeline_ops import chunk_documents

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = chunk_documents(docs, chunk_tokens=16, stride=12).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r
    for doc_id, text in enumerate(texts):
        toks = [t for t in text.split(" ") if t]
        chunks = by_doc[doc_id]
        n = len(toks)
        expected_starts = list(range(0, max(n, 1), 12))
        assert sorted(chunks) == list(range(len(expected_starts)))
        rebuilt = [None] * n
        for cid, start in enumerate(expected_starts):
            got = chunks[cid].chunk_text.split(" ") if chunks[cid].chunk_text else []
            assert got == toks[start:start + 16]
            if start + 16 < n:
                assert chunks[cid].n_chunk_tokens == 16
            for off, tok in enumerate(got):
                rebuilt[start + off] = tok
        assert rebuilt == toks  # full coverage, correct positions


@settings(**_SETTINGS)
@given(texts=st.lists(_doc_st.filter(lambda t: t.strip()), min_size=1, max_size=12))
def test_token_entropy_matches_python(spark, texts):
    import math
    from collections import Counter

    from realparse_spark.operators.text import token_entropy

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_tokens, r.token_entropy) for r in token_entropy(docs).collect()}
    for doc_id, text in enumerate(texts):
        toks = [t for t in text.split(" ") if t]
        c = Counter(toks)
        n = sum(c.values())
        h = math.log(n) - sum(tf * math.log(tf) for tf in c.values()) / n
        assert got[doc_id][0] == n
        assert abs(got[doc_id][1] - round(h, 6)) < 1e-9, (doc_id, got[doc_id], h)


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),        # user_id
            st.integers(0, 50),       # ts offset (seconds; collisions likely)
            st.sampled_from(["a", "b", "c"]),  # attr value
        ),
        min_size=1,
        max_size=25,
    )
)
def test_scd2_intervals_match_python_reference(spark, rows):
    """SCD2 run-length contract vs a direct Python reference: for any
    change log (including same-second updates), the intervals are exactly
    the value runs under (ts, event_id) order, chained half-open, with
    one NULL-terminated current row per user."""
    import datetime

    from realparse_spark.operators.analytics import scd2_intervals

    base = datetime.datetime(2003, 1, 1)
    data = [
        (i, base + datetime.timedelta(seconds=off), uid, typ, 0.0, "{}")
        for i, (uid, off, typ) in enumerate(rows)
    ]
    events = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = sorted(
        (r.user_id, r.attr_value, r.valid_from, r.valid_to)
        for r in scd2_intervals(events).collect()
    )

    # Python reference: per user, sort by (ts, event_id), collapse runs
    expect = []
    by_user: dict[int, list] = {}
    for i, (uid, off, typ) in enumerate(rows):
        by_user.setdefault(uid, []).append((base + datetime.timedelta(seconds=off), i, typ))
    for uid, evs in by_user.items():
        evs.sort()
        runs = []
        for ts, _i, typ in evs:
            if not runs or runs[-1][1] != typ:
                runs.append([ts, typ])
        for j, (ts, typ) in enumerate(runs):
            nxt = runs[j + 1][0] if j + 1 < len(runs) else None
            expect.append((uid, typ, ts, nxt))
    assert got == sorted(expect)


@given(
    doc_id=st.integers(0, 2**40),
    width=st.integers(1, 24),
    height=st.integers(1, 16),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(doc_id, width, height):
    """Any (doc_id, w, h) encodes to a genuine PNG that decodes back to
    the exact generator pixel sum — including 1-pixel-wide images (the
    Sub/Paeth left neighbor is always 0) and heights < 5 (not every
    filter type present).  Pure local codec property, no Spark."""
    from realparse_spark.operators.multimodal import _decode_png, _png_bytes

    w, h, s = _decode_png(_png_bytes(doc_id, width, height))
    assert (w, h) == (width, height)
    assert s == sum(
        (doc_id * 31 + i * 7) % 256 for i in range(width * height * 3)
    )


@given(
    doc_id=st.integers(0, 2**40),
    n_samples=st.integers(1, 600),
    sample_rate=st.integers(1, 96_000),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(doc_id, n_samples, sample_rate):
    """Any (doc_id, n, rate) — including ODD sample counts, whose 2-byte
    samples keep the data chunk even, and odd doc_ids carrying the extra
    LIST chunk — round-trips through the RIFF chunk walk to the exact
    generator amplitude stats."""
    from realparse_spark.operators.multimodal import _decode_wav, _wav_bytes

    rate, n, abs_sum, peak = _decode_wav(_wav_bytes(doc_id, n_samples, sample_rate))
    samples = [((doc_id * 131 + i * 17) % 4096) - 2048 for i in range(n_samples)]
    assert (rate, n) == (sample_rate, n_samples)
    assert abs_sum == sum(abs(s) for s in samples)
    assert peak == max(abs(s) for s in samples)


@given(
    doc_id=st.integers(0, 2**40),
    width=st.integers(1, 16).map(lambda x: x * 2),   # C420 needs even dims
    height=st.integers(1, 12).map(lambda x: x * 2),
    n_frames=st.integers(1, 5),
)
@settings(max_examples=40, deadline=None)
def test_y4m_roundtrip_property(doc_id, width, height, n_frames):
    """Any even-dimension C420 stream round-trips frame-exactly: per-frame
    luma sums match the generator, which fails if the plane walk mis-skips
    the two quarter-size chroma planes."""
    from realparse_spark.operators.multimodal import _decode_y4m, _y4m_bytes

    frames = _decode_y4m(_y4m_bytes(doc_id, width, height, n_frames))
    assert len(frames) == n_frames
    for f, w, h, y_sum in frames:
        assert (w, h) == (width, height)
        assert y_sum == sum(
            (doc_id * 37 + f * 11 + i * 5) % 256 for i in range(width * height)
        )


def test_vocab_build_ranking_and_oov_arithmetic(spark):
    """Vocabulary ids are assigned by (count desc, token asc) — the
    deterministic tie-break — and the OOV rate is exact integer ppm of
    token OCCURRENCES (not types) outside the vocab."""
    from pyspark.sql import functions as F

    from realparse_spark.operators.text import build_vocab, oov_rate

    docs = spark.createDataFrame(
        [
            (1, "a a a b b zz", "s1"),
            (2, "b c c zz yy", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    vocab = build_vocab(docs, size=3)
    rows = [(r.token_id, r.token, r.n) for r in vocab.orderBy("token_id").collect()]
    # counts: a=3 b=3 c=2 zz=2 yy=1; ties broken alphabetically
    assert rows == [(1, "a", 3), (2, "b", 3), (3, "c", 2)]

    oov = {r.source: (r.n_tokens, r.n_oov, r.oov_ppm)
           for r in oov_rate(docs, vocab).collect()}
    # s1: tokens a a a b b zz -> 1 OOV of 6; s2: b c c zz yy -> 2 OOV of 5
    assert oov == {"s1": (6, 1, 166666), "s2": (5, 2, 400000)}


# ---------------------------------------------------------------------------
# round-6 ops: segment scrub round trip and token-budget prefix property
# ---------------------------------------------------------------------------


@settings(**_SETTINGS)
@given(
    texts=st.lists(_doc_st, min_size=1, max_size=10),
    threshold=st.integers(2, 4),
)
def test_segment_scrub_matches_python_reference(spark, texts, threshold):
    """remove_duplicated_segments vs a direct Python recomputation on
    random corpora: same segmentation, same corpus-frequency filter, same
    ordered reassembly — including empty docs and all-boilerplate docs."""
    from collections import Counter

    from realparse_spark.operators.pipeline_ops import remove_duplicated_segments

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_segments, r.n_kept, r.text_clean)
        for r in remove_duplicated_segments(
            docs, seg_tokens=4, dup_threshold=threshold
        ).collect()
    }
    segs_by_doc = {}
    freq = Counter()
    for doc_id, text in enumerate(texts):
        toks = [t for t in text.split(" ") if t]
        segs = [" ".join(toks[i : i + 4]) for i in range(0, len(toks), 4)]
        segs_by_doc[doc_id] = segs
        freq.update(segs)
    for doc_id, segs in segs_by_doc.items():
        if not segs:
            assert doc_id not in got  # zero-token docs emit no lines
            continue
        kept = [s for s in segs if freq[s] < threshold]
        assert got[doc_id] == (len(segs), len(kept), " ".join(kept)), (
            doc_id,
            segs,
        )


@settings(**_SETTINGS)
@given(
    chars=st.lists(st.integers(1, 300), min_size=1, max_size=40),
    budget=st.integers(50, 2000),
)
def test_token_budget_prefix_property(spark, chars, budget):
    """token_budget_take == take the md5-permutation prefix while the
    running char total stays within budget — for random doc sizes and
    budgets (single source, so the per-source rollup is one row or
    empty)."""
    import hashlib

    from realparse_spark.operators.pipeline_ops import token_budget_take

    docs = spark.createDataFrame(
        [(i, "s", n) for i, n in enumerate(chars)],
        "doc_id long, source string, n_chars long",
    )
    rows = token_budget_take(docs, budget=budget).collect()
    order = sorted(
        (hashlib.md5(f"mix:{i}".encode()).hexdigest(), i, n)
        for i, n in enumerate(chars)
    )
    c, n_docs, n_kept = 0, 0, 0
    for _, _, n in order:
        c += n
        if c > budget:
            break
        n_docs, n_kept = n_docs + 1, n_kept + n
    if n_docs == 0:
        assert rows == []
    else:
        assert len(rows) == 1
        assert (rows[0].n_docs, rows[0].n_chars_kept) == (n_docs, n_kept)


@settings(**_SETTINGS)
@given(
    mults=st.lists(st.integers(1, 9), min_size=1, max_size=8),
    n_words=st.integers(1, 12),
)
def test_soft_dedup_mass_conservation(spark, mults, n_words):
    """SoftDeDup invariant under ARBITRARY multiplicities: effective doc
    mass equals the number of distinct texts and effective token mass
    equals the distinct texts' token total — each up to the documented
    1e-6 truncation dust per group (floor(1e6/m)*m <= 1e6), never more,
    never negative."""
    from realparse_spark.operators.dedup import soft_dedup_weights

    rows = []
    doc_id = 0
    for gi, m in enumerate(mults):
        text = " ".join(f"g{gi}w{j}" for j in range(n_words))
        for _ in range(m):
            rows.append((doc_id, text, "en", "s", len(text)))
            doc_id += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    r = soft_dedup_weights(docs).collect()[0]
    n_groups = len(mults)
    dust = n_groups * 1e-6 * 9  # <= 9 micro-units lost per group at m<=9
    assert n_groups - dust <= r.eff_docs <= n_groups
    assert n_groups * n_words - dust * n_words <= r.eff_tokens <= n_groups * n_words
    assert r.n_docs == sum(mults)
    assert r.n_dup_docs == sum(m for m in mults if m > 1)


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="abcdef ", min_size=1, max_size=30), min_size=1, max_size=8
    ),
    offset=st.integers(0, 10**6),
)
def test_group_safe_split_is_docid_invariant(spark, texts, offset):
    """The leakage-safety foundation: split assignment is a pure
    function of the TEXT (its dup-group fingerprint), so remapping every
    doc_id must leave each split's group/doc/token tallies bit-identical
    — the property doc_id-keyed hash_split cannot have."""
    from realparse_spark.operators.pipeline_ops import group_safe_split

    def mk(ids_from: int):
        rows = [
            (ids_from + i, t, "en", "s", len(t)) for i, t in enumerate(texts)
        ]
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )

    a = sorted(map(tuple, group_safe_split(mk(0)).collect()))
    b = sorted(map(tuple, group_safe_split(mk(offset)).collect()))
    assert a == b
