"""Semantic gates for the corpus-quality operators (round-8 growth).

Exact-value parity vs DuckDB is covered for every oracle by
tests/test_oracle_parity.py; these tests pin the PROPERTIES the oracles
can't express — CDC edit locality, novelty of duplicated text, fence
behavior on planted outliers, and the Zipf fit on a known distribution.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from realparse_spark.operators.corpus_quality import (
    adaptive_length_filter,
    cdc_chunks,
    cdc_dup_report,
    ngram_novelty,
    pii_density,
    vocab_zipf_slope,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )


def _varied_text(n_words: int, salt: int = 0) -> str:
    # deterministic, high-entropy word stream (a repeated sentence has too
    # few distinct 5-gram hashes to ever hit a CDC boundary mask)
    return " ".join(f"w{(i * 7919 + salt * 104729) % 99991:05d}" for i in range(n_words))


def test_cdc_chunks_edit_locality(spark):
    """The CDC property fixed-width blocking lacks: inserting text near
    the front only disturbs chunks around the edit — the tail chunks
    keep identical hashes because boundaries are content-defined."""
    base = _varied_text(400)
    edited = "INSERTED PREFIX TEXT " + base
    df = _docs(
        spark,
        [(1, base, "en", "a", len(base)), (2, edited, "en", "a", len(edited))],
    )
    ch = cdc_chunks(df).collect()
    c1 = [r.chunk_md5 for r in ch if r.doc_id == 1]
    c2 = [r.chunk_md5 for r in ch if r.doc_id == 2]
    assert len(c1) > 5, "fixture long enough to produce several chunks"
    shared = set(c1) & set(c2)
    # everything after the edit realigns: the vast majority of doc 1's
    # distinct chunks reappear in doc 2
    assert len(shared) / len(set(c1)) >= 0.8, (len(shared), len(set(c1)))


def _cdc_ref_chunks(text: str) -> list[str]:
    """Pure-Python CDC reference: same normalization, rolling hash,
    boundary mask and md5 chunk ids as cdc_chunks."""
    import hashlib

    from realparse_spark.operators.corpus_quality import CDC_K, CDC_MASK
    from realparse_spark.operators.text import WINNOW_B, WINNOW_P

    norm = "".join(c for c in text.lower() if c.isascii() and c.isalnum())
    if not norm:
        return []
    codes = [ord(c) for c in norm]
    hs = []
    if len(codes) >= CDC_K:
        for i in range(len(codes) - CDC_K + 1):
            h = codes[i]
            for j in range(1, CDC_K):
                h = (h * WINNOW_B + codes[i + j]) % WINNOW_P
            hs.append(h)
    ends = sorted(
        {i + CDC_K for i, h in enumerate(hs) if h % CDC_MASK == 0} | {len(norm)}
    )
    starts = [1] + [e + 1 for e in ends[:-1]]
    return [
        hashlib.md5(norm[s - 1 : e].encode()).hexdigest()
        for s, e in zip(starts, ends)
    ]


def test_cdc_chunks_match_reference_and_cover_exactly(spark):
    """Chunk-for-chunk parity with an independent Python implementation
    (order-insensitive, multiplicity-sensitive) — pins exact coverage:
    any boundary off-by-one drops/duplicates a char and changes an md5."""
    from collections import Counter

    texts = [
        _varied_text(200),
        _varied_text(80, salt=4),
        "Hello, World! " * 30,
        "short",       # norm len 5 == CDC_K
        "Hi!",         # norm len 2 < CDC_K: single whole-string chunk
        "a",           # norm len 1
        "?!,.",        # norm empty: no chunks at all
    ]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    got = cdc_chunks(_docs(spark, rows)).collect()
    by_doc: dict[int, Counter] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, Counter())[r.chunk_md5] += 1
    for i, t in enumerate(texts):
        expect = Counter(_cdc_ref_chunks(t))
        assert by_doc.get(i, Counter()) == expect, (i, t[:30])


def test_cdc_dup_report_flags_shared_paragraph(spark):
    shared = _varied_text(300, salt=1)
    only1 = _varied_text(300, salt=2)
    only2 = _varied_text(300, salt=3)
    df = _docs(
        spark,
        [
            (1, only1 + shared, "en", "s1", 10),
            (2, only2 + shared, "en", "s2", 10),
        ],
    )
    rep = {r.source: r for r in cdc_dup_report(cdc_chunks(df)).collect()}
    assert rep["s1"].n_dup > 0 and rep["s2"].n_dup > 0
    assert 0 < rep["s1"].dup_ratio < 1


def test_ngram_novelty_duplicate_doc_scores_zero(spark):
    txt = "alpha beta gamma delta epsilon zeta eta theta"
    df = _docs(
        spark,
        [(1, txt, "en", "a", 1), (2, txt, "en", "a", 1), (3, "new words entirely fresh", "en", "a", 1)],
    )
    rows = {r.doc_id: r for r in ngram_novelty(df).collect()}
    assert rows[1].novelty == 1.0  # first occurrence of everything
    assert rows[2].novelty == 0.0  # verbatim duplicate contributes nothing
    assert rows[3].novelty == 1.0


def test_adaptive_length_filter_drops_planted_outlier(spark):
    rows = [(i, "x", "en", "s", 100 + i) for i in range(20)]
    rows.append((99, "x", "en", "s", 100000))  # the outlier
    df = _docs(spark, rows)
    rep = adaptive_length_filter(df).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r.n_dropped == 1 and r.n_kept == 20
    assert r.q1 >= 100 and r.q3 <= 120 and r.hi < 100000


def test_adaptive_length_filter_single_doc_source(spark):
    df = _docs(spark, [(1, "x", "en", "solo", 42)])
    r = adaptive_length_filter(df).collect()[0]
    assert (r.q1, r.q3, r.n_kept, r.n_dropped) == (42, 42, 1, 0)


def test_vocab_zipf_slope_recovers_planted_exponent(spark):
    """A corpus whose term frequencies are exactly freq(r) = C / r must
    fit slope -1 (up to rounding on the discrete frequencies)."""
    rows = []
    doc = 0
    for r in range(1, 201):
        freq = max(1, round(2000 / r))
        # term 'tNNN' repeated freq times, spread over a few docs
        text = " ".join([f"t{r:03d}"] * freq)
        rows.append((doc, text, "en", "zipf", len(text)))
        doc += 1
    df = _docs(spark, rows)
    got = vocab_zipf_slope(df, top_n=150).collect()[0]
    assert got.n_terms == 150
    assert math.isclose(got.zipf_slope, -1.0, abs_tol=0.05), got.zipf_slope


def test_pii_density_counts_planted_pii(spark):
    df = _docs(
        spark,
        [
            (1, "reach me at bob@example.com or 555-1234 thanks", "en", "dirty", 47),
            (2, "nothing sensitive here at all", "en", "clean", 29),
        ],
    )
    rep = {r.source: r for r in pii_density(df).collect()}
    assert rep["dirty"].docs_with_pii == 1 and rep["dirty"].total_pii == 2
    assert rep["clean"].docs_with_pii == 0 and rep["clean"].total_pii == 0
    assert rep["dirty"].avg_density_kb == pytest.approx(2 * 1000 / 47, abs=1e-3)


def test_quality_filter_rules_fire_individually(spark):
    """Each rule must fire on a document constructed to violate exactly
    that rule (and the clean doc must pass all five)."""
    from realparse_spark.operators.corpus_quality import quality_filter_report

    stop_pad = "the and of to in is that for with on"  # 10 stopwords
    # word lengths chosen so mean_word_len sits inside [3, 10] except for
    # the longwords doc (the fixture that must trip that one rule)
    clean = (stop_pad + " ") * 3 + " ".join(f"word{i:02d}" for i in range(30))
    short = stop_pad + " word1 word2"  # 12 tokens < 25, stopword-rich
    repeat = (
        (stop_pad + " ") * 2
        + ("dupdup " * 40)
        + " ".join(f"word{i:02d}" for i in range(8))
    )
    # bigram spam without tripping dup-word: one hot PAIR inside
    # otherwise-distinct tokens (16/111 = 0.144 > 0.125; dup 0.446 < 0.55)
    bigram = (
        (stop_pad + " ") * 3
        + ("hotly paired " * 16)
        + " ".join(f"unique{i:02d}" for i in range(50))
    )
    longwords = (stop_pad + " ") * 3 + " ".join(
        "x" * 40 + str(i) for i in range(30)
    )
    nostop = " ".join(f"vword{i:02d}" for i in range(60))

    rows = [
        (1, clean, "en", "s", len(clean)),
        (2, short, "en", "s", len(short)),
        (3, repeat, "en", "s", len(repeat)),
        (4, bigram, "en", "s", len(bigram)),
        (5, longwords, "en", "s", len(longwords)),
        (6, nostop, "en", "s", len(nostop)),
    ]
    r = quality_filter_report(_docs(spark, rows)).collect()[0]
    assert r.n_docs == 6
    assert r.n_kept == 1  # only the clean doc
    assert r.r_short == 1
    assert r.r_repeat == 1  # the dupdup doc (also fires r_bigram — counted, not short-circuited)
    assert r.r_bigram == 2  # the hot-pair doc + the dupdup run
    assert r.r_wordlen == 1  # only the 40-char-word doc
    assert r.r_stopword == 1  # only the no-stopword doc


def test_source_overlap_matrix_mirror_and_disjoint(spark):
    """Planted mirror: source 'mir' carries exact copies of source
    'orig' docs, so containment in the mir direction must be 1.0; a
    character-disjoint source shares nothing.  Counts are checked
    directionally — the matrix's reason to exist is telling WHICH side
    is the subset."""
    from pyspark.sql import functions as F

    from realparse_spark.operators.text import (
        source_overlap_matrix,
        winnow_fingerprints,
    )

    orig = [
        (i, f"the quick brown fox number {i} jumps over the lazy dog", "en", "orig", 50)
        for i in range(10)
    ]
    # mirror copies HALF of orig's docs verbatim (subset relation)
    mirror = [
        (100 + i, orig[i][1], "en", "mir", 50) for i in range(5)
    ]
    disjoint = [
        (200 + i, "0123456789" * 5 + str(i), "en", "zzz", 55) for i in range(5)
    ]
    docs = spark.createDataFrame(
        orig + mirror + disjoint,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    fps = winnow_fingerprints(docs)
    out = {(r.source_a, r.source_b): r for r in source_overlap_matrix(fps, docs).collect()}
    m = out[("mir", "orig")]
    # every mir fingerprint exists in orig -> containment 1.0 on the mir side
    assert m.contain_a == 1.0
    assert m.n_shared == m.n_fps_a <= m.n_fps_b
    # digits-only source vs letters-heavy orig: no shared fingerprints
    # means the pair row is absent entirely (inner join on shared fps)
    assert ("orig", "zzz") not in out or out[("orig", "zzz")].n_shared == 0


def test_language_confusion_planted_diagonal(spark):
    """Planted pure-language documents: each must land on the confusion
    diagonal, a stopword-free doc lands in 'und', and within-truth
    shares sum to ~1e6 ppm per truth row."""
    import os
    import tempfile

    from realparse_spark.operators.text import q_doc_language_confusion

    rows = [
        (1, "the cat and the dog of the house is that for with on", "en", "s", 50),
        (2, "el perro y la casa de que un por con los", "es", "s", 40),
        (3, "der hund und das haus von zu mit den ist im", "de", "s", 43),
        (4, "qwzx bnmp vcxz qqq", "xx", "s", 18),  # no stopwords -> und
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        out = q_doc_language_confusion(spark, td).collect()
    cells = {(r.truth, r.pred_lang): r for r in out}
    assert cells[("en", "en")].n_docs == 1
    assert cells[("es", "es")].n_docs == 1
    assert cells[("de", "de")].n_docs == 1
    assert cells[("xx", "und")].n_docs == 1
    bytruth = {}
    for r in out:
        bytruth[r.truth] = bytruth.get(r.truth, 0) + r.share_ppm
    # integral division floors, so each truth row sums to (1e6 - cells)..1e6
    assert all(1_000_000 - 4 <= v <= 1_000_000 for v in bytruth.values())


def test_corpus_datasheet_planted_composition(spark):
    """Planted source with known composition: 2 langs, one duplicated
    pair (2 of 4 docs in dup groups), one junk doc failing the keep
    rules — the datasheet must report each number exactly."""
    import os
    import tempfile

    from realparse_spark.operators.corpus_quality import q_corpus_datasheet

    rows = [
        (1, "alpha beta gamma delta epsilon tokens here", "en", "s", 43),
        (2, "alpha beta gamma delta epsilon tokens here", "en", "s", 43),  # dup of 1
        (3, "palabras distintas para el documento tres aqui", "es", "s", 46),
        (4, "!!! ??? ***", "en", "s", 11),  # fails token floor + punct ceiling
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        r = q_corpus_datasheet(spark, td).collect()[0]
    assert r.n_docs == 4 and r.n_langs == 2
    assert r.dup_ppm == 2 * 1_000_000 // 4
    assert r.keep_ppm == 3 * 1_000_000 // 4
    assert r.n_tokens == 7 + 7 + 7 + 3
    assert r.mean_doc_tokens == (7 + 7 + 7 + 3) // 4


def test_readability_report_orders_by_formula(spark):
    """Flesch proxy sanity: a many-short-sentence low-syllable corpus
    scores HIGHER than a one-sentence polysyllabic one, groups
    partition the corpus, and min <= mean <= max per group."""
    from realparse_spark.operators.text import readability_report

    easy = "the cat sat. the dog ran. it is fun. we go now."
    hard = (
        "extraordinary computational infrastructure necessitates "
        "sophisticated organizational methodologies continuously"
    )
    docs = spark.createDataFrame(
        [(1, easy, "easy"), (2, hard, "hard"), (3, easy, "easy")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in readability_report(docs).collect()}
    assert out["easy"].n_docs == 2 and out["hard"].n_docs == 1
    assert out["easy"].mean_flesch > out["hard"].mean_flesch
    for r in out.values():
        assert r.min_flesch <= r.mean_flesch <= r.max_flesch
        assert 0 <= r.n_easy <= r.n_docs
    assert out["easy"].n_easy == 2 and out["hard"].n_easy == 0


def test_nb_langid_separable_corpus_is_diagonal(spark):
    """On a corpus whose languages use disjoint vocabularies, the
    trained NB classifier must classify every held-out doc correctly
    (diagonal confusion matrix) and account for every test doc —
    including a test doc whose tokens are all train-OOV (it still gets
    a prior-only prediction, never silently dropped)."""
    from realparse_spark.operators.text import nb_langid_confusion

    rows = []
    vocab = {"aa": "alpha beta gamma", "bb": "uno dos tres", "cc": "eins zwei drei"}
    i = 0
    for lang, words in vocab.items():
        for _ in range(10):
            rows.append((i, f"{words} {words}", lang))
            i += 1
    # doc 30 is held out (30 % 5 == 0) and fully OOV w.r.t. the train split
    rows.append((30, "zzz yyy xxx", "aa"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = nb_langid_confusion(docs).collect()
    n_test = sum(1 for r in rows if r[0] % 5 == 0)
    assert sum(r.n_docs for r in out) == n_test
    off_diag = [r for r in out if r.lang != r.pred_lang]
    # the OOV doc is prior-only: priors are equal (10/10/10 per class),
    # so the tie-break predicts the lexicographically first class 'aa' —
    # which IS its true lang; everything else is vocabulary-separable
    assert off_diag == []
