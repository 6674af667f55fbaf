"""Semantic gates for the duplicate-span / BPE operators (round-9 growth).

Exact-value parity vs DuckDB for doc_dup_spans / dup_span_profile /
mannwhitney_u is covered by tests/test_oracle_parity.py; these pin what
the oracles can't express — hand-computed span-merge semantics (overlap,
adjacency, within-doc repeats, short docs), the iterative BPE trainer
against a pure-Python reference, and Mann-Whitney U against its
pairwise DEFINITION (not the rank formula both engines share).
"""

from __future__ import annotations

import duckdb

from realparse_spark.operators.inference import mann_whitney_u
from realparse_spark.operators.spans import bpe_train, dup_span_report

from tests.conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )


def _report(spark, texts, k):
    rows = [(i + 1, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    out = dup_span_report(_docs(spark, rows), k=k).collect()
    return {r.doc_id: (r.n_spans, r.dup_tokens, r.n_tokens, r.dup_frac) for r in out}


def test_dup_span_overlap_merge(spark):
    """Three consecutive shared 3-grams merge into ONE maximal span on
    both sides; unique docs and sub-k docs emit no rows."""
    got = _report(
        spark,
        [
            "a b c d e f g h",  # shares a-b-c-d-e with doc 2
            "x y a b c d e q",
            "u1 u2 u3 u4 u5 u6",  # unique — no dup grams
            "z z",  # shorter than k — no grams at all
        ],
        k=3,
    )
    # doc 1: hits at pos 0,1,2 -> one span [0,5)
    assert got[1] == (1, 5, 8, 0.625)
    # doc 2: hits at pos 2,3,4 -> one span [2,7)
    assert got[2] == (1, 5, 8, 0.625)
    assert 3 not in got and 4 not in got


def test_dup_span_adjacency_merges_gap_splits(spark):
    """Hits at pos 0 and pos k are ADJACENT ([0,k) touches [k,2k)) and
    must fuse; a one-token gap must split into two spans."""
    got = _report(
        spark,
        [
            "a b c d e f",  # grams: a-b-c(0) dup, b-c-d, c-d-e unique, d-e-f(3) dup
            "a b c zz1 zz2 d e f",  # a-b-c at 0, d-e-f at 5 — gap -> 2 spans
        ],
        k=3,
    )
    assert got[1] == (1, 6, 6, 1.0)  # pos 0 and 3 adjacent -> [0,6)
    assert got[2] == (2, 6, 8, 0.75)  # [0,3) + [5,8)


def test_dup_span_within_document_repeat(spark):
    """A gram repeated INSIDE one document counts as duplicated (the
    ExactSubstr semantics): 'm'×5 has gram m-m-m at pos 0,1,2 (occ 3)."""
    got = _report(spark, ["m m m m m", "n1 n2 n3 n4"], k=3)
    assert got[1] == (1, 5, 5, 1.0)
    assert 2 not in got


def _py_bpe(words: dict[str, int], n_merges: int):
    """Reference BPE: greedy left-to-right merge, ties broken by
    (count desc, pair lexicographic asc) — the trainer's exact contract."""
    syms = {w: list(w) for w in words}
    merges = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, c in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + c
        if not counts:
            break
        (left, right), freq = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, left, right, freq))
        merged = left + right
        for w, s in syms.items():
            out = [s[0]]
            for x in s[1:]:
                if out[-1] == left and x == right:
                    out[-1] = merged
                else:
                    out.append(x)
            syms[w] = out
    return merges


def test_bpe_train_matches_python_reference(spark):
    """The distributed trainer must reproduce the pure-Python reference
    merge-for-merge on the real sf0.001 corpus (frequencies AND order)."""
    con = duckdb.connect()
    words = dict(
        con.execute(
            rf"""
            SELECT word, count(*) FROM (
              SELECT unnest(list_filter(
                string_split_regex(lower(text), '\s+'), t -> t <> '')) AS word
              FROM '{SF_DIR}/documents.parquet')
            WHERE regexp_full_match(word, '[a-z]+')
            GROUP BY word
            """
        ).fetchall()
    )
    con.close()
    expect = _py_bpe(words, 8)

    from realparse_spark.sources.tables import load_table

    got = [
        (r.step, r.left, r.right, r.pair_freq)
        for r in bpe_train(load_table(spark, SF_DIR, "documents"), 8).collect()
    ]
    assert got == expect


def test_bpe_merge_fold_greedy_on_runs(spark):
    """The fold-based merge must pair greedily left-to-right: merging
    (a,a) over 'aaaa' yields [aa, aa], never [aa, a, a] or [a, aa, a]."""
    docs = _docs(spark, [(1, "aaaa aaaa aaa", "en", "s", 13)])
    got = [(r.left, r.right, r.pair_freq) for r in bpe_train(docs, 2).collect()]
    # step 1: (a,a) freq = 3*2 + 1*2 = 8 adjacent pairs? counts are per
    # adjacent POSITION: 'aaaa' has 3, 'aaa' has 2 -> 2*3 + 1*2 = 8
    assert got[0] == ("a", "a", 8)
    # after merge: 'aaaa' -> [aa, aa] (pair (aa,aa) x2 words), 'aaa' -> [aa, a]
    assert got[1] == ("aa", "aa", 2)


def test_mannwhitney_matches_pairwise_definition(spark):
    """U from the rank formula must equal the DEFINITION
    U1 = #{(a,b): a>b} + 0.5·#{ties}, and z must match the closed form —
    computed here independently, not via ranks."""
    a = [1.0, 2.0, 2.0, 5.0, 7.5]
    b = [2.0, 3.0, 0.5, 2.0]
    rows = [(i, "purchase", v) for i, v in enumerate(a)] + [
        (100 + i, "click", v) for i, v in enumerate(b)
    ]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = mann_whitney_u(ev).collect()[0]

    u1 = sum(
        1.0 if x > y else (0.5 if x == y else 0.0) for x in a for y in b
    )
    n1, n2 = len(a), len(b)
    n = n1 + n2
    from collections import Counter

    tsum = sum(t**3 - t for t in Counter(a + b).values())
    mu = n1 * n2 / 2.0
    var = (n1 * n2 / 12.0) * ((n + 1) - tsum / (n * (n - 1)))
    z = round((u1 - mu) / var**0.5, 4)

    assert (got.n1, got.n2) == (n1, n2)
    assert got.u_stat == u1
    assert got.z_score == z


def test_bpe_apply_matches_python_segmentation(spark):
    """The chained merge-fold segmentation must reproduce the pure-Python
    apply (same greedy contract as the trainer) aggregated per source on
    the real sf0.001 corpus."""
    from collections import defaultdict

    from realparse_spark.operators.spans import bpe_apply_report, bpe_train
    from realparse_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    merges = [(r.left, r.right) for r in bpe_train(docs, 8).collect()]

    def segment(word: str) -> int:
        s = list(word)
        for left, right in merges:
            if len(s) < 2:
                break
            out = [s[0]]
            for x in s[1:]:
                if out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            s = out
        return len(s)

    con = duckdb.connect()
    rows = con.execute(
        rf"""
        SELECT source, word, count(*) FROM (
          SELECT source, unnest(list_filter(
            string_split_regex(lower(text), '\s+'), t -> t <> '')) AS word
          FROM '{SF_DIR}/documents.parquet')
        GROUP BY source, word
        """
    ).fetchall()
    con.close()
    expect: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
    for source, word, wc in rows:
        e = expect[source]
        e[0] += wc
        e[1] += wc * len(word)
        e[2] += wc * segment(word)

    got = {
        r.source: (r.n_words, r.n_chars, r.n_subwords, r.chars_per_token)
        for r in bpe_apply_report(docs, merges).collect()
    }
    assert set(got) == set(expect)
    for source, (nw, nc, ns) in expect.items():
        assert got[source] == (nw, nc, ns, round(nc / ns, 4)), source


def test_mannwhitney_degenerate_yields_null_z(spark):
    """All-identical values: tie-corrected variance is exactly zero; the
    z must be NULL, never an Inf/NaN whose hashing differs across
    engines (the trend_slopes degenerate-guard discipline)."""
    rows = [(i, "purchase", 5.0) for i in range(4)] + [
        (100 + i, "click", 5.0) for i in range(3)
    ]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = mann_whitney_u(ev).collect()[0]
    assert (got.n1, got.n2) == (4, 3)
    assert got.u_stat == 6.0  # all ties: U1 = n1*n2/2
    assert got.z_score is None


def test_span_clip_keeps_corpus_first_occurrence(spark):
    """The clip accounting must charge a token only when NO kept (first)
    occurrence covers it: doc 1 keeps its tokens, doc 2 loses the whole
    shared span; a self-overlapping within-doc run loses only the tail
    its kept first gram does not cover."""
    from realparse_spark.operators.spans import dup_span_clip

    rows = [
        (1, "a b c d e", "en", "s1", 9),      # owns gram a-b-c (pos 0) first
        (2, "x a b c y", "en", "s2", 9),      # same gram at pos 1 -> clipped
        (3, "m m m m", "en", "s3", 7),        # m-m-m at pos 0 (kept), 1 (clipped)
    ]
    out = {
        r.source: (r.n_docs, r.docs_clipped, r.clip_tokens, r.total_tokens)
        for r in dup_span_clip(_docs(spark, rows), k=3).collect()
    }
    assert out["s1"] == (1, 0, 0, 5)   # first occurrence: nothing clipped
    assert out["s2"] == (1, 1, 3, 5)   # positions {1,2,3} covered only clipped
    # within-doc self-overlap: kept [0,3) covers {0,1,2}; the clipped hit
    # at pos 1 covers {1,2,3} -> only token 3 is actually removable
    assert out["s3"] == (1, 1, 1, 4)


def test_winsorize_ignores_extreme_outlier(spark):
    """One absurd outlier must not move the winsorized mean: clamping at
    the p95 order statistic caps its contribution."""
    from pyspark.sql import functions as F

    from realparse_spark.operators.analytics import winsorize_values

    vals = [float(v) for v in range(1, 100)] + [1_000_000.0]
    rows = [(i, "t", v) for i, v in enumerate(vals)]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    r = winsorize_values(ev).collect()[0]
    assert r.n_events == 100
    assert r.p05 == 5.0 and r.p95 == 95.0  # ceil(100*.05)=5th, ceil(100*.95)=95th
    # clamped series: [5,5,5,5,5,6..94,95,95,95,95,95,95]
    clamped = [min(max(v, 5.0), 95.0) for v in vals]
    assert r.winsorized_mean == round(sum(clamped) / 100, 4)


def test_bpe_apply_pinned_merge_chaining(spark):
    """Pinned-vocab apply semantics, by hand: chained merges collapse
    'the'/'and' to one subtoken ('t'+'h' then 'th'+'e'), a merged symbol
    does not re-split ('ther' -> [the, r], never e+r inside), unmergeable
    words stay at char count, and non-alphabetic tokens are filtered."""
    from realparse_spark.operators.spans import BPE_PINNED_MERGES, bpe_apply_report

    docs = spark.createDataFrame(
        [(1, "s1", "the and zzz the ou!ch"), (2, "s2", "ther")],
        "doc_id long, source string, text string",
    )
    out = {
        r.source: r
        for r in bpe_apply_report(
            docs, BPE_PINNED_MERGES, word_filter=r"^[a-z]+$"
        ).collect()
    }
    s1 = out["s1"]
    assert (s1.n_words, s1.n_chars, s1.n_subwords) == (4, 12, 6)
    assert s1.chars_per_token == 2.0
    s2 = out["s2"]
    assert (s2.n_words, s2.n_chars, s2.n_subwords) == (1, 4, 2)
