"""Property test: dup_span_report vs a brute-force Python reference on
random small corpora — guards the island-merge arithmetic against shapes
the hand-written fixtures and the (dup-sparse) sf fixtures never hit:
dense self-overlap, whole-corpus duplication, repeated single tokens.
Examples are batched into one DataFrame per hypothesis example to keep
Spark job counts sane."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realparse_spark.operators.spans import dup_span_report

K = 3

# tiny alphabet so random docs actually share/repeat k-grams
word_st = st.sampled_from(["aa", "bb", "cc", "dd"])
doc_st = st.lists(word_st, min_size=0, max_size=12).map(" ".join)
corpus_st = st.lists(doc_st, min_size=1, max_size=6)


def _brute_force(texts: list[str], k: int) -> dict[int, tuple[int, int, int]]:
    toks = {i + 1: t.lower().split() for i, t in enumerate(texts)}
    from collections import Counter

    occ = Counter(
        tuple(tk[i : i + k])
        for tk in toks.values()
        for i in range(len(tk) - k + 1)
    )
    out: dict[int, tuple[int, int, int]] = {}
    for doc_id, tk in toks.items():
        covered = set()
        for i in range(len(tk) - k + 1):
            if occ[tuple(tk[i : i + k])] >= 2:
                covered.update(range(i, i + k))
        if not covered:
            continue
        # maximal spans = runs of consecutive covered positions
        spans = 1 + sum(
            1
            for a, b in zip(sorted(covered), sorted(covered)[1:])
            if b > a + 1
        )
        out[doc_id] = (spans, len(covered), len(tk))
    return out


@given(corpus=corpus_st)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_dup_span_report_matches_brute_force(spark, corpus):
    rows = [
        (i + 1, t, "en", "s", len(t)) for i, t in enumerate(corpus)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    got = {
        r.doc_id: (r.n_spans, r.dup_tokens, r.n_tokens)
        for r in dup_span_report(docs, k=K).collect()
    }
    assert got == _brute_force(corpus, K)


# ---------------------------------------------------------------------------
# pinned-vocab BPE apply vs a pure-Python greedy reference
# ---------------------------------------------------------------------------

bpe_word_st = st.text(alphabet="theandiroqz", min_size=1, max_size=9)
bpe_corpus_st = st.lists(bpe_word_st, min_size=1, max_size=12)


def _py_apply_pinned(word: str, merges) -> int:
    """Sequential greedy left-to-right merge passes — the `_merge_fold`
    contract, independently re-implemented (and the semantics the
    DuckDB oracle's replace-trick must also reproduce)."""
    s = list(word)
    for left, right in merges:
        out = [s[0]]
        for x in s[1:]:
            if out[-1] == left and x == right:
                out[-1] = left + right
            else:
                out.append(x)
        s = out
    return len(s)


@given(words=bpe_corpus_st)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bpe_apply_pinned_matches_python_reference(spark, words):
    """bpe_apply_report over the pinned merge list must agree with the
    Python reference on subtoken totals for arbitrary words over the
    merge alphabet — pinning the fold semantics the BPE_APPLY_PINNED_SQL
    replace-trick equivalence argument rests on (chained merges, merges
    inside longer words, repeated adjacent pairs)."""
    from pyspark.sql import functions as F  # noqa: F401

    from realparse_spark.operators.spans import BPE_PINNED_MERGES, bpe_apply_report

    docs = spark.createDataFrame(
        [(i, "s", w) for i, w in enumerate(words)],
        "doc_id long, source string, text string",
    )
    out = bpe_apply_report(docs, BPE_PINNED_MERGES, word_filter=r"^[a-z]+$").collect()
    assert len(out) == 1
    r = out[0]
    exp_sub = sum(_py_apply_pinned(w, BPE_PINNED_MERGES) for w in words)
    exp_chr = sum(len(w) for w in words)
    assert (r.n_words, r.n_chars, r.n_subwords) == (len(words), exp_chr, exp_sub)
