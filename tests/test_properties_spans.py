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
