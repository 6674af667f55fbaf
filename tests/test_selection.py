"""Behavioral gates for the selection family (selection.py) — the oracle
parity itself runs in test_oracle_parity.py like every registered query;
these pin the semantics the oracle can't see."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from realparse_spark.operators.selection import (
    SEMDEDUP_TAU,
    ccnet_ppl_buckets,
    dsir_importance,
    q_semdedup,
    semdedup,
)
from realparse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_dsir_target_scores_above_raw(spark):
    """The whole point of importance weights: target-domain documents
    must score higher on average than the raw pool (they ARE the target
    distribution the ratio was fit to)."""
    docs = load_table(spark, SF, "documents")
    scored = dsir_importance(docs)
    rows = scored.groupBy(F.col("source") == "src0").agg(
        F.avg("score").alias("m")
    ).collect()
    means = {r[0]: r[1] for r in rows}
    # clear separation, not just ordering: the gap is the signal
    # resampling uses (add-1 smoothing over 5% target mass biases both
    # means slightly negative, so sign itself is not meaningful)
    assert means[True] > means[False] + 0.1


def test_dsir_edit_response(spark):
    """Against a FROZEN ratio table (the production fit/score split),
    injecting target-domain text into a raw document must raise that
    document's importance score — the edit-response property resampling
    relies on.  (Self-refitting on the edited corpus would confound the
    test: the injected occurrences inflate the raw counts of exactly the
    injected features.)"""
    from realparse_spark.operators.selection import dsir_fit, dsir_score

    docs = load_table(spark, SF, "documents")
    ratio = dsir_fit(docs)
    target_text = (
        docs.filter(F.col("source") == "src0")
        .select(F.concat_ws(" ", F.collect_list("text")).alias("t"))
        .collect()[0][0]
    )
    probe_src = "src1"
    base = {
        r.doc_id: r.score
        for r in dsir_score(docs, ratio).filter(F.col("source") == probe_src).collect()
    }
    edited = docs.withColumn(
        "text",
        F.when(
            F.col("source") == probe_src,
            F.concat(F.col("text"), F.lit(" " + target_text[:2000])),
        ).otherwise(F.col("text")),
    )
    after = {
        r.doc_id: r.score
        for r in dsir_score(edited, ratio)
        .filter(F.col("source") == probe_src)
        .collect()
    }
    common = set(base) & set(after)
    assert len(common) >= 20
    raised = sum(1 for d in common if after[d] > base[d])
    assert raised >= 0.9 * len(common), (raised, len(common))


def test_dsir_deterministic(spark):
    docs = load_table(spark, SF, "documents")
    a = sorted(map(tuple, dsir_importance(docs).collect()))
    b = sorted(map(tuple, dsir_importance(docs).collect()))
    assert a == b


def test_dsir_resample_biased_and_deterministic(spark):
    """Gumbel-top-k must (a) bias the sample toward high scores — the
    sample's mean score exceeds the corpus mean — and (b) reproduce the
    identical sample on re-run (deterministic md5 Gumbel draws)."""
    from realparse_spark.operators.selection import dsir_importance, dsir_resample

    docs = load_table(spark, SF, "documents")
    scored = dsir_importance(docs)
    s1 = dsir_resample(scored, n=100).collect()
    s2 = dsir_resample(scored, n=100).collect()
    assert sorted(r.doc_id for r in s1) == sorted(r.doc_id for r in s2)
    # exp(score) weighting must not collapse to argmax: the sample is
    # stochastic-shaped, so it cannot be exactly the top-100 by score
    top100 = {
        r.doc_id
        for r in scored.orderBy(F.col("score").desc(), "doc_id").limit(100).collect()
    }
    assert {r.doc_id for r in s1} != top100
    # bias mechanism, on controlled scores (the fixture's ~0.45 score
    # spread is below the Gumbel sigma ~1.28, so realized tilt there is
    # legitimately ~0): docs at score 3 carry e^3 ~ 20x the weight of
    # docs at score 0 and must dominate the sample
    synth = spark.createDataFrame(
        [(i, "hi" if i < 200 else "lo", 3.0 if i < 200 else 0.0) for i in range(500)],
        "doc_id long, source string, score double",
    )
    picked = dsir_resample(synth, n=100).collect()
    n_hi = sum(1 for r in picked if r.source == "hi")
    assert n_hi >= 80, n_hi


def test_semdedup_counts_consistent(spark):
    """n_dropped <= n_dup_pairs (each pair names one loser), n_kept +
    n_dropped == n_vecs, and every vector lands in exactly one cluster."""
    emb = load_table(spark, SF, "embeddings")
    out = semdedup(emb).collect()
    assert sum(r.n_vecs for r in out) == emb.count()
    for r in out:
        assert r.n_kept + r.n_dropped == r.n_vecs
        assert r.n_dropped <= r.n_dup_pairs or r.n_dup_pairs == 0
        assert r.n_dropped <= max(r.n_vecs - 1, 0)


def test_semdedup_keep_rule_planted(spark):
    """Planted near-identical pair: the member CLOSER to the cluster
    centroid must be the one dropped, the farther one kept (SemDeDup's
    keep-the-extremes rule) — asserted by LOSER IDENTITY via the
    semdedup_pairs seam, not by counts (counts stay green under an
    inverted rule)."""
    from realparse_spark.operators.selection import (
        _assign_and_score,
        semdedup_pairs,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.30], 0),
        (2, [1.0, 0.0, 0.0, 0.28], 0),  # near-dup of 1
        (3, [1.0, 0.0, 0.0, 0.29], 0),  # centroid anchor ~ vec 2's direction
        (4, [0.0, 1.0, 0.0, 0.0], 1),
        (5, [0.0, 0.0, 1.0, 0.0], 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    scored = _assign_and_score(emb)
    cc = {r.vec_id: r.cent_cos for r in scored.collect()}
    pairs = semdedup_pairs(scored, tau=0.99).collect()
    assert pairs, "planted near-dups produced no pair"
    for p in pairs:
        expected = p.vec_a if cc[p.vec_a] > cc[p.vec_b] else p.vec_b
        assert p.loser == expected, (p, cc[p.vec_a], cc[p.vec_b])
        # and the kept member is at least as far from the centroid
        kept = p.vec_b if p.loser == p.vec_a else p.vec_a
        assert cc[kept] <= cc[p.loser]
    # the aggregate view stays consistent with the pair-level drops
    out = {r.cluster_id: r for r in semdedup(emb, tau=0.99).collect()}
    c0 = out[0]
    losers = {p.loser for p in pairs if p.cluster_id == 0}
    assert c0.n_dropped == len(losers)
    assert c0.n_kept == c0.n_vecs - len(losers)


def test_semdedup_hot_cluster_star_pairs(spark):
    """Adversarial skew (the test_scale.py skew-fixture discipline): one
    cluster owns well over half the corpus as near-identical vectors.
    Above max_cluster the pair join must emit O(B) STAR pairs against
    the hub — never B²/2 — while (a) every spoke near the hub is still
    reported, (b) losers follow the keep rule, and (c) clusters below
    the cap keep exact all-pairs semantics."""
    from realparse_spark.operators.selection import (
        _assign_and_score,
        semdedup_pairs,
    )

    B = 40
    # hot cluster: B near-identical vectors (tiny deterministic jitter
    # keeps cent_cos distinct so the hub choice is meaningful)
    rows = [
        (i, [1.0, 0.0, 0.0, 0.001 * (i % 7)], 0) for i in range(1, B + 1)
    ]
    # a small control cluster with a planted near-dup pair
    rows += [
        (101, [0.0, 1.0, 0.0, 0.30], 1),
        (102, [0.0, 1.0, 0.0, 0.29], 1),
        (103, [0.0, 0.0, 1.0, 0.0], 2),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    scored = _assign_and_score(emb).cache()
    cc = {r.vec_id: (r.cluster_id, r.cent_cos) for r in scored.collect()}
    hot_ids = [v for v, (c, _) in cc.items() if c == 0]
    hub = max(hot_ids, key=lambda v: (cc[v][1], -v))

    capped = semdedup_pairs(scored, tau=0.99, max_cluster=10).collect()
    hot_pairs = [p for p in capped if p.cluster_id == 0]
    # O(B): every hot pair touches the hub; near-identical spokes all pair
    assert 0 < len(hot_pairs) <= B - 1
    for p in hot_pairs:
        assert hub in (p.vec_a, p.vec_b), (p, hub)
        # star pairs: the SPOKE loses, the hub is the canonical keeper
        # (round-10 ADVICE: hub-loses collapsed n_dropped to ~1)
        spoke = p.vec_b if p.vec_a == hub else p.vec_a
        assert p.loser == spoke and p.loser != hub
    # the cap must not disable dedup: every near-identical spoke drops,
    # so n_dropped == number of distinct spokes reported — B-1 here
    assert len({p.loser for p in hot_pairs}) == len(hot_pairs) == B - 1
    # clusters below the cap are untouched: exact all-pairs parity with
    # the uncapped run
    ctl_capped = sorted(
        (p.vec_a, p.vec_b, p.loser) for p in capped if p.cluster_id != 0
    )
    uncapped = semdedup_pairs(scored, tau=0.99).collect()
    ctl_uncapped = sorted(
        (p.vec_a, p.vec_b, p.loser) for p in uncapped if p.cluster_id != 0
    )
    assert ctl_capped == ctl_uncapped and (101, 102, 102) in ctl_capped
    # and the uncapped hot cluster really is quadratic — the cap earns
    # its keep (near-identical members: all pairs clear tau)
    assert len([p for p in uncapped if p.cluster_id == 0]) > 10 * len(hot_pairs)
    scored.unpersist()


def test_semdedup_tau_monotone(spark):
    """Raising tau can only shrink the dup set."""
    emb = load_table(spark, SF, "embeddings")
    lo = sum(r.n_dup_pairs for r in semdedup(emb, tau=SEMDEDUP_TAU).collect())
    hi = sum(r.n_dup_pairs for r in semdedup(emb, tau=0.9).collect())
    assert hi <= lo


def test_ccnet_buckets_partition_each_source(spark):
    """Per source: the three buckets cover every scored doc, tertile
    sizes differ by at most 1, and head's score range sits at or above
    tail's (head = best-scoring third)."""
    docs = load_table(spark, SF, "documents")
    out = ccnet_ppl_buckets(docs).collect()
    by_src: dict[str, dict[str, object]] = {}
    for r in out:
        by_src.setdefault(r.source, {})[r.bucket] = r
    for src, buckets in by_src.items():
        assert set(buckets) <= {"head", "middle", "tail"}
        sizes = [b.n_docs for b in buckets.values()]
        assert max(sizes) - min(sizes) <= 1, (src, sizes)
        if "head" in buckets and "tail" in buckets:
            assert buckets["head"].min_lp >= buckets["tail"].max_lp, src


def test_selection_plans_are_scale_clean(spark):
    """Module-specific pins beyond the blanket gate: dsir's top-K is a
    TakeOrdered (no global sort of the vocabulary), and semdedup's
    centroid join broadcasts (never a shuffled nested loop)."""
    from realparse_spark.operators.selection import (
        DSIR_TARGET_SOURCE,
        DSIR_TOP_K,
        _assign_and_score,
        _bigram_tf,
        _fit_topk,
        q_dsir_importance,
    )
    from realparse_spark.plans import explain as X

    # pre-checkpoint stage (the K-row topk materialization truncates it
    # from the full query plan — same split as _assign_and_score below)
    docs = load_table(spark, SF, "documents")
    plan0 = X.executed_plan(_fit_topk(_bigram_tf(docs), DSIR_TARGET_SOURCE, DSIR_TOP_K))
    assert "TakeOrderedAndProject" in plan0
    # the full query must not reintroduce a global sort of the vocabulary
    plan = X.executed_plan(q_dsir_importance(spark, SF))
    assert "rangepartitioning" not in plan
    # the assignment stage pre-checkpoint: centroid join must broadcast
    emb = load_table(spark, SF, "embeddings")
    plan2 = X.executed_plan(_assign_and_score(emb))
    assert "BroadcastNestedLoopJoin" in plan2 or "BroadcastHashJoin" in plan2
    assert "CartesianProduct" not in plan2
    # the full query may not reintroduce a cartesian after the checkpoint
    plan3 = X.executed_plan(q_semdedup(spark, SF))
    assert "CartesianProduct" not in plan3


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def test_kmeans_train_descends_and_recovers_planted_clusters(spark):
    """Lloyd's invariant: inertia is non-increasing in the iteration
    count; and on a corpus whose label prior is WRONG for half the
    points, three iterations recover the true geometry (every planted
    tight cluster ends as one k-means cluster)."""
    from realparse_spark.operators.selection import kmeans_train

    # two tight blobs, but labels deliberately mix them (the prior a
    # real corpus gives you: noisy)
    rows = []
    for i in range(20):
        rows.append((i, [10.0 + 0.01 * (i % 3), 0.0, 0.0, 0.0], i % 2))
    for i in range(20, 40):
        rows.append((i, [0.0, 10.0 + 0.01 * (i % 3), 0.0, 0.0], i % 2))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    one = kmeans_train(emb, iters=1).collect()
    three = kmeans_train(emb, iters=3).collect()
    assert sum(r.n_members for r in three) == 40
    assert sum(r.inertia for r in three) <= sum(r.inertia for r in one) + 1e-6
    # converged: two clusters of 20, each with tiny within-blob spread
    sizes = sorted(r.n_members for r in three)
    assert sizes == [20, 20]
    assert all(r.inertia < 1.0 for r in three)


def test_quality_classifier_distills_the_length_rule(spark):
    """GD invariants on a cleanly separable synthetic corpus: the
    entering loss strictly descends across steps (full-batch GD from
    w=0 with this lr), the learned length weight is NEGATIVE (more
    tokens -> lower junk probability; the label marks SHORT docs), and
    the trained scorer reproduces the heuristic gate it distills on the
    training docs."""
    import math

    from realparse_spark.operators.selection import (
        CLASSIFIER_SHORT_DOC,
        quality_classifier_train,
    )

    rows = [(i, "tok " * (10 + i % 5)) for i in range(30)]  # short -> y=1
    rows += [(100 + i, "tok " * (90 + i % 5)) for i in range(30)]  # long -> y=0
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string"
    )
    out = {r.step: r for r in quality_classifier_train(docs, steps=3).collect()}
    losses = [out[s].loss for s in (1, 2, 3)]
    assert losses[0] == round(math.log(2), 6)  # w=0 entering loss is ln 2
    assert losses == sorted(losses, reverse=True) and losses[2] < losses[0]
    w = out[3]
    assert w.w_len < 0
    # distillation check: sign(w.x) agrees with the rule on every doc
    for n_tok in (10, 14, 90, 94):
        z = w.w_bias + w.w_len * n_tok / 100.0 + w.w_diversity * (1.0 / n_tok)
        assert (z > 0) == (n_tok < CLASSIFIER_SHORT_DOC)


def test_classifier_calibration_tracks_the_label(spark):
    """On the separable corpus the calibration curve must be usable:
    bins partition the corpus, junk_rate is non-decreasing in bin index
    (higher predicted p -> more actual junk), and every Brier
    contribution is bounded by the worst-case 1.0."""
    from realparse_spark.operators.selection import classifier_calibration

    rows = [(i, ("tok " * (10 + i % 5)).strip()) for i in range(30)]
    rows += [(100 + i, ("tok " * (90 + i % 5)).strip()) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = classifier_calibration(docs).collect()
    assert sum(r.n_docs for r in out) == 60
    rates = [r.junk_rate for r in out]
    assert rates == sorted(rates)
    assert all(0.0 <= r.brier <= 1.0 for r in out)
    assert all(0.0 <= r.mean_p <= 1.0 for r in out)


def test_classifier_pr_curve_confusion_invariants(spark):
    """Operating-point sweep invariants on the separable corpus: the
    confusion quadrants partition the corpus at every threshold, tp+fn
    is the constant junk count, recall is non-increasing and fp
    non-increasing as the threshold rises, and a separable corpus has
    at least one perfect operating point (f1 = 1.0)."""
    from realparse_spark.operators.selection import classifier_pr_curve

    rows = [(i, ("tok " * (10 + i % 5)).strip()) for i in range(30)]
    rows += [(100 + i, ("tok " * (90 + i % 5)).strip()) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = classifier_pr_curve(docs).collect()
    assert [r.threshold for r in out] == [round(0.1 * i, 1) for i in range(1, 10)]
    for r in out:
        assert r.tp + r.fp + r.fn + r.tn == 60
        assert r.tp + r.fn == 30  # the junk class is threshold-free
        assert 0.0 <= r.precision <= 1.0 and 0.0 <= r.recall <= 1.0
    recalls = [r.recall for r in out]
    fps = [r.fp for r in out]
    assert recalls == sorted(recalls, reverse=True)
    assert fps == sorted(fps, reverse=True)
    assert any(r.f1 == 1.0 for r in out)


def test_pca_power_iter_recovers_planted_axis(spark):
    """Power iteration on a corpus whose variance lives on one planted
    axis must concentrate the component there: |pc1[axis]| ~ 1, every
    other loading ~ 0, the component is unit-norm, and the explained
    variance ratio is ~ 1.  Means must be exact."""
    from realparse_spark.operators.selection import pca_power_iter

    dim, axis = 8, 3
    rows = []
    for i in range(40):
        v = [0.01 * ((i * 7 + j) % 5 - 2) for j in range(dim)]  # tiny noise
        v[axis] = 5.0 if i % 2 == 0 else -5.0  # dominant +-5 swing
        rows.append((i, v, i % 3))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.pos: r for r in pca_power_iter(emb).collect()}
    assert len(out) == dim
    assert abs(abs(out[axis].pc1_c) - 1.0) < 1e-3
    for p, r in out.items():
        if p != axis:
            assert abs(r.pc1_c) < 0.05
    assert abs(sum(r.pc1_c**2 for r in out.values()) - 1.0) < 1e-3
    r0 = out[0]
    assert r0.explained_var_ratio > 0.99
    assert r0.eigenvalue > 0


def test_ivf_balance_accounts_for_the_corpus(spark):
    """On planted well-separated clusters the IVF report must: cover the
    corpus exactly (sum n_members = N, shares sum to ~1e6), keep every
    seed cluster alive (n_empty = 0, imbalance ~ 1000 for equal sizes),
    and report near-zero quantization error for tight clusters."""
    from realparse_spark.operators.selection import ivf_balance

    rows = []
    for c in range(4):
        base = [0.0] * 8
        base[c * 2] = 10.0
        for i in range(12):
            v = list(base)
            v[7] = 0.001 * i  # tiny within-cluster jitter
            rows.append((c * 100 + i, v, c))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = ivf_balance(emb).collect()
    assert len(out) == 4
    assert sum(r.n_members for r in out) == 48
    assert all(r.n_members == 12 for r in out)
    assert all(r.n_empty == 0 for r in out)
    assert all(r.imbalance_x1000 == 1000 for r in out)
    assert all(0.0 <= r.mean_d2 < 0.01 for r in out)
    assert sum(r.share_ppm for r in out) == 1000000


def test_lm_holdout_ppl_surprises_the_unseen_source(spark):
    """Held-out LM invariants: a held-out source drawn from the training
    vocabulary scores a LOWER perplexity than one made of unseen tokens;
    OOV accounting is exact (the unseen source is 100% OOV, the familiar
    one 0%); token counts partition the held-out split."""
    from realparse_spark.operators.selection import lm_holdout_ppl

    # train mass (doc_id % 5 != 0): a tight vocabulary
    rows = [(100 + j * 5 + 1, "alpha beta gamma delta", "familiar") for j in range(8)]
    rows += [(j * 5, "alpha beta gamma delta", "familiar") for j in range(1, 4)]  # held out
    rows += [(1000 + j * 5, "qqq www zzz yyy", "alien") for j in range(1, 4)]     # held out, OOV
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in lm_holdout_ppl(docs).collect()}
    assert set(out) == {"familiar", "alien"}
    fam, ali = out["familiar"], out["alien"]
    assert fam.n_docs == 3 and ali.n_docs == 3
    assert fam.n_tokens == 12 and ali.n_tokens == 12
    assert fam.oov_ppm == 0 and ali.oov_ppm == 1_000_000
    assert fam.mean_nll < ali.mean_nll
    assert fam.ppl < ali.ppl
    assert fam.ppl > 1.0


def test_doremi_lite_upweights_the_surprising_source(spark):
    """Mixture re-weighting invariants on the familiar/alien corpus:
    weights sum to ~1, the min-NLL source has excess 0, the surprising
    source gets weight above its token share (boost > 1) and the
    familiar one below (boost < 1)."""
    from realparse_spark.operators.selection import doremi_lite_weights

    rows = [(100 + j * 5 + 1, "alpha beta gamma delta", "familiar") for j in range(8)]
    rows += [(j * 5, "alpha beta gamma delta", "familiar") for j in range(1, 4)]
    rows += [(1000 + j * 5, "qqq www zzz yyy", "alien") for j in range(1, 4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in doremi_lite_weights(docs).collect()}
    fam, ali = out["familiar"], out["alien"]
    assert abs(fam.weight + ali.weight - 1.0) < 1e-5
    assert fam.excess_nll == 0.0 and ali.excess_nll > 0.0
    assert ali.weight > ali.token_share and ali.boost > 1.0
    assert fam.weight < fam.token_share and fam.boost < 1.0


def test_lm_holdout_ppl_keeps_the_empty_source(spark):
    """A source whose held-out docs carry ZERO tokens must still appear
    in the report (NULL metrics, 0 tokens) instead of silently vanishing
    — and must not poison doremi's weight normalization."""
    from realparse_spark.operators.selection import (
        doremi_lite_weights,
        lm_holdout_ppl,
    )

    rows = [(100 + j * 5 + 1, "alpha beta gamma", "familiar") for j in range(6)]
    rows += [(j * 5, "alpha beta gamma", "familiar") for j in range(1, 3)]
    rows += [(1000 + j * 5, "", "empty") for j in range(1, 3)]  # held out, no tokens
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in lm_holdout_ppl(docs).collect()}
    assert set(out) == {"familiar", "empty"}
    e = out["empty"]
    assert e.n_docs == 2 and e.n_tokens == 0 and e.oov_ppm == 0
    assert e.mean_nll is None and e.ppl is None
    w = {r.source: r for r in doremi_lite_weights(docs).collect()}
    assert set(w) == {"familiar"}  # zero-token source excluded from weights
    assert w["familiar"].weight == 1.0
