"""Deduplication operators over `documents` / `embeddings` — the
training-data-pipeline dedup surface (BASELINE.json north star).

Scale design notes (the part that matters at 100 TB):

- exact:    one hash-groupBy; the shuffle key is the md5, uniformly
            distributed, so no skew.  Map-side partial agg halves traffic.
- ngram:    candidate generation by inverted-index self-join on shared
            n-grams.  The join key (ngram) is Zipf-skewed — AQE skew-join
            splits hot ngrams; a document-frequency cap (drop ngrams in
            > df_cap docs) bounds the candidate blowup the way real
            pipelines do.
- minhash:  constant-size signatures (K hashes) replace the full ngram
            set; LSH banding makes candidate generation O(docs x bands),
            i.e. linear scans + one groupBy per band batch — the only
            strategy that survives 100 TB.  Signatures are built with
            one posexplode x K min-aggregation, all JVM-side.
- simhash:  64-bit signature via bitwise vote over token hashes; near-dup
            candidates join on 16-bit chunk equality (pigeonhole: hamming
            <= 3 guarantees one of 4 chunks equal).
- embedding: cosine near-dup with label blocking (analog of a real
            pipeline's ANN blocking).

`minhash` / `simhash` use xxhash64, which DuckDB cannot reproduce, so the
driver records rows-only checks for them; their *quality* (agreement with
exact Jaccard) is asserted in tests/test_dedup.py instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from realparse_spark.cache import fingerprint_key, snapshot_path
from realparse_spark.operators.distrank import rank_distributed
from realparse_spark.operators.text import ws_tokens
from realparse_spark.sources.tables import fan_out, load_table

# deterministic MinHash permutation parameters (public textbook scheme:
# h_i(x) = (a_i * x + b_i) mod p over a Mersenne prime).  p is 31-bit so
# a*h+b stays well inside int64 (no silent overflow in the JVM expression).
MINHASH_P = (1 << 31) - 1


def _perm_params(k: int) -> list[tuple[int, int]]:
    # fixed LCG so signatures are stable across runs/sessions
    params, state = [], 88172645463325252
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (MINHASH_P - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % MINHASH_P
        params.append((a, b))
    return params


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the document."""
    toks = ws_tokens(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup: canonical doc = min(doc_id) per normalized
    text hash; emits group size so the caller can filter dup groups."""
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return (
        docs.select("doc_id", F.md5(norm).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("doc_id").alias("group_size"),
        )
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = exact_dedup(load_table(spark, sf_dir, "documents"))
    return g.agg(
        F.count("fp").alias("n_unique"),
        F.sum("group_size").alias("n_docs"),
        F.count(F.when(F.col("group_size") > 1, True)).alias("n_dup_groups"),
        F.max("group_size").alias("max_group"),
    )


DEDUP_EXACT_SQL = r"""
WITH g AS (
  SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
         min(doc_id) AS canonical_doc_id,
         count(doc_id) AS group_size
  FROM documents GROUP BY 1
)
SELECT count(fp) AS n_unique,
       CAST(sum(group_size) AS BIGINT) AS n_docs,
       count(CASE WHEN group_size > 1 THEN 1 END) AS n_dup_groups,
       max(group_size) AS max_group
FROM g
"""


# ---------------------------------------------------------------------------
# soft dedup: down-weight duplicates instead of dropping them
# ---------------------------------------------------------------------------


def soft_dedup_weights(docs: DataFrame) -> DataFrame:
    """Per-source SoftDeDup accounting (He et al. 2024, arXiv:2407.04126
    'Softdedup: an efficient data reweighting method for speeding up
    language model pretraining'): instead of DROPPING duplicates, each
    document is down-weighted by its exact-duplicate multiplicity —
    weight 1/m for a doc whose normalized text occurs m times — so a
    group of m copies contributes exactly one document's worth of
    sampling mass and every copy stays available.  The report gives per
    source: raw vs effective (weighted) document and token counts — the
    numbers a sampler feeds into its per-source rates.

    Exactness: weights are rationals with tiny denominators (1/m), so
    they accumulate in BIGINT MICRO-units (10^6 div m — integral, both
    engines floor identically) and convert to a fraction with ONE
    terminal double division per output row (the clamped_balance
    discipline — no order-dependent float summation for engines to
    disagree on).

    Scale: multiplicity is ONE map-side-combined groupBy on the md5
    fingerprint; the count joins back on the same key (shuffle reuse),
    then ONE groupBy(source) with O(sources) output.  No pairwise work
    anywhere — this is the linear companion to `dedup_exact`."""
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    base = docs.select(
        "doc_id",
        "source",
        F.md5(norm).alias("fp"),
        F.size(ws_tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    mult = base.groupBy("fp").agg(F.count(F.lit(1)).alias("m"))
    weighted = base.join(mult, "fp").select(
        "source",
        "n_tokens",
        (F.col("m") > 1).cast("long").alias("is_dup"),
        # exact integer micro-weights: 10^6 div m, and token-mass
        # micro-units n_tokens * 10^6 div m (n_tokens ~ 1e4 keeps the
        # product far inside int64)
        F.expr("1000000 div m").cast("bigint").alias("w_u"),
        F.expr("n_tokens * 1000000 div m").cast("bigint").alias("tw_u"),
    )
    return (
        weighted.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("is_dup").cast("bigint").alias("n_dup_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("w_u").cast("bigint").alias("eff_docs_u"),
            F.sum("tw_u").cast("bigint").alias("eff_tokens_u"),
        )
        .select(
            "source",
            "n_docs",
            "n_dup_docs",
            "n_tokens",
            F.round(F.col("eff_docs_u") / 1000000.0, 4).alias("eff_docs"),
            F.round(F.col("eff_tokens_u") / 1000000.0, 4).alias("eff_tokens"),
        )
        .orderBy("source")
    )


def q_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realparse_spark.sources.tables import fan_out

    return soft_dedup_weights(fan_out(load_table(spark, sf_dir, "documents")))


SOFT_DEDUP_WEIGHTS_SQL = r"""
WITH base AS (
  SELECT doc_id, source,
    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
    CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS BIGINT)
      AS n_tokens
  FROM documents
),
mult AS (SELECT fp, count(*) AS m FROM base GROUP BY fp),
weighted AS (
  SELECT source, n_tokens,
    CASE WHEN m > 1 THEN 1 ELSE 0 END AS is_dup,
    CAST(1000000 // m AS BIGINT) AS w_u,
    CAST(n_tokens * 1000000 // m AS BIGINT) AS tw_u
  FROM base JOIN mult USING (fp)
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(is_dup) AS BIGINT) AS n_dup_docs,
  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
  round(CAST(sum(w_u) AS BIGINT) / 1000000.0, 4) AS eff_docs,
  round(CAST(sum(tw_u) AS BIGINT) / 1000000.0, 4) AS eff_tokens
FROM weighted
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (exact, inverted-index candidate join)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5, df_cap: int = 1000
) -> DataFrame:
    """Jaccard over distinct word n-grams with document frequency <= df_cap
    (boilerplate shingles above the cap are excluded from candidates AND
    from scores — they carry no similarity signal, and dropping them
    consistently bounds the quadratic blowup the way real pipelines do;
    with a non-binding cap the score is the exact full-set Jaccard).

    Shape: the inverted-index self-join's matched rows ARE the
    intersection — |A∩B| = count of shared grams per pair, aggregated
    straight off the join output.  No per-pair array materialization, no
    array_intersect over wide shingle arrays, no distinct: one join, one
    groupBy, two broadcast joins against a tiny per-doc set-size table.
    (The previous shape deduplicated candidates then re-joined both full
    shingle arrays to score — at bench scale that array scoring was ~5x
    the cost of everything else.)"""
    jac = F.round(F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c")), 6)
    return (
        _gram_pair_counts(docs, n, df_cap)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _rare_postings(docs: DataFrame, n: int, df_cap: int) -> DataFrame:
    """The df-capped inverted-index posting table (doc_id, g) — the
    derived corpus structure every exact shingle-overlap score reads."""
    grams = docs.select(
        "doc_id", F.explode(word_ngrams(F.col("text"), n)).alias("g")
    )
    return grams.join(
        grams.groupBy("g").agg(F.count("doc_id").alias("df")).filter(F.col("df") <= df_cap),
        "g",
    ).select("doc_id", "g")


def _gram_pair_counts(docs: DataFrame, n: int, df_cap: int) -> DataFrame:
    """Shared candidate machinery for the exact shingle-overlap scores
    (Jaccard, containment): inverted-index self-join counting shared
    distinct n-grams per pair.  Returns (doc_a, doc_b, c, na, nb)."""
    # localCheckpoint (eager): `rare` feeds three consumers (sizes + both
    # join sides); without materialization each would re-run the shingle
    # build — the most expensive narrow stage — up to 6x.  A persist scoped
    # to this function can't work (the result is lazy; the unpersist would
    # run before the caller's action), so the lineage is cut once here.
    rare = _rare_postings(docs, n, df_cap).localCheckpoint()
    return _gram_pair_counts_from(rare)


def _gram_pair_counts_from(rare: DataFrame) -> DataFrame:
    """Pair counting over an already-materialized posting table (a
    localCheckpoint or the fingerprint-keyed parquet cache)."""
    # sizes is broadcast to BOTH pair sides — one O(docs)-row
    # materialization instead of two full aggregation passes over the
    # posting table (guide §2.4)
    sizes = (
        rare.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_g"))
        .localCheckpoint(eager=False)
    )
    a = rare.alias("a")
    b = rare.alias("b")
    common = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_g").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_g").alias("nb"))
    return common.join(F.broadcast(sa), "doc_a").join(F.broadcast(sb), "doc_b")


def ngram_containment_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.8, df_cap: int = 1000
) -> DataFrame:
    """Asymmetric near-dup: shingle containment |A∩B| / min(|A|, |B|).
    Catches a short document embedded verbatim in a longer one — a case
    Jaccard misses (the union term dilutes the score).  Same inverted-index
    candidate join as `ngram_jaccard_pairs`; only the score differs, so the
    same df_cap bounds the quadratic blowup at scale."""
    cont = F.round(F.col("c").cast("double") / F.least(F.col("na"), F.col("nb")), 6)
    return (
        _gram_pair_counts(docs, n, df_cap)
        .select("doc_a", "doc_b", cont.alias("containment"))
        .filter(F.col("containment") >= threshold)
    )


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # reads the shared per-snapshot posting table (see _postings_for)
    rare = spark.read.parquet(_postings_for(spark, sf_dir, n=3, df_cap=1000))
    cont = F.round(F.col("c").cast("double") / F.least(F.col("na"), F.col("nb")), 6)
    return (
        _gram_pair_counts_from(rare)
        .select("doc_a", "doc_b", cont.alias("containment"))
        .filter(F.col("containment") >= 0.8)
    )


# DEDUP_CONTAINMENT_SQL is defined after _NGRAM_CTES_TEMPLATE below.


def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # reads the shared per-snapshot posting table (see _postings_for)
    rare = spark.read.parquet(_postings_for(spark, sf_dir, n=3, df_cap=1000))
    jac = F.round(F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c")), 6)
    return (
        _gram_pair_counts_from(rare)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


# ---------------------------------------------------------------------------
# prefix-filtered exact set-similarity join (PPJoin-family, lossless)
# ---------------------------------------------------------------------------


def prefix_jaccard_pairs(
    docs: DataFrame, n: int = 2, threshold: float = 0.6
) -> DataFrame:
    """Exact shingle-set Jaccard join via PREFIX FILTERING (the SSJoin /
    PPJoin principle, Chaudhuri et al. 2006 / Xiao et al. 2008): order
    every document's distinct word n-grams by ascending global document
    frequency (rarest first) and index only the first
    ``s - ceil(t*s) + 1`` of a document's s shingles — two documents
    with Jaccard >= t MUST share a prefix shingle under any global total
    order, so the candidate join is lossless while touching a (1-t)
    fraction of the postings.

    This is the complement of `ngram_jaccard_pairs`'s df-cap: the cap is
    LOSSY (drops hot shingles from the score) and still indexes every
    surviving posting; the prefix filter is EXACT and shrinks the index
    itself.  Because the prefix keeps each document's *rarest* tokens,
    the join keys are anti-skewed by construction — the Zipf head that
    forces AQE skew-splits in the naive inverted index never enters the
    candidate join.  That, plus the length filter
    ``t*max(|A|,|B|) <= min(|A|,|B|)`` applied inside the join, is what
    survives 100 TB.

    Candidate pruning gets two more lossless PPJoin filters: the LENGTH
    filter ``t*max(|A|,|B|) <= min(|A|,|B|)`` and the POSITIONAL filter —
    a pair matching prefix tokens at positions (i, j) of the df-sorted
    shingle lists can share at most ``1 + min(|A|-i, |B|-j)`` shingles,
    and J >= t needs overlap >= ceil(t/(1+t)·(|A|+|B|)); the first common
    token in the global order always passes the bound when the pair truly
    qualifies, so filtering each occurrence is exact.

    Verification happens INSIDE the candidate join stage: each prefix
    posting row carries its document's full df-ordered shingle array, so
    the self-join computes ``array_intersect`` and the Jaccard filter in
    the same whole-stage-codegen pass that generates the pair — no
    candidate table is ever materialized, no verify joins, and the final
    ``distinct`` (same pair found via several shared prefix tokens)
    dedupes only the handful of rows that PASS the threshold.  This
    matters on a dense corpus (few distinct shingles, uniform df — no
    Zipf tail for the prefix to exploit): the original explode-join
    verify shuffled O(|cand| · tokens/doc) rows and a candidate-first
    variant still shuffled the multi-million-pair candidate set twice;
    inline verification shuffles only prefix postings (O(corpus) rows,
    each ~|doc| tokens wide — the same order as the corpus itself) and
    lets codegen discard non-qualifying pairs on the spot.  Measured at
    sf0.1 (5k docs, 3.5M surviving candidate pairs, 256 true pairs):
    51 s -> 3 s warm; the round-8 asymmetric-prefix probe side,
    first-match dedup of the verify, and adaptive int32 token ids
    (see `_prefix_self_join` / `_build_prefix_index`) take the same
    join to 1.9 s warm with bit-identical output.  The output equals
    the brute-force all-pairs Jaccard — oracle-checked against DuckDB's
    full self-join."""
    # materialized once: the self-join would otherwise recompute the whole
    # explode -> df -> rank -> collect pipeline for EACH side (measured
    # ~5x the downstream join+verify cost)
    pref = _build_prefix_index(docs, n, threshold).localCheckpoint()
    return _prefix_self_join(pref, threshold)


def _build_prefix_index(docs: DataFrame, n: int, threshold: float) -> DataFrame:
    """The df-ranked prefix posting index (doc_id, garr, n_tok, pos, tok)
    — the derived corpus structure the PPJoin self-join reads."""
    toks = docs.select(
        "doc_id", F.explode(word_ngrams(F.col("text"), n)).alias("tok")
    )
    # dense integer token ids RANKED BY ASCENDING df — the PPJoin "token
    # ordering by frequency".  Interning matters twice: the self-join key
    # becomes an int, and array_intersect below hits Spark's primitive
    # fast path (string arrays pay generic UTF8String hashing per pair —
    # measured 4x slower end-to-end).  The rank is over the VOCABULARY
    # (not the corpus), but shingle vocabularies grow near-linearly with
    # corpus size, so it uses the two-phase distributed rank — never a
    # single-partition window (the round-6 scale finding).
    doc_freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    tok_ids = rank_distributed(doc_freq, ["df", "tok"], rank_col="tok_id").select(
        "tok", "tok_id"
    )
    # narrow the id dtype when the vocabulary allows: int32 arrays sort,
    # shuffle and intersect measurably faster than long (3.4 s -> 2.8 s
    # warm at sf0.1 on the self-join alone).  The max-rank probe reads the
    # vocab-sized checkpoint rank_distributed already materialized — no
    # second corpus pass.  A shard whose shingle vocabulary exceeds 2^31
    # (possible at 100 TB without domain sharding) keeps long ids; the
    # self-join is dtype-agnostic either way, and the dtype is a pure
    # function of the corpus so snapshot rebuilds stay deterministic.
    vmax = tok_ids.agg(F.max("tok_id")).collect()[0][0]
    if vmax is not None and vmax < 2**31:
        tok_ids = tok_ids.select("tok", F.col("tok_id").cast("int").alias("tok_id"))
    # one row per doc: shingle-id array sorted ascending == rarest-first
    # under the global (df, tok) total order the prefix principle requires
    doc_arr = (
        toks.join(tok_ids, "tok")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("tok_id")).alias("garr"))
        .withColumn("n_tok", F.size("garr"))
    )
    # index only the first s - ceil(t*s) + 1 shingles; pos is 0-based
    pref = doc_arr.select(
        "doc_id",
        "garr",
        "n_tok",
        F.posexplode(
            F.expr(
                f"slice(garr, 1, n_tok - ceil({threshold} * n_tok) + 1)"
            )
        ).alias("pos", "tok"),
    )
    return pref


def _prefix_self_join(pref: DataFrame, threshold: float) -> DataFrame:
    """The verify-inline self-join over a materialized prefix index (a
    localCheckpoint or the per-snapshot parquet cache).

    The EXPLICIT repartition on the join key is load-bearing: the posting
    table is small (O(corpus) rows) so AQE would coalesce the self-join
    to a handful of partitions, but the join OUTPUT is the multi-million-
    pair candidate stream with a per-row array_intersect — parallelism
    must be sized to the output, not the input.  An explicit partition
    count is honored by AQE (only size-derived plans get coalesced), so
    every core keeps a slice of the verification work.  The count scales
    with the session (2x shuffle partitions, floor 64) instead of
    pinning the bench value.  The join stays sort-merge by choice: a
    shuffled-hash hint measures ~12% faster at bench scale, but its
    build side holds a whole partition of |doc|-wide posting arrays in
    memory — an OOM at corpus scale, where SMJ spills."""
    n_parts = max(
        64, 2 * int(pref.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    )
    pref = pref.repartition(n_parts, "tok")
    # ASYMMETRIC PREFIX (Xiao et al. 2008 §4, self-join form): order each
    # pair by set size (ties by doc_id) and let the SMALLER side probe
    # with only its first  n - ceil(2t/(1+t)·n) + 1  postings — for
    # |A| <= |B| the required overlap is >= 2t/(1+t)·|A|, so this shorter
    # prefix still must contain a shared token.  The per-pair positional
    # filter below subsumes the same bound (candidate counts are
    # identical), but applying it as a PRE-JOIN filter shrinks the probe
    # side's shuffle/sort input ~36% (t=0.6) before any pairing happens.
    # Float note: 2t/(1+t) in binary64 under-estimates the exact value
    # for every representable t, so ceil() can only err toward a LONGER
    # prefix — never lossy.
    short_len = (
        F.col("n_tok")
        - F.ceil(F.lit(2.0 * threshold / (1.0 + threshold)) * F.col("n_tok"))
        + 1
    )
    a = pref.filter(F.col("pos") < short_len).alias("a")
    b = pref.alias("b")
    size_order = (F.col("a.n_tok") < F.col("b.n_tok")) | (
        (F.col("a.n_tok") == F.col("b.n_tok"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    # minimum overlap for J >= t at sizes (na, nb): c >= t/(1+t)·(na+nb)
    min_overlap = (
        F.lit(threshold / (1.0 + threshold))
        * (F.col("a.n_tok") + F.col("b.n_tok")).cast("double")
    )
    # positional filter (0-based pos): overlap <= 1 + min(na-pa-1, nb-pb-1)
    overlap_ub = F.least(
        F.col("a.n_tok") - F.col("a.pos"), F.col("b.n_tok") - F.col("b.pos")
    ).cast("double")
    # FIRST-MATCH filter: a pair sharing m prefix tokens would otherwise
    # run the O(|A|+|B|) intersect verify m times (1.48x mean multiplicity
    # measured at sf0.1); requiring the pre-match slices to be disjoint
    # keeps exactly one row per candidate pair — the minimum common token.
    # Lossless: for a truly qualifying pair the GLOBAL first common token
    # U sits inside both generated prefixes (pos_A(U) <= |A|-c < the short
    # prefix bound since c >= 2t/(1+t)|A|; pos_B(U) <= |B|-c < |B|-t|B|+1),
    # so U's row is always generated, its slices contain no common token,
    # and the full intersect there is the exact overlap.  The slices scan
    # only the ~first dozen ids per side — ~8x cheaper than the verify
    # they replace (2.9 s -> 1.9 s warm at sf0.1).
    first_match = ~F.arrays_overlap(
        F.slice(F.col("a.garr"), 1, F.col("a.pos")),
        F.slice(F.col("b.garr"), 1, F.col("b.pos")),
    )
    c = F.size(F.array_intersect("a.garr", "b.garr"))
    jac = F.round(
        c.cast("double") / (F.col("a.n_tok") + F.col("b.n_tok") - c), 6
    )
    # the Jaccard threshold lives IN the join condition, not a filter
    # after a projection: a post-projection filter gets pushed into its
    # own predicate node and the array_intersect is re-evaluated per
    # node (measured 9 s -> 3 s at sf0.1); inside the join it runs once
    # per candidate pair and the projection below only ever sees the
    # handful of true near-duplicates
    return (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & size_order
            # length filter: J >= t forces t*max(|A|,|B|) <= min(|A|,|B|);
            # under size_order only the a-side bound is non-trivial
            & (F.col("a.n_tok") >= F.lit(threshold) * F.col("b.n_tok"))
            # positional filter: the overlap upper bound at this match
            # position must still reach the required minimum overlap
            & (overlap_ub >= min_overlap)
            & first_match
            # exact verification, same rounded form as the oracle
            & (jac >= F.lit(threshold)),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .distinct()
    )


# Materialized prefix index (doc_id, garr, n_tok, pos, tok), fingerprint-
# keyed per corpus — same cache discipline as _POSTINGS/_CLUSTERS.
_PREFIX_IDX: dict[tuple, str] = {}


def q_dedup_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    n, threshold = 2, 0.6

    def _build(tmp: str) -> None:
        docs = fan_out(load_table(spark, sf_dir, "documents"))
        # reuse the builder inside prefix_jaccard_pairs by rebuilding
        # the index here (one-time per corpus snapshot)
        _build_prefix_index(docs, n, threshold).write.mode("overwrite").parquet(tmp)

    path = snapshot_path(
        _PREFIX_IDX,
        # "narrow-ids" salts the key: round-8 narrowed tok_id to int32
        # when the vocab allows — a pre-change snapshot must not be reused
        fingerprint_key(sf_dir, "documents", n, threshold, "narrow-ids"),
        "realparse_prefidx_",
        _build,
    )
    return _prefix_self_join(spark.read.parquet(path), threshold)


# oracle: brute-force exact bigram-shingle Jaccard — the prefix filter is
# lossless, so the candidate-pruned plan must reproduce this exactly
DEDUP_PREFIX_JACCARD_SQL = r"""
WITH w AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
gsets AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 2),
                                 i -> array_to_string(t[i:i+1], ' '))) AS garr
  FROM w
),
toks AS (SELECT doc_id, unnest(garr) AS tok FROM gsets),
sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT doc_a, doc_b,
    round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.6
"""


_NGRAM_CTES_TEMPLATE = r"""toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
gsets AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, greatest(len(t) - 3, 0) + 2),
                                 i -> array_to_string(t[i:i+2], ' '))) AS garr
  FROM toks
),
grams AS (
  SELECT doc_id, unnest(garr) AS g FROM gsets
),
rare AS (
  SELECT doc_id, g FROM grams
  WHERE g IN (SELECT g FROM grams GROUP BY g HAVING count(doc_id) <= 1000)
),
sizes AS (
  SELECT doc_id, count(*) AS n_g FROM rare GROUP BY doc_id
),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM rare a JOIN rare b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT doc_a, doc_b,
    {score}
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
)"""

# the jaccard-scored instantiation is shared by the ngram, clusters, and
# canonical oracles
_NGRAM_CTES = _NGRAM_CTES_TEMPLATE.format(
    score="round(CAST(c AS DOUBLE) / (sa.n_g + sb.n_g - c), 6) AS jaccard"
)

DEDUP_NGRAM_SQL = (
    "WITH " + _NGRAM_CTES + "\nSELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.5\n"
)

DEDUP_CONTAINMENT_SQL = (
    "WITH "
    + _NGRAM_CTES_TEMPLATE.format(
        score="round(CAST(c AS DOUBLE) / least(sa.n_g, sb.n_g), 6) AS containment"
    )
    + "\nSELECT doc_a, doc_b, containment FROM scored WHERE containment >= 0.8\n"
)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (the 100 TB-scale path; rows-only driver check)
# ---------------------------------------------------------------------------


def minhash_signatures(docs: DataFrame, n: int = 3, k: int = 32) -> DataFrame:
    """K-permutation MinHash signatures over word-n-gram shingles.
    Shape: hash each token ONCE (xxhash64), combine per-window with integer
    arithmetic (no per-shingle string building, no distinct — min() is
    duplicate-insensitive), then take each permutation's minimum with
    `array_min(transform(...))` INSIDE the row.  The whole signature build
    is a narrow projection: zero shuffles, scan-speed at any scale (the
    previous shape exploded shingles into rows and re-grouped by doc_id —
    a full shuffle of |docs| x |shingles| rows that this plan deletes).

    Docs with fewer than n tokens emit one partial shingle (missing
    positions hash as 0 via try_element_at -> ifnull) instead of
    aborting: under the driver's ANSI session a plain element_at on a
    short token array raises INVALID_ARRAY_INDEX_IN_ELEMENT_AT."""
    if n != 3:
        raise ValueError("arithmetic shingle combine is specialized to n=3")
    toks = docs.select("doc_id", ws_tokens(F.col("text")).alias("_toks"))
    # token hashes reduced to 31-bit BEFORE the polynomial combine so every
    # intermediate stays << 2^63 (a < p and h < p, so a*h+b < 2^62 — no
    # silent overflow even under ANSI mode)
    hashed = toks.withColumn(
        "_th", F.expr("transform(_toks, t -> pmod(xxhash64(t), 2147483647))")
    ).withColumn(
        "_sh",
        F.expr(
            "transform(sequence(1, greatest(size(_th)-2, 1)),"
            " i -> pmod(ifnull(try_element_at(_th,i),0)*1000003"
            "        + ifnull(try_element_at(_th,i+1),0)*8191"
            "        + ifnull(try_element_at(_th,i+2),0), 2147483647))"
        ),
    )
    return hashed.select(
        "doc_id",
        *[
            F.array_min(
                F.expr(f"transform(_sh, h -> pmod(h * {a}L + {b}L, {MINHASH_P}L))")
            ).alias(f"mh_{i}")
            for i, (a, b) in enumerate(_perm_params(k))
        ],
    )


def minhash_lsh_pairs(
    docs: DataFrame | None,
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket: int = 1000,
    sig: DataFrame | None = None,
) -> DataFrame:
    """LSH banding: signature split into `bands` rows of k/bands hashes;
    docs agreeing on any full band become candidates; candidates are
    scored by full-signature agreement (estimated Jaccard) and filtered.

    At scale each band is one narrow groupBy on a 64-bit band key —
    no pairwise work outside hash buckets.

    Skew guard: a (band, bucket) group with B docs would emit B²/2
    candidate rows from the all-pairs self-join — on boilerplate-heavy
    corpora (thousands of identical docs) one hot bucket dominates the
    whole job.  Buckets larger than `max_bucket` switch to STAR pairs
    (every member paired with the bucket's min doc_id): candidates become
    O(B) per hot bucket, and since hot-bucket members share a full band
    (near-identical signatures), the star edges keep every true duplicate
    connected for downstream `dup_clusters` — the trade-off is pairwise
    completeness inside hot buckets, mirroring the ngram df_cap policy."""
    if k % bands != 0:
        raise ValueError(f"bands ({bands}) must divide signature width k ({k})")
    if docs is None and sig is None:
        raise ValueError("minhash_lsh_pairs needs either docs or a sig table")
    # a precomputed signature table (see _minhash_sig_for) skips the
    # narrow-but-arithmetic-heavy build; either way the plan references
    # the signatures three times (banding + both verify sides), so the
    # table must be materialized once.  localCheckpoint, NOT persist: the
    # function returns a LAZY frame, so a persist/finally-unpersist pair
    # is already unpersisted by the time the caller materializes and all
    # three branches silently rebuilt the signatures from scratch.
    if sig is None:
        sig = minhash_signatures(docs, n, k)
    sig = sig.localCheckpoint(eager=False)
    r = k // bands
    # one (doc_id, band_no, bucket) row per band via a single explode —
    # the whole candidate generation is ONE self-join keyed on
    # (band_no, bucket), not `bands` separate joins
    band_arr = _band_key_array(k, bands)
    from pyspark.sql import Window

    # bucket size + representative in ONE pass (window over the same
    # partitioning the join needs — no extra shuffle vs groupBy+join)
    wb = Window.partitionBy("band_no", "bk")
    banded = sig.select(
        "doc_id", F.posexplode(band_arr).alias("band_no", "bk")
    ).select(
        "doc_id", "band_no", "bk",
        F.count(F.lit(1)).over(wb).alias("_sz"),
        F.min("doc_id").over(wb).alias("_rep"),
    )
    small = banded.filter(F.col("_sz") <= max_bucket)
    l = small.select(F.col("doc_id").alias("doc_a"), "band_no", "bk")
    rr = small.select(F.col("doc_id").alias("doc_b"), "band_no", "bk")
    pair_small = (
        l.join(rr, ["band_no", "bk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    pair_hot = (
        banded.filter((F.col("_sz") > max_bucket) & (F.col("doc_id") != F.col("_rep")))
        .select(F.col("_rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    cand = pair_small.union(pair_hot).distinct()

    sa = sig.select(F.col("doc_id").alias("doc_a"), F.array(*[f"mh_{i}" for i in range(k)]).alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.array(*[f"mh_{i}" for i in range(k)]).alias("sig_b"))
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        .cast("double") / F.lit(k)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(est, 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def _band_key_array(k: int, bands: int) -> Column:
    """Per-doc array of `bands` 64-bit band keys over the mh_* columns."""
    r = k // bands
    return F.array(
        *[
            F.xxhash64(F.lit(b), *[F.col(f"mh_{b * r + j}") for j in range(r)])
            for b in range(bands)
        ]
    )


def minhash_probe_pairs(
    corpus_sig: DataFrame,
    incoming_sig: DataFrame,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Incremental near-dup: probe an incoming batch's signatures against
    an EXISTING corpus signature table (the _minhash_sig_for snapshot) —
    the daily-ingest shape: nothing about the corpus is recomputed, and
    candidate generation is ONE equi-join on (band_no, band_key) between
    the (small) incoming band rows and the corpus band index.

    Hot corpus buckets (> max_bucket members — boilerplate signatures)
    are collapsed to their min-doc representative before the join, the
    same skew policy as the batch path: each incoming doc still connects
    to the bucket (via its representative) for downstream clustering,
    but never fans out to every member.

    Returns (inc_doc, corpus_doc, est_jaccard >= threshold)."""
    if k % bands != 0:
        raise ValueError(f"bands ({bands}) must divide signature width k ({k})")
    from pyspark.sql import Window

    band_arr = _band_key_array(k, bands)
    wb = Window.partitionBy("band_no", "bk")
    cb = (
        corpus_sig.select(
            F.col("doc_id").alias("corpus_doc"),
            F.posexplode(band_arr).alias("band_no", "bk"),
        )
        .select(
            "corpus_doc", "band_no", "bk",
            F.count(F.lit(1)).over(wb).alias("_sz"),
            F.min("corpus_doc").over(wb).alias("_rep"),
        )
        .filter(
            (F.col("_sz") <= max_bucket) | (F.col("corpus_doc") == F.col("_rep"))
        )
        .select("corpus_doc", "band_no", "bk")
    )
    ib = incoming_sig.select(
        F.col("doc_id").alias("inc_doc"),
        F.posexplode(band_arr).alias("band_no", "bk"),
    )
    cand = ib.join(cb, ["band_no", "bk"]).select("inc_doc", "corpus_doc").distinct()
    sa = incoming_sig.select(
        F.col("doc_id").alias("inc_doc"),
        F.array(*[f"mh_{i}" for i in range(k)]).alias("sig_a"),
    )
    sb = corpus_sig.select(
        F.col("doc_id").alias("corpus_doc"),
        F.array(*[f"mh_{i}" for i in range(k)]).alias("sig_b"),
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        .cast("double") / F.lit(k)
    )
    return (
        cand.join(sa, "inc_doc")
        .join(sb, "corpus_doc")
        .select("inc_doc", "corpus_doc", F.round(est, 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
        .orderBy("inc_doc", "corpus_doc")
    )


def q_dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup ingest gate over the fixture's every-5th-doc incoming
    split: BOTH sides read the shared signature snapshot (zero signature
    recompute — the point of storing signatures next to the corpus).
    Rows-only driver check (xxhash64 band keys are not DuckDB-
    reproducible); tests pin equality against the batch path filtered to
    cross-split pairs."""
    sig = spark.read.parquet(_minhash_sig_for(spark, sf_dir))
    return minhash_probe_pairs(
        sig.filter(F.col("doc_id") % 5 != 0),
        sig.filter(F.col("doc_id") % 5 == 0),
    )


# Materialized MinHash signature table, fingerprint-keyed per corpus —
# same cache discipline as _POSTINGS/_PREFIX_IDX/_CLUSTERS.  Signatures
# are THE reusable artifact of MinHash dedup (the banding/verify stage is
# cheap by comparison and parameter-dependent), so production pipelines
# store them next to the corpus snapshot rather than rebuilding per run.
_MINHASH_SIG: dict[tuple, str] = {}


def _minhash_sig_for(
    spark: SparkSession, sf_dir: str, n: int = 3, k: int = 32
) -> str:
    def _build(tmp: str) -> None:
        minhash_signatures(
            fan_out(load_table(spark, sf_dir, "documents")), n, k
        ).write.mode("overwrite").parquet(tmp)

    return snapshot_path(
        _MINHASH_SIG,
        fingerprint_key(sf_dir, "documents", "minhash", n, k),
        "realparse_mhsig_",
        _build,
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = spark.read.parquet(_minhash_sig_for(spark, sf_dir))
    return minhash_lsh_pairs(None, sig=sig)


# ---------------------------------------------------------------------------
# portable-hash MinHash+LSH: the exactly-oracled companion to dedup_minhash_lsh
# ---------------------------------------------------------------------------

PORTABLE_MINHASH_K = 8
PORTABLE_MINHASH_BANDS = 4


def _portable_shingle_arrays(docs: DataFrame) -> DataFrame:
    """(doc_id, _sh) where _sh is the md5-derived hashed-3-gram shingle
    list — the engine-portable shingle construction shared by the
    portable MinHash signatures and the dedup_eval ground truth (both
    must sketch/score the SAME sets or the eval measures the wrong
    estimator)."""
    toks = docs.select("doc_id", ws_tokens(F.col("text")).alias("_toks"))
    return toks.withColumn(
        "_th",
        F.expr(
            "transform(_toks, t -> pmod(cast(conv(substring(md5(t), 1, 15), 16, 10)"
            " as bigint), 2147483647))"
        ),
    ).withColumn(
        "_sh",
        F.expr(
            "transform(sequence(1, greatest(size(_th)-2, 1)),"
            " i -> pmod(ifnull(try_element_at(_th,i),0)*1000003"
            "        + ifnull(try_element_at(_th,i+1),0)*8191"
            "        + ifnull(try_element_at(_th,i+2),0), 2147483647))"
        ),
    )


def minhash_portable_signatures(
    docs: DataFrame, k: int = PORTABLE_MINHASH_K, sh: DataFrame | None = None
) -> DataFrame:
    """MinHash signatures whose every hash is ENGINE-PORTABLE: token
    hashes come from md5 (first 15 hex chars as an int — the hash_split
    idiom, pipeline_ops.py) instead of xxhash64, so DuckDB reproduces the
    signature bit-for-bit.  Same shingle combine and permutation family
    as `minhash_signatures` (shared `_perm_params`); k=8 keeps the SQL
    mirror tractable.  This exists so the MinHash FAMILY has a
    hash-verified driver row — the production path stays
    `minhash_signatures` (xxhash64 is JVM-side and ~10× cheaper than
    md5-hex-parse at scale)."""
    hashed = _portable_shingle_arrays(docs) if sh is None else sh
    return hashed.select(
        "doc_id",
        *[
            F.array_min(
                F.expr(f"transform(_sh, h -> pmod(h * {a}L + {b}L, {MINHASH_P}L))")
            ).alias(f"pmh_{i}")
            for i, (a, b) in enumerate(_perm_params(k))
        ],
    )


def minhash_portable_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    max_bucket: int = 1000,
    k: int = PORTABLE_MINHASH_K,
    bands: int = PORTABLE_MINHASH_BANDS,
    sh: DataFrame | None = None,
) -> DataFrame:
    """LSH banding over the portable signatures — the same candidate /
    verify / hot-bucket-star plan as `minhash_lsh_pairs`, except the
    band bucket key is the RAW (h0, h1) hash tuple instead of an
    xxhash64 compaction (the tuple is what the compaction stands for;
    grouping on it directly keeps the whole plan oracle-expressible and
    removes even the compaction-collision caveat).  Emits
    (doc_a, doc_b, est_jaccard) with est = matching positions / k,
    mirrored term-for-term in DEDUP_MINHASH_PORTABLE_SQL including the
    max_bucket star cutover."""
    from pyspark.sql import Window

    r = k // bands
    # localCheckpoint, NOT persist: the frame returned here is lazy, so a
    # persist/finally-unpersist pair is gone before the caller ever
    # materializes — banding and both verify sides each rebuilt the md5
    # signatures from the raw text.  `sh` lets a caller that already built
    # the shingle arrays (dedup_eval's ground-truth side) share the scan.
    sig = minhash_portable_signatures(docs, k, sh=sh).localCheckpoint(eager=False)
    band_arr = F.array(
        *[
            F.struct(
                F.col(f"pmh_{b * r}").alias("h0"),
                F.col(f"pmh_{b * r + 1}").alias("h1"),
            )
            for b in range(bands)
        ]
    )
    wb = Window.partitionBy("band_no", "h0", "h1")
    banded = (
        sig.select("doc_id", F.posexplode(band_arr).alias("band_no", "bk"))
        .select("doc_id", "band_no", F.col("bk.h0").alias("h0"), F.col("bk.h1").alias("h1"))
        .select(
            "doc_id", "band_no", "h0", "h1",
            F.count(F.lit(1)).over(wb).alias("_sz"),
            F.min("doc_id").over(wb).alias("_rep"),
        )
    )
    small = banded.filter(F.col("_sz") <= max_bucket)
    l = small.select(F.col("doc_id").alias("doc_a"), "band_no", "h0", "h1")
    rr = small.select(F.col("doc_id").alias("doc_b"), "band_no", "h0", "h1")
    pair_small = (
        l.join(rr, ["band_no", "h0", "h1"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    pair_hot = banded.filter(
        (F.col("_sz") > max_bucket) & (F.col("doc_id") != F.col("_rep"))
    ).select(F.col("_rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    cand = pair_small.union(pair_hot).distinct()

    cols = [f"pmh_{i}" for i in range(k)]
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.array(*cols).alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.array(*cols).alias("sig_b"))
    est = (
        F.size(
            F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)
        ).cast("double")
        / F.lit(k)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(est, 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def q_dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_portable_pairs(fan_out(load_table(spark, sf_dir, "documents")))


def _portable_sig_cols_sql(k: int = PORTABLE_MINHASH_K) -> str:
    return ",\n    ".join(
        f"list_min(list_transform(sh, x -> (x * {a} + {b}) % {MINHASH_P})) AS pmh_{i}"
        for i, (a, b) in enumerate(_perm_params(k))
    )


def _portable_bands_sql(k: int = PORTABLE_MINHASH_K, bands: int = PORTABLE_MINHASH_BANDS) -> str:
    r = k // bands
    return "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_no, pmh_{b * r} AS h0, pmh_{b * r + 1} AS h1 FROM sig"
        for b in range(bands)
    )


# t/h/shl: the md5-derived hashed-3-gram shingle lists (the SQL mirror of
# `_portable_shingle_arrays`), shared by the portable-MinHash oracle and
# the dedup_eval ground truth.
_PORTABLE_SHL_CTES = r"""t AS (
  SELECT doc_id,
    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents
),
h AS (
  SELECT doc_id,
    list_transform(toks,
      tk -> CAST('0x' || substring(md5(tk), 1, 15) AS BIGINT) % 2147483647) AS th
  FROM t
),
shl AS (
  SELECT doc_id,
    list_transform(range(1, greatest(len(th) - 2, 1) + 1),
      i -> (coalesce(th[i], 0) * 1000003 + coalesce(th[i+1], 0) * 8191
            + coalesce(th[i+2], 0)) % 2147483647) AS sh
  FROM h
)"""


DEDUP_MINHASH_PORTABLE_SQL = rf"""
WITH {_PORTABLE_SHL_CTES},
sig AS (
  SELECT doc_id,
    {_portable_sig_cols_sql()}
  FROM shl
),
banded0 AS (
  {_portable_bands_sql()}
),
banded AS (
  SELECT *,
    count(*) OVER (PARTITION BY band_no, h0, h1) AS sz,
    min(doc_id) OVER (PARTITION BY band_no, h0, h1) AS rep
  FROM banded0
),
cand AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM (SELECT * FROM banded WHERE sz <= 1000) a
    JOIN (SELECT * FROM banded WHERE sz <= 1000) b
      ON a.band_no = b.band_no AND a.h0 = b.h0 AND a.h1 = b.h1
     AND a.doc_id < b.doc_id
    UNION ALL
    SELECT rep, doc_id FROM banded WHERE sz > 1000 AND doc_id <> rep
  )
),
sv AS (SELECT doc_id, [{", ".join(f"pmh_{i}" for i in range(PORTABLE_MINHASH_K))}] AS s FROM sig),
scored AS (
  SELECT c.doc_a, c.doc_b,
    round(len(list_filter(range(1, {PORTABLE_MINHASH_K} + 1),
          i -> sa.s[i] = sb.s[i])) / CAST({PORTABLE_MINHASH_K} AS DOUBLE), 6) AS est_jaccard
  FROM cand c
  JOIN sv sa ON sa.doc_id = c.doc_a
  JOIN sv sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, est_jaccard FROM scored WHERE est_jaccard >= 0.5
"""


# ---------------------------------------------------------------------------
# dedup detection-quality evaluation (precision / recall / F1 vs exact truth)
# ---------------------------------------------------------------------------

DEDUP_EVAL_THRESHOLDS = (0.5, 0.6, 0.7, 0.8)


def dedup_eval(
    docs: DataFrame, thresholds: tuple[float, ...] = DEDUP_EVAL_THRESHOLDS
) -> DataFrame:
    """Detection-quality report for the MinHash+LSH near-dup detector:
    per similarity threshold, precision / recall / F1 of the portable
    LSH pipeline against EXACT shingle-set Jaccard ground truth — the
    report a curation run publishes before trusting a sketch-based
    dedup pass (the dedup-side analogue of ``retrieval_eval``).

    Truth and estimator score the SAME sets: both sides consume
    `_portable_shingle_arrays` (md5-hashed 3-gram shingles), so the
    eval isolates MinHash/LSH error (k=8 quantization + band misses)
    from tokenization differences.  Truth pairs come from the exact
    inverted-index self-join (`_gram_pair_counts_from`) over distinct
    shingle values — a superset of every pair with Jaccard > 0, so FN
    counts include candidates LSH never surfaced, not just pairs it
    under-scored.  A full-outer pair join classifies: at threshold t,
    TP = est>=t AND jac>=t, FP = est>=t AND jac<t, FN = jac>=t AND
    (est<t OR never predicted).

    Exactness: counts are BIGINTs; |est-jac| accumulates as
    DECIMAL(18,6) over the round(6) scores (order-free), and
    precision/recall/F1 are single IEEE divisions of identical
    integers, round(6)ed — hash-stable across engines.

    Scale: the exact truth join is the expensive gold standard — at
    production scale this eval runs over a deterministic doc_id-sampled
    slice (the operator composes with `doc_sample`), never the full
    corpus; the LSH side under eval is the same plan as production.
    Output is O(|thresholds|) rows."""
    # ONE tokenize+md5 shingle pass feeds BOTH the exact ground truth and
    # the MinHash estimator under eval (guide §2.4: don't recompute what
    # two branches share) — narrow to (doc_id, _sh) before materializing
    sh = (
        _portable_shingle_arrays(docs)
        .select("doc_id", "_sh")
        .localCheckpoint(eager=False)
    )
    # postings feed three consumers (sizes + both join sides): cut lineage
    # once, same rationale as _gram_pair_counts
    postings = (
        sh.select("doc_id", F.explode(F.array_distinct("_sh")).alias("g"))
        .localCheckpoint()
    )
    jac = F.round(
        F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c")), 6
    )
    truth = _gram_pair_counts_from(postings).select(
        "doc_a", "doc_b", jac.alias("jac")
    )
    pred = minhash_portable_pairs(docs, threshold=min(thresholds), sh=sh)
    both = truth.join(pred, ["doc_a", "doc_b"], "full_outer").select(
        F.coalesce(F.col("jac"), F.lit(0.0)).alias("jac"),
        # never-predicted pairs score below every threshold
        F.coalesce(F.col("est_jaccard"), F.lit(-1.0)).alias("est"),
    )
    th = F.explode(F.array(*[F.lit(t) for t in thresholds])).alias("threshold")
    scored = both.select("jac", "est", th)
    is_tp = (F.col("est") >= F.col("threshold")) & (F.col("jac") >= F.col("threshold"))
    is_fp = (F.col("est") >= F.col("threshold")) & (F.col("jac") < F.col("threshold"))
    is_fn = (F.col("jac") >= F.col("threshold")) & (F.col("est") < F.col("threshold"))
    abs_err = F.when(
        F.col("est") >= F.col("threshold"),
        F.abs(
            F.col("est").cast("decimal(18,6)") - F.col("jac").cast("decimal(18,6)")
        ),
    ).otherwise(F.lit(0).cast("decimal(18,6)"))
    agg = scored.groupBy("threshold").agg(
        F.sum(is_tp.cast("bigint")).alias("tp"),
        F.sum(is_fp.cast("bigint")).alias("fp"),
        F.sum(is_fn.cast("bigint")).alias("fn"),
        F.sum(abs_err).alias("_err"),
    )
    n_pred = F.col("tp") + F.col("fp")
    n_true = F.col("tp") + F.col("fn")
    precision = F.when(n_pred > 0, F.round(F.col("tp") / n_pred, 6))
    recall = F.when(n_true > 0, F.round(F.col("tp") / n_true, 6))
    f1 = F.when(
        precision.isNotNull() & recall.isNotNull() & ((precision + recall) > 0),
        F.round(2 * precision * recall / (precision + recall), 6),
    )
    mean_abs_err = F.when(
        n_pred > 0, F.round(F.col("_err").cast("double") / n_pred, 6)
    )
    return agg.select(
        "threshold",
        n_true.alias("n_true"),
        n_pred.alias("n_pred"),
        "tp",
        "fp",
        "fn",
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
        mean_abs_err.alias("mean_abs_err"),
    ).orderBy("threshold")


def q_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_eval(fan_out(load_table(spark, sf_dir, "documents")))


DEDUP_EVAL_SQL = rf"""
WITH {_PORTABLE_SHL_CTES},
postings AS (
  SELECT DISTINCT doc_id, g FROM shl, unnest(sh) AS u(g)
),
sizes AS (SELECT doc_id, count(*) AS n_g FROM postings GROUP BY doc_id),
truth AS (
  SELECT c.doc_a, c.doc_b,
    round(c.c / CAST(sa.n_g + sb.n_g - c.c AS DOUBLE), 6) AS jac
  FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
    FROM postings a JOIN postings b ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ) c
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
),
pred AS (
  SELECT * FROM ({DEDUP_MINHASH_PORTABLE_SQL}) _p
),
jp AS (
  SELECT coalesce(t.jac, 0.0) AS jac, coalesce(p.est_jaccard, -1.0) AS est
  FROM truth t FULL OUTER JOIN pred p
    ON t.doc_a = p.doc_a AND t.doc_b = p.doc_b
),
agg AS (
  SELECT th.threshold,
    CAST(coalesce(sum(CASE WHEN est >= th.threshold AND jac >= th.threshold THEN 1 END), 0) AS BIGINT) AS tp,
    CAST(coalesce(sum(CASE WHEN est >= th.threshold AND jac <  th.threshold THEN 1 END), 0) AS BIGINT) AS fp,
    CAST(coalesce(sum(CASE WHEN jac >= th.threshold AND est <  th.threshold THEN 1 END), 0) AS BIGINT) AS fn,
    coalesce(sum(CASE WHEN est >= th.threshold
      THEN abs(CAST(est AS DECIMAL(18,6)) - CAST(jac AS DECIMAL(18,6)))
      ELSE CAST(0 AS DECIMAL(18,6)) END), CAST(0 AS DECIMAL(18,6))) AS _err
  FROM jp CROSS JOIN (VALUES {", ".join(f"(CAST({t} AS DOUBLE))" for t in DEDUP_EVAL_THRESHOLDS)}) th(threshold)
  GROUP BY th.threshold
)
SELECT threshold, tp + fn AS n_true, tp + fp AS n_pred, tp, fp, fn,
  CASE WHEN tp + fp > 0 THEN round(tp / CAST(tp + fp AS DOUBLE), 6) END AS "precision",
  CASE WHEN tp + fn > 0 THEN round(tp / CAST(tp + fn AS DOUBLE), 6) END AS recall,
  CASE WHEN tp + fp > 0 AND tp + fn > 0
       AND round(tp / CAST(tp + fp AS DOUBLE), 6) + round(tp / CAST(tp + fn AS DOUBLE), 6) > 0
    THEN round(2 * round(tp / CAST(tp + fp AS DOUBLE), 6) * round(tp / CAST(tp + fn AS DOUBLE), 6)
               / (round(tp / CAST(tp + fp AS DOUBLE), 6) + round(tp / CAST(tp + fn AS DOUBLE), 6)), 6)
  END AS f1,
  CASE WHEN tp + fp > 0 THEN round(CAST(_err AS DOUBLE) / (tp + fp), 6) END AS mean_abs_err
FROM agg
ORDER BY threshold
"""


# ---------------------------------------------------------------------------
# SimHash near-dup (rows-only driver check)
# ---------------------------------------------------------------------------


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """64-bit SimHash over whitespace tokens: each token's xxhash64 votes
    +1/-1 per bit; sign of the per-bit sum forms the signature.  Built with
    array arithmetic (zip_with over a 64-wide vote vector) — one explode +
    one groupBy, JVM-side."""
    toks = docs.select(
        "doc_id", F.explode(ws_tokens(F.col("text"))).alias("t")
    ).select("doc_id", F.xxhash64("t").alias("h"))
    vote = lambda b: (F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
    summed = toks.groupBy("doc_id").agg(
        *[F.sum(vote(b)).alias(f"s{b}") for b in range(64)]
    )
    sig = None
    for b in range(64):
        bit = F.when(F.col(f"s{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return summed.select("doc_id", sig.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.  Candidates via
    the pigeonhole chunk join: the signature splits into max_hamming+1
    chunks — any pair within the bound must agree on >= 1 full chunk, so
    candidate generation is an equi join (shuffle-hash), never a cross
    product, and the candidate set is provably complete."""
    return _simhash_pigeonhole_pairs(simhash_signatures(docs), max_hamming, nbits=64)


def _simhash_pigeonhole_pairs(
    sig: DataFrame, max_hamming: int, nbits: int
) -> DataFrame:
    """Pigeonhole chunk join over a (doc_id, simhash) table — shared by
    the xxhash64 production path (64-bit) and the md5-portable oracled
    variant (60-bit)."""
    n_chunks = max_hamming + 1
    if n_chunks > 32:
        raise ValueError("max_hamming > 31 would need 1-bit chunks; use a different method")
    width = nbits // n_chunks  # chunks cover width*n_chunks bits; remainder bits
    # ride along in the last chunk via a wider mask

    def chunk(c: int) -> F.Column:
        bits = width if c < n_chunks - 1 else nbits - width * (n_chunks - 1)
        mask = (1 << bits) - 1
        return F.shiftright("simhash", width * c).bitwiseAND(F.lit(mask)).alias(f"c{c}")

    # localCheckpoint, NOT persist: the frame returned here is lazy, so a
    # persist/finally-unpersist pair is gone before the caller ever
    # materializes — each of the 2*n_chunks join sides silently rebuilt
    # the signature aggregation (the nbits per-bit vote sums) from the
    # raw text, the most expensive stage of the whole query.
    chunks = sig.select(
        "doc_id", "simhash", *[chunk(c) for c in range(n_chunks)]
    ).localCheckpoint(eager=False)
    cand = None
    for c in range(n_chunks):
        l = chunks.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), F.col(f"c{c}").alias("ck"))
        rr = chunks.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), F.col(f"c{c}").alias("ck"))
        x = l.join(rr, "ck").filter(F.col("doc_a") < F.col("doc_b")).select("doc_a", "doc_b", "sh_a", "sh_b")
        cand = x if cand is None else cand.unionByName(x)
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.distinct()
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_hamming=3 keeps the 4-chunk pigeonhole candidate set complete
    return simhash_pairs(fan_out(load_table(spark, sf_dir, "documents")), max_hamming=3)


PORTABLE_SIMHASH_BITS = 60


def simhash_portable_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs whose every bit is ENGINE-PORTABLE: token
    hashes are the md5-15-hex idiom (60 usable bits) instead of xxhash64,
    so DuckDB reproduces per-bit votes, signatures and hamming distances
    exactly — the SimHash family's hash-verified companion, like
    `minhash_portable_pairs` for MinHash.  Candidate generation is the
    SAME pigeonhole chunk join as production (`_simhash_pigeonhole_pairs`
    over 4×15-bit chunks); the oracle brute-forces all pairs, which is
    equivalent because the pigeonhole candidate set is complete for
    hamming <= max_hamming.  Production stays xxhash64 (JVM-side, full
    64 bits)."""
    nbits = PORTABLE_SIMHASH_BITS
    toks = docs.select(
        "doc_id", F.explode(ws_tokens(F.col("text"))).alias("t")
    ).select(
        "doc_id",
        F.expr("cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)").alias("h"),
    )
    vote = lambda b: (  # noqa: E731
        F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1
    ).cast("long")
    summed = toks.groupBy("doc_id").agg(
        *[F.sum(vote(b)).alias(f"s{b}") for b in range(nbits)]
    )
    sig = None
    for b in range(nbits):
        bit = F.when(
            F.col(f"s{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    sigs = summed.select("doc_id", sig.alias("simhash"))
    return _simhash_pigeonhole_pairs(sigs, max_hamming, nbits=nbits)


def q_dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_portable_pairs(fan_out(load_table(spark, sf_dir, "documents")))


DEDUP_SIMHASH_PORTABLE_SQL = rf"""
WITH t AS (
  SELECT doc_id,
    unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tk
  FROM documents
),
h AS (
  SELECT doc_id, CAST('0x' || substring(md5(tk), 1, 15) AS BIGINT) AS h FROM t
),
v AS (
  SELECT doc_id, b,
    sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, (SELECT unnest(range(0, {PORTABLE_SIMHASH_BITS})) AS b)
  GROUP BY doc_id, b
),
sig AS (
  -- DuckDB sums BIGINT into HUGEINT; cast back (values < 2^60 by construction)
  SELECT doc_id,
    CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b)
             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sh
  FROM v GROUP BY doc_id
)
-- brute-force all pairs: equivalent to the pigeonhole join (its candidate
-- set is complete for hamming <= the bound), tractable at oracle scale
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 3
"""


# ---------------------------------------------------------------------------
# embedding cosine near-dup (label-blocked; exact oracle)
# ---------------------------------------------------------------------------


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two float arrays, computed in float64 with
    a sequential left fold so the result is bit-stable across engines.

    Zero-norm vectors (failed/padded embeddings) yield NULL — matching SQL
    division-by-zero semantics — so they sort LAST under `desc()` instead
    of NaN sorting first and poisoning top-k results."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda acc, v: acc + v))
    denom = na * nb
    return F.when(denom > 0, dot / denom)


def embedding_near_dup(emb: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Blocked pairwise cosine: candidate pairs restricted to equal `label`
    (the pipeline's coarse cluster id), exact cosine above threshold."""
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("label"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("label"), F.col("embedding").alias("eb"))
    return (
        a.join(b, "label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("label", "vec_a", "vec_b", F.round(cosine(F.col("ea"), F.col("eb")), 4).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the synthetic embeddings carry NO true near-dups (max within-label
    # cosine ~0.47 at every sf), so the production 0.9 threshold would
    # return an always-empty result — verifiable but vacuous.  0.35 keeps
    # the same blocked-pairwise plan while producing a non-empty,
    # hash-compared pair set at all three fixture scales (14/26/391 rows).
    return embedding_near_dup(fan_out(load_table(spark, sf_dir, "embeddings")), threshold=0.35)


DEDUP_EMBEDDING_SQL = r"""
WITH a AS (SELECT vec_id AS vec_a, label, embedding AS ea FROM embeddings),
     b AS (SELECT vec_id AS vec_b, label, embedding AS eb FROM embeddings),
pairs AS (
  SELECT a.label, vec_a, vec_b,
    round(
      list_aggregate(list_transform(range(1, len(ea) + 1), i -> CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)), 'sum')
      / (sqrt(list_aggregate(list_transform(ea, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
         * sqrt(list_aggregate(list_transform(eb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 4) AS cos
  FROM a JOIN b ON a.label = b.label AND vec_a < vec_b
)
SELECT label, vec_a, vec_b, cos FROM pairs WHERE cos >= 0.35
"""


def q_emb_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-sensitivity report for embedding near-dup: pair counts
    per cosine decile band plus the cumulative count at-or-above each
    band — the table an operator reads to PICK `dedup_embedding`'s
    threshold instead of guessing.  One pass over the same label-blocked
    pair join (no threshold filter), a tiny groupBy on the band index,
    and a running sum over the O(20)-row band table only — the window
    never touches pair-level data.  Band index is floor(cos*10) on the
    already-rounded cosine: identical doubles in both engines, so the
    integer bands hash-match.

    Norms are precomputed PER VECTOR (O(V·dim)) and each vector is
    normalized once, so the O(V²) pair stage runs a single dot fold —
    recomputing both norms inside every pair (the naive formulation)
    triples the dominant cost for no reason.  Division order is fixed
    (x / norm elementwise, then a sequential left-fold dot), IEEE-
    deterministic in both engines."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    unit = emb.select(
        "vec_id",
        "label",
        F.when(
            norm > 0,
            # norm evaluated once per row (see similarity.py unit note)
            F.zip_with(
                F.col("embedding"),
                F.array_repeat(norm, F.size(F.col("embedding"))),
                lambda x, n: x.cast("double") / n,
            ),
        ).alias("u"),
    ).filter(F.col("u").isNotNull())
    a = unit.select(F.col("vec_id").alias("vec_a"), "label", F.col("u").alias("ua"))
    b = unit.select(F.col("vec_id").alias("vec_b"), "label", F.col("u").alias("ub"))
    dot = F.aggregate(
        F.zip_with(F.col("ua"), F.col("ub"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    pairs = (
        a.join(b, "label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(F.round(dot, 4).alias("cos"))
    )
    bands = pairs.select(
        F.floor(F.col("cos") * 10).cast("int").alias("band")
    ).groupBy("band").agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("band").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        bands.withColumn("n_pairs_ge", F.sum("n_pairs").over(w).cast("bigint"))
        .select("band", "n_pairs", "n_pairs_ge")
        .orderBy("band")
    )


EMB_THRESHOLD_SWEEP_SQL = r"""
WITH unit AS (
  SELECT vec_id, label,
    list_transform(embedding, x -> CAST(x AS DOUBLE)
      / sqrt(list_aggregate(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum'))) AS u
  FROM embeddings
  WHERE sqrt(list_aggregate(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum')) > 0
),
a AS (SELECT vec_id AS vec_a, label, u AS ua FROM unit),
b AS (SELECT vec_id AS vec_b, label, u AS ub FROM unit),
pairs AS (
  SELECT
    round(list_aggregate(list_transform(range(1, len(ua) + 1), i -> ua[i] * ub[i]), 'sum'), 4) AS cos
  FROM a JOIN b ON a.label = b.label AND vec_a < vec_b
),
bands AS (
  SELECT CAST(floor(cos * 10) AS INTEGER) AS band, CAST(count(*) AS BIGINT) AS n_pairs
  FROM pairs GROUP BY 1
)
SELECT band, n_pairs,
  CAST(sum(n_pairs) OVER (ORDER BY band DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_pairs_ge
FROM bands
ORDER BY band
"""


# ---------------------------------------------------------------------------
# dup clusters — connected components over near-dup pairs
# ---------------------------------------------------------------------------


def _local_components(p: DataFrame) -> DataFrame:
    """Single-task union-find over a small pair list (Arrow-batched
    applyInPandas; executor-side, never the driver).  Same output contract
    as the iterative path: (cluster_id = min doc_id in component, doc_id)
    for every vertex that appears in a pair."""
    import pandas as pd  # noqa: PLC0415 — executor-side import

    def uf(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(pdf["doc_a"], pdf["doc_b"]):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        verts = set(pdf["doc_a"]) | set(pdf["doc_b"])
        rows = [(find(v), v) for v in sorted(verts)]
        return pd.DataFrame(rows, columns=["cluster_id", "doc_id"])

    return p.groupBy(F.lit(1).alias("_g")).applyInPandas(
        uf, "cluster_id long, doc_id long"
    )


# below this many pairs the component graph comfortably fits one task and
# local union-find beats rounds of tiny shuffles (the same size-adaptive
# logic as Spark's broadcast-join threshold)
LOCAL_COMPONENTS_THRESHOLD = 2_000_000


def dup_clusters(
    pairs: DataFrame,
    max_iter: int = 25,
    local_threshold: int = LOCAL_COMPONENTS_THRESHOLD,
) -> DataFrame:
    """Turn a near-dup PAIR list into dedup GROUPS: connected components,
    cluster_id = min doc_id in the component (what a pipeline keeps).

    Size-adaptive: the pair list is counted once (it is materialized
    anyway); small graphs (< LOCAL_COMPONENTS_THRESHOLD pairs) run
    single-task union-find (O(E α) — one Arrow batch, no per-round
    shuffles), large graphs run distributed iterative min-label
    propagation — per round each vertex takes the min of its own label
    and its neighbors', one equi-join + one groupBy per round, converging
    in O(component diameter) rounds (near-dup clusters are small;
    max_iter bounds adversarial chains).  Every step is hash-partitioned
    on doc_id; the driver sees only counts.  Labels are persisted per
    round so lineage stays O(1) instead of O(iterations)."""
    # cut the pair lineage first: the symmetric union references `pairs`
    # twice, so without materialization the (expensive) pair computation
    # runs twice just to build the edge list
    p = pairs.select("doc_a", "doc_b").localCheckpoint()
    from pyspark.sql.types import LongType

    ids_are_long = isinstance(p.schema["doc_a"].dataType, LongType)
    if ids_are_long and p.count() < local_threshold:
        return _local_components(p)
    # no .distinct(): duplicate edges are harmless under min-aggregation,
    # and near-dup pair lists are already unique — dropping it removes a
    # full shuffle of the edge list
    edges = (
        p.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(p.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .persist()
    )
    to_free = [edges, labels]
    try:
        n_changed = 0
        for _ in range(max_iter):
            nbr_min = (
                edges.join(labels, edges.dst == labels.doc_id)
                .groupBy("src")
                .agg(F.min("label").alias("nbr_label"))
            )
            # localCheckpoint (eager), NOT persist: each round's plan
            # references `labels` twice, so without a lineage cut the
            # logical plan doubles per round — ~2^rounds nodes, a
            # multi-GB plan string and driver OOM past ~12 rounds.
            # Checkpointing materializes the (small) label table and
            # restarts the lineage at O(1) every round.
            stepped = (
                labels.join(nbr_min, labels.doc_id == nbr_min.src, "left")
                .select(
                    labels.doc_id,
                    F.least(
                        labels.label, F.coalesce(F.col("nbr_label"), labels.label)
                    ).alias("label"),
                    (F.col("nbr_label") < labels.label).alias("_chg"),
                )
                .localCheckpoint()
            )
            n_changed = stepped.filter(F.col("_chg")).count()
            labels = stepped.drop("_chg")
            if n_changed == 0:
                break
        if n_changed != 0:
            # returning the partially-propagated labels would silently split
            # one true component into several clusters (component diameter
            # exceeded max_iter rounds) — fail loudly instead
            raise RuntimeError(
                f"dup_clusters did not converge in {max_iter} rounds "
                f"({n_changed} labels still changing); raise max_iter (a "
                "diameter this large usually means the pair threshold is "
                "admitting chains, not near-dup clusters)"
            )
        return labels.select(F.col("label").alias("cluster_id"), "doc_id")
    finally:
        # the returned labels are checkpointed (self-contained), so the
        # edge/seed caches can be freed unconditionally
        for df in to_free:
            df.unpersist()


# Materialized cluster table, fingerprint-keyed per corpus (same cache
# discipline as the LSH/IVF indexes): production pipelines compute
# components ONCE per corpus snapshot and every downstream consumer
# (cluster stats, canonical selection) reads the table — re-running the
# pair join + CC per consumer would multiply the most expensive dedup
# stage by the number of consumers.
_CLUSTERS: dict[tuple, str] = {}

# Materialized df-capped posting table, same discipline: the inverted
# index is a derived corpus structure with FOUR consumers (Jaccard,
# containment, the cluster build's pair stage, and both sides of each
# self-join) — build once per corpus snapshot, read everywhere.
_POSTINGS: dict[tuple, str] = {}


def _postings_for(
    spark: SparkSession, sf_dir: str, n: int = 3, df_cap: int = 1000
) -> str:
    def _build(tmp: str) -> None:
        _rare_postings(
            fan_out(load_table(spark, sf_dir, "documents")), n, df_cap
        ).write.mode("overwrite").parquet(tmp)

    return snapshot_path(
        _POSTINGS,
        fingerprint_key(sf_dir, "documents", n, df_cap),
        "realparse_postings_",
        _build,
    )


def _clusters_for(spark: SparkSession, sf_dir: str) -> str:
    def _build(tmp: str) -> None:
        # pair stage reads the shared posting table too
        pairs = q_dedup_ngram(spark, sf_dir)
        dup_clusters(pairs).write.mode("overwrite").parquet(tmp)

    return snapshot_path(
        _CLUSTERS,
        fingerprint_key(sf_dir, "documents", 3, 0.5),
        "realparse_clusters_",
        _build,
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(_clusters_for(spark, sf_dir))


def dedup_incremental(incoming: DataFrame, corpus: DataFrame) -> DataFrame:
    """Daily-ingest dedup: drop incoming docs whose exact fingerprint
    already exists in the historical corpus (LEFT ANTI join — at scale the
    corpus side is a bucketed fingerprint store, so the join co-locates),
    then collapse in-batch duplicates to the lowest doc_id.  Returns the
    surviving rows with their fingerprint (what gets appended to the
    store)."""
    fp = lambda c: F.md5(F.regexp_replace(F.trim(F.lower(c)), r"\s+", " "))  # noqa: E731
    inc = incoming.withColumn("fp_md5", fp(F.col("text")))
    seen = corpus.select(fp(F.col("text")).alias("fp_md5")).distinct()
    fresh = inc.join(seen, "fp_md5", "left_anti")
    from pyspark.sql import Window

    w = Window.partitionBy("fp_md5").orderBy("doc_id")
    return (
        fresh.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "fp_md5", "source")
    )


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic corpus/incoming partition of the fixture: every 5th
    # doc is "incoming", the rest are the historical corpus
    docs = load_table(spark, sf_dir, "documents")
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return dedup_incremental(incoming, corpus)


DEDUP_INCREMENTAL_SQL = r"""
WITH fp AS (
  SELECT doc_id, source,
    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp_md5,
    doc_id % 5 = 0 AS is_incoming
  FROM documents
),
fresh AS (
  SELECT i.* FROM fp i
  WHERE i.is_incoming
    AND NOT EXISTS (SELECT 1 FROM fp c WHERE NOT c.is_incoming AND c.fp_md5 = i.fp_md5)
),
ranked AS (
  SELECT doc_id, fp_md5, source,
    row_number() OVER (PARTITION BY fp_md5 ORDER BY doc_id) AS rn
  FROM fresh
)
SELECT doc_id, fp_md5, source FROM ranked WHERE rn = 1
"""


def canonical_docs(
    docs: DataFrame, pairs: DataFrame, clusters: DataFrame | None = None
) -> DataFrame:
    """Per-document keep/drop decision: cluster near-dup pairs, then keep
    exactly one canonical doc per cluster — the one with the most
    whitespace tokens (ties -> lowest doc_id).  Singletons (docs in no
    pair) are their own cluster and always kept.

    Pass a pre-materialized `clusters` table (see `_clusters_for`) to
    skip recomputing components — the production consumption path.
    The ranking window partitions by cluster_id (hash-shuffled; near-dup
    clusters are small, so no skew) — never a global sort."""
    from pyspark.sql import Window

    from realparse_spark.operators.text import token_count_ws

    if clusters is None:
        clusters = dup_clusters(pairs)
    base = docs.select("doc_id", token_count_ws(F.col("text")).alias("n_tok"))
    labeled = base.join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        "n_tok",
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_tok"), F.asc("doc_id"))
    return labeled.select(
        "doc_id",
        "cluster_id",
        "n_tok",
        (F.row_number().over(w) == 1).alias("is_canonical"),
    )


def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    clusters = spark.read.parquet(_clusters_for(spark, sf_dir))
    return canonical_docs(docs, pairs=None, clusters=clusters)


def minhash_dedup_e2e(docs: DataFrame, sig: DataFrame | None = None) -> DataFrame:
    """The composed fuzzy-dedup lifecycle a real curation run executes —
    corpus → MinHash signatures → LSH banded candidate pairs → connected
    components → canonical keep-list — in ONE plan: per document
    (doc_id, cluster_id, n_tok, is_canonical), where exactly one member
    of each near-dup group survives (most whitespace tokens, ties →
    lowest doc_id) and singletons always survive.  The individual stages
    are the already-registered operators (`minhash_signatures`,
    `minhash_lsh_pairs`, `dup_clusters`, `canonical_docs`); this query
    pins that their COMPOSITION round-trips — a signature/banding change
    that silently orphans pairs or splits components breaks this row
    first.

    Rows-only driver check (xxhash64 signatures are not DuckDB-
    reproducible); the lifecycle's real guarantees are the planted-dup
    parity gates in tests/test_dedup.py: planted copies cluster
    together with one canonical, non-dups stay singleton-canonical, and
    the keep-list partitions the corpus exactly.

    Scale: each stage is the registered operator's plan unchanged —
    narrow signature projection, banded equi-joins with the hot-bucket
    star cap, size-adaptive components, per-cluster (never global)
    ranking window.  The signature table is the one reusable artifact;
    production writes it next to the corpus snapshot (`_minhash_sig_for`)
    and this composition reads it back."""
    if sig is None:
        sig = minhash_signatures(docs)
    pairs = minhash_lsh_pairs(None, sig=sig)
    clusters = dup_clusters(pairs)
    return canonical_docs(docs, pairs=None, clusters=clusters)


def q_dedup_minhash_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    sig = spark.read.parquet(_minhash_sig_for(spark, sf_dir))
    return minhash_dedup_e2e(docs, sig=sig)


# transitive closure is exactly what SQL recursion is for: the oracle
# reproduces the same components with a recursive CTE over the same pairs
DEDUP_CLUSTERS_SQL = (
    "WITH RECURSIVE "
    + _NGRAM_CTES
    + r""",
spairs AS (SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.5),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM spairs
  UNION
  SELECT doc_b, doc_a FROM spairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT least(a, min(b)) AS cluster_id, a AS doc_id
FROM reach GROUP BY a
"""
)

DEDUP_CANONICAL_SQL = (
    "WITH RECURSIVE "
    + _NGRAM_CTES
    + r""",
spairs AS (SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.5),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM spairs
  UNION
  SELECT doc_b, doc_a FROM spairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
clus AS (
  SELECT least(a, min(b)) AS cluster_id, a AS doc_id
  FROM reach GROUP BY a
),
base AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS INTEGER) AS n_tok
  FROM documents
),
labeled AS (
  SELECT b.doc_id, coalesce(c.cluster_id, b.doc_id) AS cluster_id, b.n_tok
  FROM base b LEFT JOIN clus c ON c.doc_id = b.doc_id
)
SELECT doc_id, cluster_id, n_tok,
  row_number() OVER (PARTITION BY cluster_id ORDER BY n_tok DESC, doc_id ASC) = 1 AS is_canonical
FROM labeled
"""
)


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram,
    "dedup_prefix_jaccard": q_dedup_prefix_jaccard,
    "dedup_containment": q_dedup_containment,
    "dedup_minhash_lsh": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding": q_dedup_embedding,
    "emb_threshold_sweep": q_emb_threshold_sweep,
    "dedup_clusters": q_dedup_clusters,
    "dedup_canonical": q_dedup_canonical,
    "dedup_incremental": q_dedup_incremental,
    "dedup_incremental_minhash": q_dedup_incremental_minhash,
    "soft_dedup_weights": q_soft_dedup_weights,
    # composed lifecycle: signatures -> LSH pairs -> components -> keep-list
    # (rows-only: xxhash64 signatures; parity gates in tests/test_dedup.py)
    "dedup_minhash_e2e": q_dedup_minhash_e2e,
    # md5-hash MinHash+LSH: the hash-verified companion for the family
    "dedup_minhash_portable": q_dedup_minhash_portable,
    "dedup_eval": q_dedup_eval,
    # md5-hash SimHash: the hash-verified companion for that family
    "dedup_simhash_portable": q_dedup_simhash_portable,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": DEDUP_NGRAM_SQL,
    "dedup_prefix_jaccard": DEDUP_PREFIX_JACCARD_SQL,
    "dedup_containment": DEDUP_CONTAINMENT_SQL,
    # dedup_minhash_lsh / dedup_simhash: xxhash64-based signatures are not
    # reproducible in DuckDB -> rows-only driver check; quality asserted in
    # tests/test_dedup.py against exact Jaccard / hamming ground truth.
    "dedup_embedding": DEDUP_EMBEDDING_SQL,
    "emb_threshold_sweep": EMB_THRESHOLD_SWEEP_SQL,
    "dedup_clusters": DEDUP_CLUSTERS_SQL,
    "dedup_canonical": DEDUP_CANONICAL_SQL,
    "dedup_incremental": DEDUP_INCREMENTAL_SQL,
    "soft_dedup_weights": SOFT_DEDUP_WEIGHTS_SQL,
    "dedup_minhash_portable": DEDUP_MINHASH_PORTABLE_SQL,
    "dedup_eval": DEDUP_EVAL_SQL,
    "dedup_simhash_portable": DEDUP_SIMHASH_PORTABLE_SQL,
}
