"""Exact duplicate-SPAN analysis and subword (BPE) tokenizer training.

Extends the dedup family (document-level: `dedup.py`) down to the
sub-document level a pretraining pipeline needs:

- ``dup_span_report`` / ``dup_span_profile`` — the ExactSubstr shape of
  Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
  Better", arXiv:2107.06499): find every word k-gram that occurs >= 2
  times ANYWHERE in the corpus (across documents or repeated inside
  one), then merge overlapping/adjacent hits into maximal duplicated
  spans per document.  The reference repo filters whole lines by
  content (the `.wma`/`.wmv` substring gate in `web_parse.pl`); this is
  the corpus-curation generalization: a span report is what decides
  whether to drop a document, clip the span, or keep it.
- ``bpe_train`` — byte-pair-encoding merge training (Sennrich et al.
  2016) as a driver-loop over Spark aggregates: the per-iteration pair
  count is the distributed part, the argmax/merge bookkeeping is O(1)
  driver state per step (the `pagerank_parts` iterate-over-aggregates
  discipline).  One step of this loop is the already-oracled
  `bpe_pair_counts` (text.py:1149).

Scale design (100 TB): the gram inverted count is ONE map-side-combined
groupBy on a compact md5 key; the duplicate-flag join back to positions
is LINEAR in gram occurrences (never pairwise — we need positions, not
pairs); ultra-hot boilerplate grams make a skewed join key, which AQE
skew-join splitting handles (the flag side is tiny per key: just the
key itself).  The island merge windows are partitioned BY DOCUMENT, so
no task ever sees more rows than one document's gram count.  BPE
collapses the corpus to the distinct-word table first — the Zipf head
makes every subsequent iteration O(vocab), independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realparse_spark.operators.text import ws_tokens
from realparse_spark.sources.tables import load_table

SPAN_K = 8  # words per gram: long enough that English text rarely collides

# ---------------------------------------------------------------------------
# duplicate spans (ExactSubstr shape)
# ---------------------------------------------------------------------------


def _doc_tokens(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select(
        "doc_id", "source", ws_tokens(F.lower(F.col(text_col))).alias("tk")
    )


def _gram_positions(base: DataFrame, k: int) -> DataFrame:
    """(doc_id, pos, gkey) for every k-gram occurrence.  Positions are
    0-based token offsets; the key is an md5 of the joined gram — a
    compact, engine-portable join key (the shuffle moves 32-byte
    digests, never k-word strings).  Shared by the report, profile and
    clip queries so a gram-key change cannot desynchronize them."""
    grams_arr = F.when(
        F.size("tk") >= k,
        F.transform(
            F.sequence(F.lit(0), F.size("tk") - k),
            lambda i: F.md5(F.array_join(F.slice(F.col("tk"), i + 1, k), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select("doc_id", F.posexplode(grams_arr).alias("pos", "gkey"))


def _dup_gram_hits(base: DataFrame, k: int) -> DataFrame:
    """(doc_id, pos) of every k-gram occurrence whose gram appears >= 2
    times corpus-wide."""
    grams = _gram_positions(base, k)
    dup = (
        grams.groupBy("gkey")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") >= 2)
        .select("gkey")
    )
    # linear in occurrences: grams ⋉ dup-keys; hot boilerplate keys are
    # split by AQE skew-join (the dup side carries one row per key)
    return grams.join(dup, "gkey").select("doc_id", "pos")


def _merged_spans(hits: DataFrame, k: int) -> DataFrame:
    """Gaps-and-islands merge of [pos, pos+k) hit intervals per document:
    overlapping OR adjacent hits fuse into one maximal duplicated span.
    All-integer arithmetic; windows are doc-partitioned (bounded by the
    longest single document, never the corpus)."""
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = hits.withColumn(
        "new_isl",
        (
            F.col("pos")
            > F.coalesce(F.max(F.col("pos") + k).over(w_prev), F.lit(-1))
        ).cast("int"),
    ).withColumn("island", F.sum("new_isl").over(w_run))
    return isl.groupBy("doc_id", "island").agg(
        F.min("pos").alias("s"), (F.max("pos") + k).alias("e")
    )


def dup_span_report(
    docs: DataFrame, k: int = SPAN_K, text_col: str = "text"
) -> DataFrame:
    """Per-document duplicated-span report: how many maximal duplicated
    spans each document carries, how many tokens they cover, and the
    duplicated fraction — the table an ExactSubstr-style cleaner (clip
    spans / drop docs over a threshold) consumes."""
    base = _doc_tokens(docs, text_col)
    spans = _merged_spans(_dup_gram_hits(base, k), k)
    perdoc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s")).cast("bigint").alias("dup_tokens"),
    )
    ntok = base.select("doc_id", F.size("tk").cast("bigint").alias("n_tokens"))
    return (
        perdoc.join(ntok, "doc_id")
        .select(
            "doc_id",
            "n_spans",
            "dup_tokens",
            "n_tokens",
            F.round(F.col("dup_tokens") / F.col("n_tokens"), 4).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


def dup_span_profile(
    docs: DataFrame, k: int = SPAN_K, text_col: str = "text"
) -> DataFrame:
    """Per-source rollup of the span report: which sources are flooding
    the corpus with repeated text — the drift metric a curation pipeline
    tracks per crawl snapshot."""
    base = _doc_tokens(docs, text_col)
    spans = _merged_spans(_dup_gram_hits(base, k), k)
    perdoc = spans.groupBy("doc_id").agg(
        F.sum(F.col("e") - F.col("s")).cast("bigint").alias("dup_tokens")
    )
    per_source = base.join(perdoc, "doc_id", "left").select(
        "source",
        F.size("tk").cast("bigint").alias("n_tokens"),
        F.coalesce(F.col("dup_tokens"), F.lit(0)).alias("dup_tokens"),
    )
    return (
        per_source.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("dup_tokens") > 0).cast("long")).alias("docs_hit"),
            F.sum("dup_tokens").alias("dup_tokens"),
            F.sum("n_tokens").alias("total_tokens"),
            # greatest(..., 1): a source whose docs all tokenize empty
            # must not divide by zero (ANSI Spark throws, DuckDB NULLs)
            F.round(
                F.sum("dup_tokens") / F.greatest(F.sum("n_tokens"), F.lit(1)), 4
            ).alias("dup_frac"),
        )
        .orderBy("source")
    )


def q_doc_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realparse_spark.sources.tables import fan_out

    # fan_out: the gram explode is the heavy stage and single-row-group
    # fixtures would serialize it into one task
    return dup_span_report(fan_out(load_table(spark, sf_dir, "documents")))


def q_dup_span_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realparse_spark.sources.tables import fan_out

    return dup_span_profile(fan_out(load_table(spark, sf_dir, "documents")))


# toks/grams: the single SQL home of the tokenization + gram-key text,
# mirroring _gram_positions — every span oracle builds on it
_TOKS_GRAMS_CTE = rf"""
toks AS (
  SELECT doc_id, source,
    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS tk
  FROM documents
),
grams AS (
  SELECT doc_id,
    unnest(range(1, greatest(len(tk) - {SPAN_K}, -1) + 2)) - 1 AS pos,
    unnest(list_transform(range(1, greatest(len(tk) - {SPAN_K}, -1) + 2),
           i -> md5(array_to_string(tk[i:i+{SPAN_K - 1}], ' ')))) AS gkey
  FROM toks
)"""

_SPAN_GRAMS_CTE = rf"""{_TOKS_GRAMS_CTE},
dup AS (SELECT gkey FROM grams GROUP BY gkey HAVING count(*) >= 2),
hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gkey)),
isl AS (
  SELECT doc_id, pos,
    CASE WHEN pos > coalesce(max(pos + {SPAN_K}) OVER (
        PARTITION BY doc_id ORDER BY pos
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
      THEN 1 ELSE 0 END AS new_isl
  FROM hits
),
isl2 AS (
  SELECT doc_id, pos, sum(new_isl) OVER (
      PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl
),
spans AS (
  SELECT doc_id, island, min(pos) AS s, max(pos) + {SPAN_K} AS e
  FROM isl2 GROUP BY doc_id, island
),
perdoc AS (
  SELECT doc_id, count(*) AS n_spans, CAST(sum(e - s) AS BIGINT) AS dup_tokens
  FROM spans GROUP BY doc_id
)"""

DOC_DUP_SPANS_SQL = rf"""
WITH {_SPAN_GRAMS_CTE}
SELECT p.doc_id, p.n_spans, p.dup_tokens,
       CAST(len(t.tk) AS BIGINT) AS n_tokens,
       round(p.dup_tokens / CAST(len(t.tk) AS BIGINT), 4) AS dup_frac
FROM perdoc p JOIN toks t USING (doc_id)
ORDER BY doc_id
"""

DUP_SPAN_PROFILE_SQL = rf"""
WITH {_SPAN_GRAMS_CTE}
SELECT t.source,
  count(*) AS n_docs,
  CAST(sum(CASE WHEN coalesce(p.dup_tokens, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS docs_hit,
  CAST(sum(coalesce(p.dup_tokens, 0)) AS BIGINT) AS dup_tokens,
  CAST(sum(len(t.tk)) AS BIGINT) AS total_tokens,
  round(sum(coalesce(p.dup_tokens, 0)) / greatest(sum(len(t.tk)), 1), 4) AS dup_frac
FROM toks t LEFT JOIN perdoc p USING (doc_id)
GROUP BY t.source
ORDER BY t.source
"""


def dup_span_clip(
    docs: DataFrame, k: int = SPAN_K, text_col: str = "text"
) -> DataFrame:
    """Per-source accounting for the ExactSubstr CLEANING step: keep the
    corpus-FIRST occurrence of every duplicated k-gram (minimal
    (doc_id, pos)) and clip every later occurrence.  A token is clipped
    only if it is covered by SOME later occurrence and by NO kept one —
    without that difference, a boilerplate run longer than k (whose
    kept first gram overlaps its own clipped repeats) would charge
    tokens the clean text actually retains.  The report says how many
    tokens the clip would remove per source — run after
    `dup_span_report` says a source is worth cleaning.

    Scale: same linear gram machinery as the report; the canonical-first
    choice is ONE row_number per gram key (keyed window — a hot
    boilerplate gram concentrates its occurrences in one task, the same
    skew AQE handles at the flag join; the window state is O(occurrences
    of that gram), never corpus-sized).  The coverage difference
    explodes each dup hit to its k token positions — k x dup-hits rows,
    still occurrence-linear — and resolves per (doc, position) with one
    doc-keyed aggregate."""
    base = _doc_tokens(docs, text_col)
    grams = _gram_positions(base, k)
    w_g = Window.partitionBy("gkey").orderBy("doc_id", "pos")
    w_cnt = Window.partitionBy("gkey")
    marked = grams.select(
        "doc_id",
        "pos",
        (F.row_number().over(w_g) >= 2).cast("int").alias("clipped"),
        F.count(F.lit(1)).over(w_cnt).alias("occ"),
    ).filter(F.col("occ") >= 2)
    # token-level coverage: a position is removed iff covered by a
    # clipped hit and by no kept hit in the same document
    tokens = marked.select(
        "doc_id",
        "clipped",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + k - 1)).alias("tpos"),
    )
    perdoc = (
        tokens.groupBy("doc_id", "tpos")
        .agg(F.min("clipped").alias("all_clipped"))
        .groupBy("doc_id")
        .agg(F.sum("all_clipped").cast("bigint").alias("clip_tokens"))
    )
    per_source = base.join(perdoc, "doc_id", "left").select(
        "source",
        F.size("tk").cast("bigint").alias("n_tokens"),
        F.coalesce(F.col("clip_tokens"), F.lit(0)).alias("clip_tokens"),
    )
    return (
        per_source.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("clip_tokens") > 0).cast("long")).alias("docs_clipped"),
            F.sum("clip_tokens").alias("clip_tokens"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.lit(1.0)
                - F.sum("clip_tokens") / F.greatest(F.sum("n_tokens"), F.lit(1)),
                4,
            ).alias("kept_frac"),
        )
        .orderBy("source")
    )


def q_doc_span_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realparse_spark.sources.tables import fan_out

    return dup_span_clip(fan_out(load_table(spark, sf_dir, "documents")))


DOC_SPAN_CLIP_SQL = rf"""
WITH {_TOKS_GRAMS_CTE},
marked AS (
  SELECT doc_id, pos,
    CASE WHEN row_number() OVER (PARTITION BY gkey ORDER BY doc_id, pos) >= 2
      THEN 1 ELSE 0 END AS clipped,
    count(*) OVER (PARTITION BY gkey) AS occ
  FROM grams
),
tokens AS (
  SELECT doc_id, clipped, unnest(range(pos, pos + {SPAN_K})) AS tpos
  FROM marked WHERE occ >= 2
),
perdoc AS (
  SELECT doc_id, CAST(sum(all_clipped) AS BIGINT) AS clip_tokens
  FROM (SELECT doc_id, tpos, min(clipped) AS all_clipped
        FROM tokens GROUP BY doc_id, tpos)
  GROUP BY doc_id
)
SELECT t.source,
  count(*) AS n_docs,
  CAST(sum(CASE WHEN coalesce(p.clip_tokens, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS docs_clipped,
  CAST(sum(coalesce(p.clip_tokens, 0)) AS BIGINT) AS clip_tokens,
  CAST(sum(len(t.tk)) AS BIGINT) AS total_tokens,
  round(1.0 - sum(coalesce(p.clip_tokens, 0)) / greatest(sum(len(t.tk)), 1), 4)
    AS kept_frac
FROM toks t LEFT JOIN perdoc p USING (doc_id)
GROUP BY t.source
ORDER BY t.source
"""


# ---------------------------------------------------------------------------
# BPE merge training (iterative)
# ---------------------------------------------------------------------------

BPE_MERGES = 8


def _merge_fold(col, left: str, right: str):
    """One greedy left-to-right merge pass as a fold expression: keep
    appending symbols, but when the running tail equals `left` and the
    next symbol equals `right`, replace the tail with the merged symbol.
    Replacing the TAIL reproduces greedy pairing exactly (merging (a,a)
    over "aaaa" yields [aa, aa], never [aa, a, a]).  The single home of
    the pairing semantics — shared by the trainer loop and the apply
    report."""
    merged = left + right
    return F.when(
        F.size(col) < 2,
        col,
    ).otherwise(
        F.aggregate(
            F.slice(col, F.lit(2), F.size(col) - 1),
            F.slice(col, 1, 1),
            lambda acc, x: F.when(
                (F.element_at(acc, -1) == F.lit(left)) & (x == F.lit(right)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(F.lit(merged)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
    )


def bpe_train(docs: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """Train the first ``n_merges`` BPE merges over the corpus vocabulary
    (Sennrich et al. 2016, arXiv:1508.07909): start from characters,
    repeatedly count adjacent symbol pairs weighted by word frequency,
    merge the most frequent pair (ties broken lexicographically), and
    apply the merge greedily left-to-right inside every word.

    Returns the merge table ``(step, left, right, pair_freq)`` —
    deterministic given the corpus.  Iterative, hence no SQL oracle; the
    pure-Python reference parity test is tests/test_spans.py.

    Scale: the corpus collapses ONCE to the distinct-word table (map-side
    combined groupBy); every iteration then runs over O(vocab) rows — a
    pair explode bounded by word length, one aggregation, a TakeOrdered(1)
    argmax (single-row collect, the `pagerank_parts` discipline), and the
    merge applied as a pure fold expression (zero Python row work).
    localCheckpoint per step cuts the growing lineage.  Production merge
    counts (30k+) batch several non-overlapping merges per round instead
    of one — same plan per round, fewer rounds."""
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(ws_tokens(F.lower(F.col("text")))).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wc"))
    )
    syms = words.select(
        "wc",
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)),
        ).alias("syms"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        pairs = syms.filter(F.size("syms") >= 2).select(
            "wc",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("l"),
                        F.element_at("syms", i + 1).alias("r"),
                    ),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wc").alias("n"))
            .orderBy(F.col("n").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, freq = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append((step, left, right, freq))
        # the greedy tail-replacement fold lives ONCE in _merge_fold
        # (shared with bpe_apply_report, so trainer and apply can never
        # disagree on pairing semantics)
        syms = syms.withColumn(
            "syms", _merge_fold(F.col("syms"), left, right)
        ).localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges, schema="step int, left string, right string, pair_freq bigint"
    )


# Materialized merge table, fingerprint-keyed per corpus — the trainer
# is the expensive iterative stage and has TWO consumers (the train
# readout and the apply report); production trains once and applies for
# the corpus lifetime, so the derived artifact follows the same
# snapshot-cache discipline as the prefix/minhash/cluster tables.
_BPE_CACHE: dict[tuple, str] = {}


def _merges_for(spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES):
    from realparse_spark.cache import fingerprint_key, snapshot_path
    from realparse_spark.sources.tables import fan_out

    def _build(tmp: str) -> None:
        docs = fan_out(load_table(spark, sf_dir, "documents"))
        bpe_train(docs, n_merges).coalesce(1).write.mode("overwrite").parquet(tmp)

    path = snapshot_path(
        _BPE_CACHE,
        fingerprint_key(sf_dir, "documents", "bpe-merges", n_merges),
        "realparse_bpe_",
        _build,
    )
    return spark.read.parquet(path)


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _merges_for(spark, sf_dir).orderBy("step")


def bpe_apply_report(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    word_filter: str | None = None,
    wrapped_replace: bool = False,
) -> DataFrame:
    """Apply a trained merge list to the corpus and report per-source
    subword compression — the deploy half of BPE: tokenize with the
    artifact `bpe_train` produced and measure chars/token per source
    (the number a data pipeline watches to catch tokenizer-hostile
    sources before training).

    Scale: segmentation is computed ONCE PER DISTINCT WORD (the Zipf
    head collapse again), as a chain of merge folds — pure JVM
    expressions, |merges| passes over each word's symbol array — then
    joined back to the per-(source, word) count table; per-source sums
    are one map-side-combined groupBy.  The vocab-side join key is the
    word itself; at web scale the vocab table is MBs — broadcast."""
    words = docs.select(
        "source", F.explode(ws_tokens(F.lower(F.col("text")))).alias("word")
    )
    if word_filter is not None:
        words = words.filter(F.col("word").rlike(word_filter))
    # per_word feeds BOTH the vocab-side distinct and the final join-back
    # — without a cut each side re-runs the corpus tokenize (guide §2.4)
    per_word = (
        words.groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wc"))
        .localCheckpoint(eager=False)
    )
    if wrapped_replace:
        # merge passes as a LINEAR replace chain over the
        # delimiter-wrapped symbol string ('the' -> '<t><h><e>'): each
        # replace references its input exactly once, so the expression
        # tree is linear in |merges| — no per-step eager checkpoint jobs
        # — and the whole segmentation runs inside one codegen stage.
        # Replace-all is greedy left-to-right non-overlapping, which on
        # the wrapped form is exactly _merge_fold's tail-merge semantics
        # (see _pinned_seg_sql: a replacement '<xy>' can never create a
        # NEW '<x><y>' match before the scan point, because y is
        # non-empty so '<xy>' cannot end in '<x>').  Valid ONLY when
        # tokens cannot contain '<'/'>' — callers must pass a
        # word_filter that guarantees it (the oracle mirrors this exact
        # chain, so parity is by construction).
        s = F.regexp_replace(F.col("word"), r"(.)", r"<$1>")
        for left, right in merges:
            s = F.replace(s, F.lit(f"<{left}><{right}>"), F.lit(f"<{left}{right}>"))
        seg = per_word.select("word").distinct().select(
            "word",
            (F.length(s) - F.length(F.replace(s, F.lit("<"), F.lit(""))))
            .cast("bigint")
            .alias("n_sub"),
            F.length("word").cast("bigint").alias("n_chr"),
        )
    else:
        # one merge pass per STEP with a lineage cut between passes: each
        # fold references its input expression several times, so composing
        # all |merges| folds into one projection grows the Catalyst tree
        # exponentially (observed: analysis hangs at 8 merges) — whereas
        # checkpointed passes keep every plan O(1).  The vocab table is the
        # Zipf-collapsed distinct-word set: tiny.
        seg = per_word.select("word").distinct().withColumn(
            "syms",
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.col("word").substr(i, F.lit(1)),
            ),
        )
        for left, right in merges:
            seg = seg.withColumn(
                "syms", _merge_fold(F.col("syms"), left, right)
            ).localCheckpoint(eager=True)
        seg = seg.select(
            "word",
            F.size("syms").cast("bigint").alias("n_sub"),
            F.length("word").cast("bigint").alias("n_chr"),
        )
    joined = per_word.join(F.broadcast(seg), "word")
    return (
        joined.groupBy("source")
        .agg(
            F.sum("wc").alias("n_words"),
            F.sum(F.col("wc") * F.col("n_chr")).alias("n_chars"),
            F.sum(F.col("wc") * F.col("n_sub")).alias("n_subwords"),
            F.round(
                F.sum(F.col("wc") * F.col("n_chr"))
                / F.sum(F.col("wc") * F.col("n_sub")),
                4,
            ).alias("chars_per_token"),
        )
        .orderBy("source")
    )


def q_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply lifecycle: the 8 merges fit on THIS corpus
    (snapshot-cached) are applied back to it.  Iterative train step ->
    rows-only; the apply arithmetic is pinned by the pure-Python parity
    test."""
    from realparse_spark.sources.tables import fan_out

    merges = [
        (r.left, r.right)
        for r in _merges_for(spark, sf_dir).orderBy("step").collect()
    ]
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return bpe_apply_report(docs, merges)


# ---------------------------------------------------------------------------
# pinned-vocabulary BPE apply: the exactly-oracled companion to bpe_apply
# ---------------------------------------------------------------------------

# Fixed rank-ordered merge list (common English bigrams), including CHAINED
# merges ('t'+'h' then 'th'+'e') so the oracle exercises merge sequencing,
# not just independent substitutions.
BPE_PINNED_MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e"),
    ("a", "n"),
    ("an", "d"),
    ("i", "n"),
    ("e", "r"),
    ("o", "u"),
    ("r", "e"),
]


def q_bpe_apply_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`bpe_apply`'s exactly-oracled companion (round-10 verdict task 6):
    the SAME `_merge_fold` apply path and the same per-source compression
    report, but over a PINNED merge list instead of the iteratively
    trained one — so a DuckDB oracle can verify the greedy left-to-right
    pairing semantics hash-exactly, which the rows-only `bpe_apply` check
    never could.  Scope: alphabetic words only (`^[a-z]+$`) — the oracle
    mirrors each merge pass as a substring replace over a
    delimiter-wrapped symbol string ('<t><h><e>'), and the delimiter
    argument requires tokens that cannot contain '<'/'>'.  The trained
    path's merge ORDER guarantees stay with the Python parity gates in
    tests/test_spans.py."""
    from realparse_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    # wrapped_replace: the word_filter guarantees '<'/'>'-free tokens,
    # so the linear replace-chain segmentation (the oracle's own form)
    # replaces 8 eager per-merge checkpoint jobs with one codegen stage
    return bpe_apply_report(
        docs, BPE_PINNED_MERGES, word_filter=r"^[a-z]+$", wrapped_replace=True
    )


def _pinned_seg_sql() -> str:
    # one replace() per merge, innermost first — replace-all is greedy
    # left-to-right non-overlapping in DuckDB and the JVM alike, which is
    # exactly _merge_fold's tail-merge semantics on the wrapped form: a
    # replacement '<xy>' can never create a NEW '<x><y>' match before the
    # scan point (y is non-empty, so '<xy>' cannot end in '<x>').
    s = r"regexp_replace(word, '(.)', '<\1>', 'g')"
    for left, right in BPE_PINNED_MERGES:
        s = f"replace({s}, '<{left}><{right}>', '<{left}{right}>')"
    return s


BPE_APPLY_PINNED_SQL = rf"""
WITH w AS (
  SELECT source,
    unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS word
  FROM documents
),
fw AS (SELECT source, word FROM w WHERE regexp_matches(word, '^[a-z]+$')),
seg AS (
  SELECT word, {_pinned_seg_sql()} AS s
  FROM (SELECT DISTINCT word FROM fw)
),
m AS (
  SELECT word,
    CAST(length(s) - length(replace(s, '<', '')) AS BIGINT) AS n_sub,
    CAST(length(word) AS BIGINT) AS n_chr
  FROM seg
)
SELECT f.source,
  CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum(n_chr) AS BIGINT) AS n_chars,
  CAST(sum(n_sub) AS BIGINT) AS n_subwords,
  round(CAST(sum(n_chr) AS DOUBLE) / sum(n_sub), 4) AS chars_per_token
FROM fw f JOIN m USING (word)
GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "doc_dup_spans": q_doc_dup_spans,
    "dup_span_profile": q_dup_span_profile,
    "doc_span_clip": q_doc_span_clip,
    "bpe_train": q_bpe_train,  # iterative — rows-only, Python-parity gated
    "bpe_apply": q_bpe_apply,  # rides the trainer — rows-only, parity gated
    "bpe_apply_pinned": q_bpe_apply_pinned,  # same apply path, pinned vocab — oracled
}
ORACLES = {
    "doc_dup_spans": DOC_DUP_SPANS_SQL,
    "dup_span_profile": DUP_SPAN_PROFILE_SQL,
    "doc_span_clip": DOC_SPAN_CLIP_SQL,
    "bpe_apply_pinned": BPE_APPLY_PINNED_SQL,
}
