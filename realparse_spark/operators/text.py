"""Text-analysis operators over the `documents` table — the
training-data-pipeline surface (BASELINE.json north star; SURVEY.md §7.1 M5).

All pure column expressions (JVM-side, codegen): at 100 TB these run at
scan speed with zero Python overhead.  Each query has an exact DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from realparse_spark.sources.tables import load_table

# A small fixed stopword inventory per language for the n-gram/stopword
# language-ID heuristic.  Deterministic and oracle-expressible; not a
# linguistics claim.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "que"],
}

# BPE-ish token regex: word pieces, numbers, or single non-space symbols —
# a deterministic stand-in for a real tokenizer's pre-tokenization.
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count_ws(text: Column) -> Column:
    return F.size(ws_tokens(text))


def token_count_bpe(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def stopword_hits(text: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(ws_tokens(text), lambda t: t.isin(*words)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length, token stats, punctuation/stopword ratios —
    the heuristics a pretraining-data filter computes per document."""
    t = F.col(text_col)
    n_tok = token_count_ws(t)
    n_chars = F.length(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0))
    n_stop = stopword_hits(t, "en")
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens_ws"),
        token_count_bpe(t).alias("n_tokens_bpe"),
        F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_stop.cast("double") / F.greatest(n_tok, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(
            (n_chars - F.size(F.regexp_extract_all(t, F.lit(r"\s"), 0))).cast("double")
            / F.greatest(n_tok, F.lit(1)),
            6,
        ).alias("mean_word_len"),
    )


def langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language ID: argmax of per-language stopword hit
    counts; ties broken by fixed language order; 'und' when zero hits."""
    t = F.col(text_col)
    hits = {lang: stopword_hits(t, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    pred = F.lit("und")
    # reversed so earlier languages win ties (en > es > de > fr)
    for lang in reversed(list(STOPWORDS)):
        pred = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return df.select(
        "doc_id",
        *[hits[lang].alias(f"hits_{lang}") for lang in STOPWORDS],
        pred.alias("pred_lang"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (the exact-dedup key), plus a 64-bit prefix as a compact join key."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    fp = F.md5(norm)
    return df.select(
        "doc_id",
        fp.alias("fp_md5"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("long").alias("fp_60bit"),
    )


# ---------------------------------------------------------------------------
# driver queries
# ---------------------------------------------------------------------------


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_features(load_table(spark, sf_dir, "documents"))


TEXT_QUALITY_SQL = r"""
WITH tok AS (
  SELECT doc_id, text,
    length(text) AS n_chars,
    len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens_ws,
    len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_tokens_bpe,
    len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
    len(list_filter(string_split_regex(text, '\s+'),
        x -> list_contains(['the','and','of','to','in','is','that','for','with','on'], x))) AS n_stop,
    len(regexp_extract_all(text, '\s')) AS n_ws
  FROM documents
)
SELECT doc_id,
  CAST(n_chars AS INTEGER) AS n_chars,
  CAST(n_tokens_ws AS INTEGER) AS n_tokens_ws,
  CAST(n_tokens_bpe AS INTEGER) AS n_tokens_bpe,
  round(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1), 6) AS punct_ratio,
  round(CAST(n_stop AS DOUBLE) / greatest(n_tokens_ws, 1), 6) AS stopword_ratio,
  round(CAST(n_chars - n_ws AS DOUBLE) / greatest(n_tokens_ws, 1), 6) AS mean_word_len
FROM tok
"""


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return langid(load_table(spark, sf_dir, "documents"))


def _langid_sql() -> str:
    hit_exprs = []
    for lang, words in STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        hit_exprs.append(
            f"CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> list_contains([{lst}], x))) AS INTEGER) AS hits_{lang}"
        )
    langs = list(STOPWORDS)
    pred = "'und'"
    for lang in reversed(langs):
        pred = f"CASE WHEN hits_{lang} = best AND best > 0 THEN '{lang}' ELSE {pred} END"
    return f"""
WITH h AS (
  SELECT doc_id, {', '.join(hit_exprs)}
  FROM documents
),
b AS (
  SELECT *, greatest({', '.join('hits_' + lang for lang in langs)}) AS best FROM h
)
SELECT doc_id, {', '.join('hits_' + lang for lang in langs)}, {pred} AS pred_lang
FROM b
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(load_table(spark, sf_dir, "documents"))


TEXT_FINGERPRINT_SQL = r"""
SELECT doc_id,
  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp_md5,
  CAST(concat('0x', substring(md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), 1, 15)) AS BIGINT) AS fp_60bit
FROM documents
"""


QUERIES = {
    "text_quality": q_text_quality,
    "text_langid": q_text_langid,
    "text_fingerprint": q_text_fingerprint,
}

ORACLES = {
    "text_quality": TEXT_QUALITY_SQL,
    "text_langid": _langid_sql(),
    "text_fingerprint": TEXT_FINGERPRINT_SQL,
}
