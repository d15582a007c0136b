"""Text-analysis operators for training-data curation: language ID,
quality scoring, token counting, fingerprinting.

All JVM-side expressions (regexp / length / split / md5) — deliberately no
Python so the hot path stays in whole-stage codegen at 100 TB, and every
operator has a DuckDB SQL oracle. Heuristics are deterministic and simple by
design: they demonstrate the *pipeline shape* (scan → per-row exprs →
filter/aggregate) a real fastText/KenLM pass would slot into via a pandas
UDF, without shipping model weights.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def round_half_up(col: Column, k: int) -> Column:
    """Explicit HALF_UP rounding for non-negative values. Spark's round() is
    HALF_UP but DuckDB's is banker's; exact .5 boundaries (power-of-two
    denominators) would diverge — floor(x·10^k + 0.5) is identical in both."""
    m = 10 ** k
    return F.floor(col * m + F.lit(0.5)) / m

# tiny per-language stopword marker sets for the n-gram heuristic
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "with"],
    "de": ["der", "und", "die", "ist", "mit"],
    "fr": ["le", "la", "et", "est", "avec"],
    "es": ["el", "los", "es", "con", "una"],
}


def _count_occurrences(text: Column, word: str) -> Column:
    """Occurrences of a whole word — portable as
    len(regexp_extract_all(...)) in DuckDB."""
    return F.size(F.regexp_extract_all(text, F.lit(rf"\b{word}\b"), F.lit(0)))


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    return F.size(F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != ""))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: alpha runs, digit runs, and single other
    non-space chars — the regex analog of a byte-level BPE pre-tokenizer."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))


def doc_fingerprint(text: Column) -> Column:
    """Normalization fingerprint: md5 of lowercased, whitespace-collapsed text.

    The document-level analog of the crawl engine's sha256 content hash
    (dedup.go:8-11) that additionally survives whitespace/case jitter."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def lang_scores(text: Column) -> dict[str, Column]:
    lowered = F.lower(text)
    return {
        lang: sum((_count_occurrences(lowered, w) for w in words), F.lit(0))
        for lang, words in _LANG_MARKERS.items()
    }


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, lang_score): argmax of marker-word hit counts,
    'und' (undetermined) when no marker hits; ties broken alphabetically."""
    scores = lang_scores(F.col(text_col))
    pairs = F.array(
        *[F.struct(F.lit(lang).alias("lang"), c.alias("score")) for lang, c in sorted(scores.items())]
    )
    best = F.array_max(
        F.transform(pairs, lambda p: F.struct(p["score"].alias("score"), p["lang"].alias("lang")))
    )
    return docs.select(
        id_col,
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["score"].alias("lang_score"),
    )


def quality_metrics(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document quality features + composite score ∈ [0,1].

    Features mirror standard web-text filters (C4/Gopher-style):
    length, mean word length, alpha ratio, punctuation density,
    stopword presence, repetition (distinct/total token ratio).
    """
    t = F.col(text_col)
    n_tok = token_count(t)
    toks = F.filter(F.split(F.lower(F.trim(t)), r"\s+"), lambda x: x != "")
    n_distinct = F.size(F.array_distinct(toks))
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    stop_hits = sum(
        (_count_occurrences(F.lower(t), w) for w in _LANG_MARKERS["en"]), F.lit(0)
    )
    out = docs.select(
        id_col,
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars_m"),
        round_half_up(F.when(n_tok > 0, n_chars / n_tok).otherwise(0.0), 4).alias("mean_tok_len"),
        round_half_up(F.when(n_chars > 0, n_alpha / n_chars).otherwise(0.0), 4).alias("alpha_ratio"),
        round_half_up(F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0), 4).alias("punct_ratio"),
        round_half_up(F.when(n_tok > 0, n_distinct / n_tok).otherwise(0.0), 4).alias("distinct_ratio"),
        stop_hits.alias("stopword_hits"),
    )
    score = (
        F.least(F.col("n_tokens") / 50.0, F.lit(1.0)) * 0.3
        + F.col("alpha_ratio") * 0.3
        + F.least(F.col("distinct_ratio") * 2, F.lit(1.0)) * 0.2
        + F.least(F.col("stopword_hits") / 5.0, F.lit(1.0)) * 0.2
    )
    # explicit half-up via floor: identical across engines (Spark round() is
    # HALF_UP, DuckDB round() is banker's — they disagree at .5 boundaries)
    return out.withColumn("quality_score", F.floor(score * 10000 + F.lit(0.5)) / 10000)


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(
        id_col,
        token_count(F.col(text_col)).alias("n_ws_tokens"),
        bpe_ish_token_count(F.col(text_col)).alias("n_bpe_tokens"),
        F.length(text_col).alias("n_bytes_utf8"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(id_col, doc_fingerprint(F.col(text_col)).alias("fingerprint"))
