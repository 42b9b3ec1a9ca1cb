"""Text analysis operators: language ID, quality scoring, token stats,
document fingerprinting. Pure Catalyst expressions (no UDFs) —
whole-stage-codegen'd, scan-parallel, no shuffle except final aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feldera_spark.functions import md5_i64

# Tiny per-language stopword lists for the n-gram-heuristic language ID.
STOPWORDS = {
    "en": ["the", "a", "of", "to", "and"],
    "de": ["der", "die", "das", "und", "ein"],
    "es": ["el", "la", "de", "los", "y"],
    "fr": ["le", "la", "de", "les", "et"],
}


def _tokens(text_col) -> F.Column:
    return F.split(text_col, " ")


def _hits(toks, words: list[str]) -> F.Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def language_id(df: DataFrame, id_col: str, text: str) -> DataFrame:
    """Stopword-hit language scores + argmax prediction (deterministic
    fixed-order tie-break en > de > es > fr)."""
    toks = _tokens(F.col(text))
    out = df.select(id_col, *[
        _hits(toks, ws).alias(f"{lang}_hits") for lang, ws in STOPWORDS.items()
    ])
    en, de, es, fr = (F.col(f"{k}_hits") for k in ("en", "de", "es", "fr"))
    pred = (
        F.when((en >= de) & (en >= es) & (en >= fr), "en")
        .when((de >= es) & (de >= fr), "de")
        .when(es >= fr, "es")
        .otherwise("fr")
    )
    return out.withColumn("predicted_lang", pred)


def token_stats(df: DataFrame, id_col: str, text: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, chars, and a
    BPE-ish estimate (chars/4 is the classic ~4-chars-per-token rule)."""
    toks = _tokens(F.col(text))
    return df.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length(text).alias("n_chars_calc"),
        F.ceil(F.length(text) / 4).alias("est_bpe_tokens"),
    )


def quality_score(df: DataFrame, id_col: str, text: str) -> DataFrame:
    """Heuristic quality score: stopword ratio, type-token ratio, and a
    length prior, combined linearly. All double arithmetic is performed in
    a fixed expression order → engine-portable."""
    toks = _tokens(F.col(text))
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    n_tok = F.size(toks).cast("double")
    stop_ratio = _hits(toks, all_stop).cast("double") / n_tok
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tok
    length_prior = F.when((F.size(toks) >= 20) & (F.size(toks) <= 500), 1.0).otherwise(0.5)
    return df.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        ttr.alias("type_token_ratio"),
        (stop_ratio * 0.3 + ttr * 0.3 + length_prior * 0.4).alias("quality"),
    )


def fingerprint(df: DataFrame, id_col: str, text: str) -> DataFrame:
    """Document fingerprints: exact content hash + order-insensitive
    bag-of-words hash (detects shuffled near-duplicates)."""
    toks = _tokens(F.col(text))
    bag = F.array_join(F.array_sort(F.array_distinct(toks)), " ")
    return df.select(
        id_col,
        md5_i64(F.col(text)).alias("content_fp"),
        md5_i64(bag).alias("bag_fp"),
    )
