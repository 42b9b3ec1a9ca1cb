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


def contamination(
    df: DataFrame,
    id_col: str,
    text: str,
    bench_pred,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Benchmark-contamination check: fraction of a document's distinct
    token shingles that appear in ANY benchmark document.

    ``bench_pred`` is a Column predicate selecting the benchmark set.
    Returns (id, n_shingles, n_contaminated, contamination, flagged)
    for every non-benchmark doc with >= 1 shingle; ``flagged`` is INT
    (BOOLEAN reprs differ across engines — the q37/q54 dtype lesson).

    Scale shape: the benchmark shingle set is tiny relative to the
    corpus (eval suites are fixed-size) → broadcast semi-join per
    shingle; corpus side is one explode + two keyed aggregations. No
    pairwise doc×bench comparison ever happens — membership is resolved
    per SHINGLE, the decontamination recipe used for LLM training
    corpora (n-gram overlap against eval sets)."""
    from feldera_spark.datapipe.dedup import token_shingles

    sh = (
        token_shingles(df.select(id_col, text, bench_pred.alias("__bench")),
                       text, n=shingle_n)
        .select(id_col, "__bench", "shingle")
        .distinct()
    )
    bench_shingles = sh.filter(F.col("__bench")).select("shingle").distinct()
    scored = sh.filter(~F.col("__bench"))
    hits = (
        scored.join(F.broadcast(bench_shingles), on="shingle", how="left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    sizes = scored.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    ratio = F.col("n_contaminated") / F.col("n_shingles")
    return (
        sizes.join(hits, on=id_col, how="left")
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0)))
        .select(
            id_col,
            "n_shingles",
            "n_contaminated",
            ratio.cast("double").alias("contamination"),
            (ratio >= threshold).cast("int").alias("flagged"),
        )
    )


def repetition_signals(
    df: DataFrame,
    id_col: str,
    text: str,
    bigram_threshold: float = 0.2,
) -> DataFrame:
    """Gopher-style within-document repetition signals: distinct-token
    ratio, top-token fraction, top-bigram fraction, and a repetitive
    flag (INT). Docs need >= 2 tokens (both ratios defined).

    Scale shape: two explode → groupBy chains keyed on doc_id — high
    cardinality, no hot keys, fully codegen'd; nothing leaves the JVM."""
    from feldera_spark.datapipe.dedup import token_shingles

    toks = df.select(id_col, F.explode(_tokens(F.col(text))).alias("tok"))
    tok_stats = (
        toks.groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top_tok"),
        )
    )
    bi = (
        token_shingles(df.select(id_col, text), text, n=2)
        .groupBy(id_col, "shingle")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bi"))
    )
    top_bi_frac = F.col("top_bi") / F.col("n_bigrams")
    return (
        tok_stats.join(bi, on=id_col)
        .filter(F.col("n_tokens") >= 2)
        .select(
            id_col,
            "n_tokens",
            (F.col("n_distinct") / F.col("n_tokens")).cast("double").alias(
                "distinct_ratio"
            ),
            (F.col("top_tok") / F.col("n_tokens")).cast("double").alias(
                "top_token_ratio"
            ),
            top_bi_frac.cast("double").alias("top_bigram_ratio"),
            (top_bi_frac >= bigram_threshold).cast("int").alias("repetitive"),
        )
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, int],
    default_mod: int = 0,
) -> DataFrame:
    """Deterministic stratified (training-mix) sampling: keep 1/mod of
    each stratum via the portable keyed hash — per-language /
    per-source mix control for a training corpus. ``rates`` maps
    stratum value -> keep-one-in-N (``default_mod`` for unlisted
    strata; 0 drops them). Fully reproducible (re-runs and engines
    agree), pushed down as an ordinary filter — no coordinator round,
    no sampling state, scales as a scan."""
    h = md5_i64(F.col(id_col).cast("string"))
    cond = F.lit(False)
    for value, mod in rates.items():
        if mod > 0:
            cond = cond | (
                (F.col(stratum_col) == value) & (h % mod == 0)
            )
    if default_mod > 0:
        known = list(rates)
        cond = cond | (
            ~F.col(stratum_col).isin(*known) & (h % default_mod == 0)
        )
    return df.filter(cond)


# PII patterns: conservative, deterministic regexes (emails, simple
# international/NANP phone shapes). Precision over recall — a scrub
# pass at 100 TB must not mangle ordinary numerics.
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE_RE = "\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}"


def pii_scrub(
    df: DataFrame, id_col: str, text: str, out_col: str = "clean_text"
) -> DataFrame:
    """Redact emails and phone-shaped tokens with typed placeholders and
    count the redactions per document — the pre-training PII pass.
    Pure ``regexp_replace``/``regexp_count`` Catalyst expressions: one
    codegen'd scan, no UDFs, no shuffle."""
    c = F.col(text)
    n_email = F.regexp_count(c, F.lit(PII_EMAIL_RE))
    after_email = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    n_phone = F.regexp_count(after_email, F.lit(PII_PHONE_RE))
    cleaned = F.regexp_replace(after_email, PII_PHONE_RE, "<PHONE>")
    return df.select(
        id_col,
        cleaned.alias(out_col),
        n_email.cast("bigint").alias("n_emails"),
        n_phone.cast("bigint").alias("n_phones"),
        (n_email + n_phone > 0).cast("int").alias("had_pii"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text: str,
    ctx_len: int,
    partition_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Concat-and-chunk sequence-packing plan: the classic pretraining
    prep where documents are concatenated in a deterministic order and
    split into fixed ``ctx_len``-token training sequences. Emits, per
    document, the sequence id its first token lands in and the offset
    inside that sequence — a pure PLAN (no text movement), so the
    expensive byte shuffling can happen later, partition-local.

    Scale shape: ONE window shuffle keyed by ``partition_cols`` (at
    100 TB: partition by (lang, shard) so each partition's running sum
    is bounded); the running total is a ROWS frame over a unique order
    (``id_col``) — deterministic across engines. All arithmetic is
    integer (DIV / %), no float rounding at any corpus size."""
    from pyspark.sql.window import Window

    toks = F.size(_tokens(F.col(text))).cast("long")
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(toks).over(w) - toks).cast("long")
    out = df.select(
        *partition_cols,
        id_col,
        toks.alias("n_tokens"),
        start.alias("__start"),
    )
    return out.select(
        *partition_cols,
        id_col,
        "n_tokens",
        F.expr(f"__start DIV {ctx_len}").alias("seq_id"),
        (F.col("__start") % ctx_len).alias("seq_offset"),
    )
