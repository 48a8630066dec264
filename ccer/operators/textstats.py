"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting — all JVM-side column algebra (whole-stage
codegen), designed so each has an exact ANSI-SQL oracle.

These are the corpus-curation extensions a training-data pipeline needs
on top of the ER core; the documents table is the natural target.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# small, fixed stopword lists — enough signal for a heuristic n-gram-free
# language id over en/de/fr; CJK is detected by codepoint range.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "are"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "pour", "dans", "que", "une", "des"],
}


def _tokens(text_col: str) -> Column:
    return F.split(F.lower(F.col(text_col)), r"\s+")


def detect_language(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``lang_pred``: stopword-overlap vote (en/de/fr), CJK by
    codepoint, 'unknown' when nothing scores."""
    toks = F.array_distinct(_tokens(text_col))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }
    has_cjk = F.col(text_col).rlike("[一-鿿]")
    best = F.greatest(*scores.values())
    # fixed priority en > de > fr breaks score ties deterministically
    pred = F.when(has_cjk, F.lit("zh")).otherwise(
        F.when(best <= 0, F.lit("unknown"))
        .when(scores["en"] == best, F.lit("en"))
        .when(scores["de"] == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return docs.withColumn("lang_pred", pred)


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add the standard curation quality signals as columns:
    n_chars, n_tokens, mean_token_len, punct_ratio, stopword_ratio,
    upper_ratio, and a composite quality_score in [0,1]."""
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    punct = n_chars - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))
    upper = n_chars - F.length(F.regexp_replace(text, r"[A-Z]", ""))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(w) for w in STOPWORDS["en"]])
        )
    )
    mean_tok = (n_chars - n_tokens + 1) / n_tokens  # chars minus separators
    out = (
        docs.withColumn("n_chars", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("mean_token_len", F.round(mean_tok, 4))
        .withColumn("punct_ratio", F.round(punct / n_chars, 6))
        .withColumn("upper_ratio", F.round(upper / n_chars, 6))
        .withColumn("stopword_hits", stop_hits)
    )
    score = (
        F.when(F.col("n_tokens") < 5, 0.0)
        .when(F.col("mean_token_len") < 2, 0.2)
        .when(F.col("mean_token_len") > 14, 0.2)
        .otherwise(
            F.least(
                F.lit(1.0),
                F.lit(0.4)
                + F.least(F.col("n_tokens") / 400.0, F.lit(0.3))
                + F.least(F.col("stopword_hits") / 10.0, F.lit(0.3)),
            )
        )
    )
    return out.withColumn("quality_score", F.round(score, 6))


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate: count of
    letter-runs/digit-runs/punct singletons (a cheap, deterministic proxy
    for tokenizer load, exact-SQL-expressible)."""
    text = F.col(text_col)
    ws_tokens = F.size(F.split(text, r"\s+"))
    word_pieces = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\s]"), 0))
    return docs.withColumn("ws_tokens", ws_tokens).withColumn(
        "subword_est", word_pieces
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact content fingerprints: md5 of the raw text plus md5 of a
    whitespace-collapsed lowercase canonical form (the cheap JVM-side
    cousin of the kernel normalize_text — used for exact and
    near-exact grouping where SQL parity matters)."""
    text = F.col(text_col)
    canon = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return docs.withColumn("fp_raw", F.md5(text.cast("binary"))).withColumn(
        "fp_canonical", F.md5(canon.cast("binary"))
    )


def source_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source corpus composition — the domain-balancing view a
    curation pipeline samples from: ``(source, n_docs, total_tokens,
    n_langs, corpus_share)``.

    Scale shape: one partial-aggregated groupBy(source); the corpus
    total needed for the share is re-aggregated FROM the per-source
    result (a tree-reduce to one row) and broadcast back via crossJoin —
    not a global window, which would funnel every per-source row through
    a single task at web scale (~1e8 distinct hosts).
    """
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("total_tokens"),
        F.count_distinct("lang").alias("n_langs"),
    )
    total = per_source.agg(F.sum("n_docs").alias("corpus_docs"))
    return per_source.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "total_tokens",
        "n_langs",
        F.round(F.col("n_docs") / F.col("corpus_docs"), 6).alias("corpus_share"),
    )
