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


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF — the keyword
    extraction a curation pipeline uses for topic balancing and
    clustering labels. Output: ``(doc_id, term, tf, df, tfidf, rnk)``.

    idf = ln((N + 1) / (df + 1)), tf = in-doc term count; ties broken by
    term string so the result is deterministic.

    Scale shape: one explode → per-(doc,term) count (partial-aggregated);
    document frequencies come from a second aggregate over the SAME
    (doc,term) rows (no rescan of the corpus); the df side is keyed by
    term only — Zipf makes it orders of magnitude smaller than the
    corpus, and AQE picks broadcast vs hash join by its real size. The
    final per-doc top-k is a window over doc_id: bounded fan-in, no
    global sort.
    """
    terms = docs.select(
        F.col(id_col).alias("id"), F.explode(_tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)), 6
            ),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(F.col("id").alias(id_col), "term", "tf", "df", "tfidf", "rnk")
    )


def stratified_sample(
    docs: DataFrame,
    fraction_by_source: dict,
    default_fraction: float = 1.0,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-source downsampling — the domain-rebalancing
    step of a web-corpus pipeline. A doc survives iff the first 32 bits
    of ``md5(id || ':' || seed)`` fall below ``fraction * 2^32`` for its
    source's fraction: exactly reproducible across runs/retries (unlike
    ``DataFrame.sample``, whose output depends on partitioning), pure
    map-side JVM column algebra (no shuffle, no RNG state), and — the
    reason for md5 over the cheaper xxhash64 — bit-identical in every
    engine, so the DuckDB oracle gates the actual selection, not a
    stand-in. Selection bits come from a cryptographic hash, so
    per-source realized rates concentrate tightly around the requested
    fraction at scale; hashing cost is immaterial next to the scan.
    """
    frac = F.lit(float(default_fraction))
    for src, p in sorted(fraction_by_source.items()):
        frac = F.when(F.col("source") == src, F.lit(float(p))).otherwise(frac)
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))), 1, 8),
        16,
        10,
    ).cast("long")
    return docs.filter(bucket < (frac * F.lit(float(2**32))).cast("long"))
