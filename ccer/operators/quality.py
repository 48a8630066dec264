"""Corpus-quality curation operators: repetition signals, C4-style
heuristic filters, PII redaction, and winnowing fingerprints.

These extend the textstats family (lang-id / quality score / token
counts) with the filters a web-crawl training-data pipeline actually
runs before tokenization — the Gopher repetition rules and C4 line
heuristics re-expressed as Spark column algebra, plus the classic
winnowing (Schleimer et al., SIGMOD 2003) local fingerprinting scheme
used for robust copy detection.

Scale shape: everything here except ``top_bigram_stats`` is per-row
column algebra (higher-order array functions over per-document strings
— no shuffle at all, embarrassingly parallel over 10^12 docs).
``top_bigram_stats`` is the one aggregation: explode to (doc, bigram)
rows, one partial-aggregated groupBy, one per-doc max — shuffle keyed
on doc_id, so AQE handles skew and the reduce state is one counter per
distinct bigram per doc.

Every operator has an exact DuckDB oracle (plans/driver_queries.py):
identical regexes (Java regex vs RE2 — patterns below restrict
themselves to the common subset), identical md5-prefix hashing, and
1-based substring semantics in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Patterns deliberately use only the Java-regex ∩ RE2 subset
# (character classes, bounded repeats, \b) so Spark and the DuckDB
# oracle substitute identically.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9][0-9 ()-]{6,20}[0-9]"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def _lines(text_col: Column) -> Column:
    """Non-empty trimmed lines of a document."""
    return F.filter(
        F.transform(F.split(text_col, "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )


def repetition_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals, per document (no shuffle):

    - ``n_lines`` / ``n_distinct_lines`` over non-empty trimmed lines
    - ``dup_line_frac``       1 - distinct/total line fraction
    - ``dup_line_char_frac``  fraction of line characters carried by
      repeated lines (chars beyond each line's first occurrence)

    Documents scoring high on either are boilerplate/templated pages —
    the Gopher rule drops docs with dup_line_frac > 0.30 or
    dup_line_char_frac > 0.20.
    """
    lines = _lines(F.col(text_col))
    dlines = F.array_distinct(lines)
    chars = F.aggregate(lines, F.lit(0), lambda a, x: a + F.length(x))
    dchars = F.aggregate(dlines, F.lit(0), lambda a, x: a + F.length(x))
    n = F.size(lines)
    dn = F.size(dlines)
    return (
        docs.withColumn("n_lines", n)
        .withColumn("n_distinct_lines", dn)
        .withColumn(
            "dup_line_frac",
            F.when(n > 0, F.round(1.0 - dn.cast("double") / n, 6)).otherwise(0.0),
        )
        .withColumn(
            "dup_line_char_frac",
            F.when(chars > 0, F.round((chars - dchars).cast("double") / chars, 6)).otherwise(
                0.0
            ),
        )
    )


def top_bigram_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document most-frequent-word-bigram coverage (the Gopher
    "top n-gram character fraction" family, word-bigram variant):
    (doc_id, n_bigrams, top_bigram_count, top_bigram_frac).

    Distributed shape: tokens → adjacent-pair rows (explode), ONE
    groupBy (doc_id, bigram) with map-side partial aggregation, then a
    per-doc max — the only shuffle is keyed on (doc_id, bigram), so a
    10^12-doc corpus spreads evenly regardless of document sizes.
    Ties on count break toward the lexicographically smallest bigram
    (deterministic, oracle-matched).
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    bigrams = F.expr(
        "transform(sequence(1, greatest(size(_toks) - 1, 0)),"
        " i -> concat(_toks[i - 1], ' ', _toks[i]))"
    )
    pairs = (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .filter(F.size("_toks") >= 2)
        .select("doc_id", F.explode(bigrams).alias("bigram"))
    )
    counts = pairs.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("bigram"))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_bigrams", F.sum("cnt").over(Window.partitionBy("doc_id")))
        .filter(F.col("_rn") == 1)
        .select(
            "doc_id",
            "n_bigrams",
            F.col("bigram").alias("top_bigram"),
            F.col("cnt").alias("top_bigram_count"),
            F.round(F.col("cnt").cast("double") / F.col("n_bigrams"), 6).alias(
                "top_bigram_frac"
            ),
        )
    )


def c4_filters(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """C4-style heuristic keep/drop flags, per document (no shuffle):

    - ``flag_too_short``      fewer than 5 whitespace words
    - ``flag_lorem``          contains "lorem ipsum" (case-insensitive)
    - ``flag_braces``         contains "{" (code/templating leak)
    - ``terminal_punct_frac`` fraction of non-empty lines ending in
      terminal punctuation (. ! ? ")
    - ``keep``                none of the drop flags and at least 60%
      of lines terminal-punctuated (C4 keeps punctuated prose)
    """
    text = F.col(text_col)
    lines = _lines(text)
    n_lines = F.size(lines)
    punct_lines = F.size(F.filter(lines, lambda x: x.rlike('[.!?"]$')))
    tp_frac = F.when(
        n_lines > 0, F.round(punct_lines.cast("double") / n_lines, 6)
    ).otherwise(0.0)
    too_short = F.size(F.split(F.trim(text), r"\s+")) < 5
    lorem = F.lower(text).contains("lorem ipsum")
    braces = text.contains("{")
    out = (
        docs.withColumn("flag_too_short", too_short)
        .withColumn("flag_lorem", lorem)
        .withColumn("flag_braces", braces)
        .withColumn("terminal_punct_frac", tp_frac)
    )
    keep = (
        ~F.col("flag_too_short")
        & ~F.col("flag_lorem")
        & ~F.col("flag_braces")
        & (F.col("terminal_punct_frac") >= 0.6)
    )
    return out.withColumn("keep", keep)


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / E.164-ish phone numbers / IPv4 addresses and
    count each (no shuffle). Emails are redacted before phones so a
    digit-bearing local-part is not double-counted; counts are taken on
    the ORIGINAL text so they report what was present, not what
    survived earlier passes."""
    text = F.col(text_col)

    def n(pat: str) -> Column:
        return F.size(F.regexp_extract_all(text, F.lit(pat), 0))

    red = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, PHONE_RE, "<PHONE>")
    red = F.regexp_replace(red, IPV4_RE, "<IP>")
    return (
        docs.withColumn("n_emails", n(EMAIL_RE))
        .withColumn("n_phones", n(PHONE_RE))
        .withColumn("n_ips", n(IPV4_RE))
        .withColumn("text_redacted", red)
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
    md5-prefix hashes of the canonical text's character ``k``-grams, the
    minimum of every ``w``-length hash window, distinct per document —
    the guarantee: any shared substring of length >= k + w - 1 between
    two documents yields at least one shared fingerprint.

    Output: exploded (doc_id, fp) rows, fp = 8-hex-char string. Entirely
    per-row higher-order column algebra — the rolling-hash window scan
    is a transform over index sequences, no Python, no shuffle; matching
    docs is then a plain equi-join on ``fp`` (a bucketable 4-byte key at
    scale). md5 prefixes rather than xxhash64 keep the DuckDB oracle
    bit-exact (both engines agree on md5 hex; xxhash64 exists only in
    Spark).

    Expression shape matters here: a two-step "hash array column, then
    window-min over it" formulation is O(n²) per document, because
    Catalyst's CollapseProject inlines the hash-array expression into
    EVERY element of the outer window transform (measured: 422 s for
    150 docs). Instead one expression references only the plain string
    column, so each window re-hashes just its own ``w`` k-grams —
    O(n·w) md5s, no nested array reference to inline (measured: ~2 s
    for the same input)."""
    canon = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    fps = F.array_distinct(
        F.expr(
            f"transform(sequence(1, length(_s) - {k + w - 1} + 1),"
            f" j -> array_min(transform(sequence(j, j + {w - 1}),"
            f"   i -> substring(md5(substring(_s, i, {k})), 1, 8))))"
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), canon.alias("_s"))
        .filter(F.length("_s") >= k + w - 1)
        .select("doc_id", F.explode(fps).alias("fp"))
    )
