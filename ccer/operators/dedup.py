"""Deduplication family for large-scale corpus curation.

Five dedup modes over a document table, each the Spark-first expression
of a standard technique (the training-data-pipeline extensions the
engine provides beyond reference parity):

- exact         hash-groupBy on the (optionally normalized) text
- token-Jaccard in-block self-join + JVM array_intersect/array_union
- MinHash-LSH   signature → band keys → bucket join → verify (reuses the
                ER blocking machinery)
- SimHash       fingerprint prefix buckets + JVM bit_count(xor) Hamming
- embedding     cosine near-dup over array<float> (see ann.py)

Everything except the signature computation (one Arrow pass) is JVM-side
column algebra — blocking keys, joins, Hamming distances, and Jaccard all
run inside whole-stage codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ccer.functions.hashing import hash_tokens64, minhash_from_hashes, simhash_from_hashes
from ccer.functions.normalize import normalize_text, word_shingles


def exact_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical texts: (text_key, keep_id, n_dups).

    keep_id = min id (deterministic survivor), reference FIRST-per-group
    analog (repository.py:229-237) with a stable aggregate.
    """
    return (
        docs.groupBy(F.col(text_col).alias("text_key"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .filter(F.col("n_dups") > 1)
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row (min id) per distinct text — the dedup sweep
    a training pipeline runs before anything else. Window-free: a
    groupBy(min) + self-semi-join keeps it to two shuffles on the same key."""
    keep = docs.groupBy(text_col).agg(F.min(id_col).alias(id_col))
    return docs.join(keep, [text_col, id_col], "left_semi")


def token_jaccard_pairs(
    docs: DataFrame,
    block_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Within-block near-dup pairs by word-token Jaccard — pure JVM:
    split → array_distinct → self-join on block → array_intersect /
    array_union sizes. SQL-expressible (DuckDB list_intersect oracle)."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+")).alias("toks"),
    )
    a = toks.select(F.col("id").alias("id_a"), "blk", F.col("toks").alias("toks_a"))
    b = toks.select(F.col("id").alias("id_b"), "blk", F.col("toks").alias("toks_b"))
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("toks_a", "toks_b"))
            / F.size(F.array_union("toks_a", "toks_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


SIGNATURE_SCHEMA = "id long, sig array<long>, simhash long, n_sh int"


def text_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    shingle_k: int = 3,
) -> DataFrame:
    """One Arrow pass: id → (MinHash signature, SimHash fingerprint)."""

    target = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target)

    def gen(iterator):
        for pdf in iterator:
            out = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                sh = hash_tokens64(word_shingles(normalize_text(text) or "", k=shingle_k))
                sig = minhash_from_hashes(sh, num_perm=num_perm)
                fp = simhash_from_hashes(sh)
                out.append(
                    (
                        int(rid),
                        sig.astype(np.int64).tolist(),
                        np.uint64(fp).astype(np.int64).item(),
                        int(sh.size),
                    )
                )
            yield pd.DataFrame(out, columns=["id", "sig", "simhash", "n_sh"])

    return docs.select(id_col, text_col).mapInPandas(gen, schema=SIGNATURE_SCHEMA)


def minhash_neardup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    est_threshold: float = 0.7,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with signature-estimated Jaccard.

    band keys (JVM xxhash64 over signature slices) → bucket self-join →
    estimated Jaccard = matching signature positions / num_perm (JVM
    zip_with + filter + size — no second Python pass).
    """
    # consumed three times (band keys + the two signature join-backs):
    # materialize the Arrow pass once; blocks are reclaimed by the
    # ContextCleaner when the result DataFrame is collected.
    sigs = text_signatures(docs, text_col, id_col, num_perm=num_perm).localCheckpoint(
        eager=False
    )
    rows_per_band = num_perm // bands
    band_cols = [
        F.xxhash64(F.lit(b), F.slice("sig", b * rows_per_band + 1, rows_per_band))
        for b in range(bands)
    ]
    # the 128-long signature (~1 KB) must NOT ride the band join or the
    # pair-dedup exchange: block rows are bare (id, bucket) 16-byte pairs,
    # the bucket self-join and dropDuplicates shuffle only ids, and the
    # signatures join back on id afterwards (the ER scorer's slim-crossing
    # pattern, scoring.py:253-270). At 10^12 docs the dedup exchange
    # carries 16 B/pair instead of ~2 KB/pair.
    blocks = sigs.select("id", F.explode(F.array(*band_cols)).alias("bucket"))
    a = blocks.select(F.col("id").alias("id_a"), "bucket")
    b = blocks.select(F.col("id").alias("id_b"), "bucket")
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    ) / F.lit(float(num_perm))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= est_threshold)
        .select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
    )


def simhash_neardup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_bits: int = 16,
    rotations=(0, 21, 43),
    max_hamming: int = 6,
) -> DataFrame:
    """SimHash near-dup pairs: rotated-prefix buckets, then exact Hamming
    via JVM bit_count(a XOR b) ≤ k."""
    sigs = text_signatures(docs, text_col, id_col)
    shift = 64 - prefix_bits
    key_cols = []
    for rot in rotations:
        rotated = (
            F.col("simhash")
            if rot == 0
            else F.shiftleft("simhash", rot).bitwiseOR(
                F.shiftrightunsigned("simhash", 64 - rot)
            )
        )
        # 8-byte xxhash64 bucket keys, not strings — same shuffle-byte
        # rationale as the ER blocking path (blocking.py module docstring)
        key_cols.append(F.xxhash64(F.lit(rot), F.shiftrightunsigned(rotated, shift)))
    blocks = sigs.select("id", "simhash", F.explode(F.array(*key_cols)).alias("bucket"))
    a = blocks.select(F.col("id").alias("id_a"), F.col("simhash").alias("fp_a"), "bucket")
    b = blocks.select(F.col("id").alias("id_b"), F.col("simhash").alias("fp_b"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .dropDuplicates(["id_a", "id_b"])
    )
