"""Multi-pass blocking: normalized-url / host / MinHash-LSH / SimHash keys,
materialized as salted, skew-aware block rows.

Blocking is the reference's equi-key prefilter generalized
(reference: query_db/repository.py:112-142 — the blocked fuzzy linkage
join runs the expensive similarity UDF only inside doi/work_id blocks).
Here the block keys are content-derived:

- ``url``  — exact normalized-url key (catches re-crawls for free)
- ``host`` — normalized host (cheap, high-recall for same-site dups)
- ``minhash`` — LSH band keys over the stored MinHash signature
- ``simhash`` — rotated 16-bit fingerprint prefixes

Everything here is JVM-side column algebra over the features table — the
Python work (signatures) happened once in the features pass. MinHash band
keys are ``xxhash64`` over signature slices; SimHash keys are bit ops on
the stored long. Catalyst sees plain projections + a groupBy, so the
whole stage is whole-stage-codegen'd and shuffles exactly once (the
block-size profile).

Skew (north rule "salted, skew-aware block partitions"): a block larger
than ``block_cap`` would cost O(n²) in the in-block self-join — one
mega-host block of 10^8 rows is 10^16 pairs. Oversized blocks are
subdivided by a CONTENT-DERIVED salt (the top ``salt_bits`` of the
record's SimHash) rather than a random one: exact and near duplicates
agree on those bits with high probability, so they stay co-blocked, while
the block's quadratic cost drops by 4^salt_bits. Random-salt alternatives
lose ALL cross-salt pairs; this loses only far pairs the other passes
(minhash bands) still cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_PASSES = ("url", "host", "minhash", "simhash")


def block_keys(
    features: DataFrame,
    passes=DEFAULT_PASSES,
    minhash_bands: int = 32,
    simhash_bits: int = 16,
    simhash_rotations=(0, 21, 43),
) -> DataFrame:
    """features → (block_key string, id long, simhash long) block rows."""
    num_perm = 128  # matches features default; slices validated at runtime
    rows_per_band = num_perm // minhash_bands
    parts = []
    base = features.select("id", "simhash", "sig", "url_norm", "host", "lang")

    if "url" in passes:
        parts.append(
            base.filter(F.col("url_norm") != "").select(
                F.concat(F.lit("u:"), F.col("url_norm")).alias("block_key"),
                "id",
                "simhash",
            )
        )
    if "host" in passes:
        parts.append(
            base.filter(F.col("host") != "").select(
                F.concat(F.lit("h:"), F.col("host")).alias("block_key"),
                "id",
                "simhash",
            )
        )
    if "minhash" in passes:
        band_cols = [
            F.concat_ws(
                ":",
                F.lit("m"),
                F.lit(str(band)),
                F.xxhash64(F.slice("sig", band * rows_per_band + 1, rows_per_band)),
            )
            for band in range(minhash_bands)
        ]
        parts.append(
            base.select(
                F.explode(F.array(*band_cols)).alias("block_key"), "id", "simhash"
            )
        )
    if "simhash" in passes:
        shift = 64 - simhash_bits
        key_cols = []
        for rot in simhash_rotations:
            if rot == 0:
                rotated = F.col("simhash")
            else:
                rotated = F.shiftleft("simhash", rot).bitwiseOR(
                    F.shiftrightunsigned("simhash", 64 - rot)
                )
            key_cols.append(
                F.concat_ws(
                    ":", F.lit("s"), F.lit(str(rot)), F.shiftrightunsigned(rotated, shift)
                )
            )
        parts.append(
            base.select(F.explode(F.array(*key_cols)).alias("block_key"), "id", "simhash")
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def salt_oversized_blocks(
    blocks: DataFrame,
    block_cap: int = 500,
    weak_pass_caps: dict | None = None,
    salt_bits_max: int = 12,
) -> DataFrame:
    """Subdivide blocks larger than their cap by a SimHash-prefix salt
    whose width adapts to the block size.

    - Per-pass caps: weak, naturally-huge passes (host blocks — every
      page of a site shares the key, but same-host ≠ duplicate) get a
      tight cap so their quadratic self-join cost stays bounded; strong
      passes (url, minhash bands) rarely exceed the default.
    - Adaptive salt width: an oversized block of n rows is split on the
      top ``ceil(log2(n/cap))`` SimHash bits (clamped to
      ``salt_bits_max``) — just enough subdivision to respect the cap in
      expectation, no more, so near-duplicate co-residence survives.

    One aggregation (block-size profile) + one broadcast join of the
    oversized-key list (the skew tail — tiny by construction) back onto
    the block rows; the block rows are shuffled exactly once.
    """
    caps = {"h:": 64}
    if weak_pass_caps is not None:
        caps = weak_pass_caps
    cap_col = F.lit(block_cap)
    for prefix, cap in caps.items():
        cap_col = F.when(
            F.col("block_key").startswith(prefix), F.lit(min(cap, block_cap))
        ).otherwise(cap_col)
    sizes = blocks.groupBy("block_key").count().withColumn("_cap", cap_col)
    oversized = sizes.filter(F.col("count") > F.col("_cap")).select(
        "block_key",
        F.least(
            F.lit(salt_bits_max),
            F.ceil(F.log2(F.col("count") / F.col("_cap"))).cast("int"),
        ).alias("_bits"),
    )
    salt = F.lit(None).cast("long")
    for b in range(salt_bits_max, 0, -1):
        salt = F.when(F.col("_bits") == b, F.shiftrightunsigned("simhash", 64 - b)).otherwise(salt)
    salted = (
        blocks.join(F.broadcast(oversized), "block_key", "left")
        .withColumn(
            "block_key",
            F.when(
                F.col("_bits").isNotNull(),
                F.concat_ws(":", F.col("block_key"), salt),
            ).otherwise(F.col("block_key")),
        )
        .drop("_bits")
    )
    return salted


def candidate_pairs(
    blocks: DataFrame, hamming_prefilter: int | None = 26
) -> DataFrame:
    """In-block self-join → distinct candidate id pairs (id_a < id_b).

    The join is a plain shuffle hash/sort-merge join on block_key — the
    one place the engine is quadratic, which is exactly why blocks were
    capped upstream. ``dropDuplicates`` dedups pairs discovered by
    multiple passes (reference analog: DISTINCT over the OR-join,
    repository.py:113).

    ``hamming_prefilter``: pairs whose 64-bit SimHash fingerprints differ
    in more than this many bits are discarded INSIDE the join (JVM
    ``bit_count(xor)``, whole-stage codegen) — random same-host pairs sit
    at ~32 bits and die here for the cost of one XOR, so the expensive
    sketch join downstream sees only plausible pairs. Exact-URL pairs
    (``u:`` pass) bypass the filter: a re-crawl may have completely new
    content yet is still the same page identity.
    """
    left = blocks.select(
        F.col("block_key"), F.col("id").alias("id_a"), F.col("simhash").alias("fp_a")
    )
    right = blocks.select(
        F.col("block_key"), F.col("id").alias("id_b"), F.col("simhash").alias("fp_b")
    )
    joined = left.join(right, "block_key").filter(F.col("id_a") < F.col("id_b"))
    if hamming_prefilter is not None:
        keep = (
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))) <= hamming_prefilter
        ) | F.col("block_key").startswith("u:")
        joined = joined.filter(keep)
    return joined.select("id_a", "id_b").dropDuplicates(["id_a", "id_b"])
