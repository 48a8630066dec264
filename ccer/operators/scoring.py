"""Vectorized pairwise scoring: candidate pairs → scored match edges.

The scorer is the reference's similarity predicate lifted out of the join
condition (reference: query_db/repository.py:131-137 runs
are_names_similar_udf per row INSIDE the DuckDB join; here the equi-join
on block keys runs free of Python and the Arrow-batched scorer runs as a
post-filter — Catalyst stays free to pick hash/SMJ, the UDF sees only
surviving candidates).

Score components per pair:

- ``s_set``  — set cosine |A∩B|/√(|A||B|) over the word-shingle sets,
  computed from their bottom-k (KMV) sketches (k smallest hashes, built
  once in the features stage): exact when both sets fit the sketch, an
  unbiased KMV estimate otherwise — O(k) bytes per record in the pair
  join no matter how long the document is;
- ``s_lev``  — Levenshtein ratio of the normalized-text prefixes, computed
  LAZILY only for pairs in the ambiguous band (the DP is the expensive
  kernel; decided pairs skip it);
- ``s_jw_title`` — Jaro-Winkler of normalized titles (the "last name"
  gate analog of name_matching.py:64-82);
- ``same_url`` — normalized-url equality (re-crawl identity).

Decision rule (gate-then-override, the reference's shape):
    match ⇔ same_url
          ∨ s_set ≥ cos_hi                        (strong-similarity override)
          ∨ (s_set ≥ cos_lo ∧ s_jw_title ≥ jw_gate)   (gated accept)
          ∨ s_lev ≥ lev_hi                        (near-identical prefix)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ccer.functions.textsim import jaro_winkler_similarity, levenshtein_ratio

EDGES_SCHEMA = (
    "id_a long, id_b long, s_set double, s_lev double, s_jw_title double, "
    "same_url boolean, is_match boolean"
)


class ScoringConfig:
    """Thresholds for the pairwise decision rule (constants.py:21-22 analog)."""

    def __init__(
        self,
        cos_hi: float = 0.80,
        cos_lo: float = 0.55,
        jw_gate: float = 0.85,
        lev_hi: float = 0.90,
        lev_band: tuple[float, float] = (0.30, 0.90),
        lev_prefix: int = 128,
        sketch_k: int = 64,
    ):
        self.cos_hi = cos_hi
        self.cos_lo = cos_lo
        self.jw_gate = jw_gate
        self.lev_hi = lev_hi
        self.lev_band = lev_band
        self.lev_prefix = lev_prefix
        self.sketch_k = sketch_k


def _set_cosine(a: np.ndarray, b: np.ndarray, na: int, nb: int, k: int) -> float:
    """Binary cosine of two shingle sets from their bottom-k (KMV) sketches.

    ``a``/``b`` are the k smallest 64-bit hashes of each set (sorted,
    as signed int64); ``na``/``nb`` the true set sizes. When both sets fit
    entirely in the sketch the computation is exact; otherwise the KMV
    estimator is used: within the bottom-k of the union, the fraction of
    hashes present in both sets is an unbiased estimate of Jaccard, and
    |A∩B| = J/(1+J)·(|A|+|B|) converts to cosine with the true sizes.
    """
    if na == 0 or nb == 0:
        return 0.0
    if na <= k and nb <= k:
        inter = np.intersect1d(a, b, assume_unique=True).size
        return inter / float(np.sqrt(na * nb)) if inter else 0.0
    union = np.union1d(a, b)
    m = min(k, union.size)
    kth = union[m - 1]
    shared = np.intersect1d(a, b, assume_unique=True)
    hits = int((shared <= kth).sum()) if shared.size else 0
    j = hits / m
    if j == 0.0:
        return 0.0
    inter_est = j / (1.0 + j) * (na + nb)
    return min(1.0, inter_est / float(np.sqrt(float(na) * float(nb))))


def attach_pair_features(pairs: DataFrame, features: DataFrame) -> DataFrame:
    """pairs (id_a,id_b) ⋈ features×2 → wide pair rows for the scorer.

    Two shuffle equi-joins on id — both sides hash-partitioned on the join
    key, no Python involvement. At scale, bucketing the features table on
    id makes the second join shuffle-free.
    """
    cols = ["url_norm", "title_norm", "text_prefix", "lang", "sh", "n_sh"]
    fa = features.select(
        [F.col("id").alias("_fid_a")] + [F.col(c).alias(f"{c}_a") for c in cols]
    )
    fb = features.select(
        [F.col("id").alias("_fid_b")] + [F.col(c).alias(f"{c}_b") for c in cols]
    )
    return (
        pairs.join(fa, pairs.id_a == fa._fid_a)
        .drop("_fid_a")
        .join(fb, pairs.id_b == fb._fid_b)
        .drop("_fid_b")
    )


def score_pairs(
    pairs: DataFrame, features: DataFrame, config: ScoringConfig | None = None
) -> DataFrame:
    """Candidate pairs → edges with scores and the match decision."""
    cfg = config or ScoringConfig()
    wide = attach_pair_features(pairs, features)

    lo_band, hi_band = cfg.lev_band
    prefix = cfg.lev_prefix
    sketch_k = cfg.sketch_k

    def score(iterator):
        for pdf in iterator:
            n = len(pdf)
            s_set = np.zeros(n)
            s_lev = np.zeros(n)
            s_jw = np.zeros(n)
            same_url = np.zeros(n, dtype=bool)
            match = np.zeros(n, dtype=bool)
            sha = pdf["sh_a"].tolist()
            shb = pdf["sh_b"].tolist()
            nsa = pdf["n_sh_a"].tolist()
            nsb = pdf["n_sh_b"].tolist()
            ua = pdf["url_norm_a"].tolist()
            ub = pdf["url_norm_b"].tolist()
            ta = pdf["title_norm_a"].tolist()
            tb = pdf["title_norm_b"].tolist()
            xa = pdf["text_prefix_a"].tolist()
            xb = pdf["text_prefix_b"].tolist()
            for i in range(n):
                su = bool(ua[i]) and ua[i] == ub[i]
                same_url[i] = su
                if su:
                    match[i] = True
                    s_set[i] = 1.0
                    continue
                # sketches were built in uint64 hash order; compare there
                a = np.asarray(sha[i], dtype=np.int64).view(np.uint64)
                b = np.asarray(shb[i], dtype=np.int64).view(np.uint64)
                cs = _set_cosine(a, b, int(nsa[i]), int(nsb[i]), sketch_k)
                s_set[i] = cs
                if cs >= cfg.cos_hi:
                    match[i] = True
                    continue
                if cs < lo_band:
                    # hopeless pair: no kernel work at all (the common
                    # case for weak-signal blocks like same-host)
                    continue
                if cs >= cfg.cos_lo:
                    jw = jaro_winkler_similarity(ta[i] or "", tb[i] or "")
                    s_jw[i] = jw
                    if jw >= cfg.jw_gate:
                        match[i] = True
                        continue
                # ambiguous band: pay for the Levenshtein DP only here
                if cs < hi_band:
                    lr = levenshtein_ratio((xa[i] or "")[:prefix], (xb[i] or "")[:prefix])
                    s_lev[i] = lr
                    if lr >= cfg.lev_hi:
                        match[i] = True
            out = pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy(),
                    "id_b": pdf["id_b"].to_numpy(),
                    "s_set": s_set,
                    "s_lev": s_lev,
                    "s_jw_title": s_jw,
                    "same_url": same_url,
                    "is_match": match,
                }
            )
            yield out

    return wide.mapInPandas(score, schema=EDGES_SCHEMA)


def match_edges(scored: DataFrame) -> DataFrame:
    """Keep only matching pairs — the edge list the clustering consumes."""
    return scored.filter(F.col("is_match")).select("id_a", "id_b")
