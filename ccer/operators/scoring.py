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


def _set_cosine_batch(
    sha: list, shb: list, na: np.ndarray, nb: np.ndarray, k: int
) -> np.ndarray:
    """Binary cosine of shingle sets from their bottom-k (KMV) sketches,
    for a whole Arrow batch at once.

    Sketches are sorted-unique uint32 (top half of the 64-bit shingle
    hashes). When both sets fit in the sketch the count is exact;
    otherwise the KMV estimator runs on the bottom-k of the union: the
    fraction of union-bottom-k hashes present in both sets estimates
    Jaccard, and |A∩B| = J/(1+J)·(|A|+|B|) converts to cosine with the
    true set sizes.

    Because each side is a set (no repeats), |A∩B| equals the number of
    adjacent duplicates in the row-wise sorted concatenation of the two
    sketches — O(k log k) per pair instead of the O(k²) equality matrix
    (measured 200× on 100k-pair batches; the k² matrix was the pipeline's
    hottest loop). Values are lifted to int64 with per-position-distinct
    pad sentinels above 2³² so padding can never form a duplicate.
    """
    m = len(sha)
    if m == 0:
        return np.zeros(0)
    col = np.arange(k, dtype=np.int64)

    def mat(lst, pad_base):
        lens = np.fromiter((len(x) for x in lst), dtype=np.int64, count=m)
        out = np.broadcast_to(pad_base + col, (m, k)).copy()
        mask = col[None, :] < lens[:, None]
        if lens.sum():
            flat = np.concatenate([np.asarray(x, dtype=np.int32) for x in lst])
            out[mask] = flat.view(np.uint32).astype(np.int64)
        return out, lens

    A, ska = mat(sha, np.int64(1) << 33)
    B, skb = mat(shb, np.int64(1) << 34)
    conc = np.concatenate([A, B], axis=1)        # (m, 2k)
    conc.sort(axis=1)                            # pads sort last, all distinct
    dup = conc[:, 1:] == conc[:, :-1]            # adjacent duplicate ⇔ A∩B member
    inter = dup.sum(axis=1).astype(np.int64)

    denom = np.sqrt(na.astype(np.float64) * nb.astype(np.float64))
    denom[denom == 0.0] = np.inf                 # empty set ⇒ cosine 0
    exact = (na <= k) & (nb <= k)
    cos = np.where(exact, inter / denom, 0.0)

    kmv = ~exact & (na > 0) & (nb > 0)
    if kmv.any():
        isnew = np.ones(conc.shape, dtype=bool)
        isnew[:, 1:] = ~dup
        ranks = np.cumsum(isnew, axis=1)         # unique rank per position
        m_u = np.minimum(k, ska + skb - inter)   # bottom-k of the union
        m_u = np.maximum(m_u, 1)
        # a duplicate at position i+1 belongs to unique rank ranks[i+1];
        # it is inside the union's bottom-m_u iff that rank ≤ m_u
        hits = (dup & (ranks[:, 1:] <= m_u[:, None])).sum(axis=1)
        j_est = hits / m_u
        inter_est = j_est / (1.0 + j_est) * (na + nb)
        cos = np.where(kmv, np.minimum(1.0, inter_est / denom), cos)
    return cos


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
            match = np.zeros(n, dtype=bool)

            # tier 0 (vectorized): re-crawl identity by normalized url
            ua = pdf["url_norm_a"].to_numpy()
            ub = pdf["url_norm_b"].to_numpy()
            same_url = np.asarray(
                (ua == ub) & (ua != "") & ~pd.isna(ua), dtype=bool
            )
            s_set[same_url] = 1.0
            match |= same_url

            # tier 1 (vectorized): KMV set cosine for every undecided pair
            rest = np.flatnonzero(~same_url)
            if rest.size:
                sha = pdf["sh_a"].iloc[rest].tolist()
                shb = pdf["sh_b"].iloc[rest].tolist()
                nsa = pdf["n_sh_a"].to_numpy()[rest]
                nsb = pdf["n_sh_b"].to_numpy()[rest]
                cs = _set_cosine_batch(sha, shb, nsa, nsb, sketch_k)
                s_set[rest] = cs
                match[rest] |= cs >= cfg.cos_hi

            # tier 2 (narrow loop): string kernels ONLY in the ambiguous
            # band — the common case (weak-signal same-host pairs) is
            # decided by the cosine and never touches a kernel
            amb = np.flatnonzero(
                ~match & ~same_url & (s_set >= lo_band) & (s_set < cfg.cos_hi)
            )
            if amb.size:
                ta = pdf["title_norm_a"].iloc[amb].tolist()
                tb = pdf["title_norm_b"].iloc[amb].tolist()
                xa = pdf["text_prefix_a"].iloc[amb].tolist()
                xb = pdf["text_prefix_b"].iloc[amb].tolist()
                for j, i in enumerate(amb):
                    cs_i = s_set[i]
                    if cs_i >= cfg.cos_lo:
                        jw = jaro_winkler_similarity(ta[j] or "", tb[j] or "")
                        s_jw[i] = jw
                        if jw >= cfg.jw_gate:
                            match[i] = True
                            continue
                    # pay for the Levenshtein DP only here
                    if cs_i < hi_band:
                        lr = levenshtein_ratio(
                            (xa[j] or "")[:prefix], (xb[j] or "")[:prefix]
                        )
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
                    "same_url": np.asarray(same_url, dtype=bool),
                    "is_match": match,
                }
            )
            yield out

    return wide.mapInPandas(score, schema=EDGES_SCHEMA)


def match_edges(scored: DataFrame) -> DataFrame:
    """Keep only matching pairs — the edge list the clustering consumes."""
    return scored.filter(F.col("is_match")).select("id_a", "id_b")
