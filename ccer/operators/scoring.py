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


_PAD_A = np.uint32(0xFFFFFFFF)
_PAD_B = np.uint32(0xFFFFFFFE)


def _set_cosine_batch(
    sha: list, shb: list, na: np.ndarray, nb: np.ndarray, k: int
) -> np.ndarray:
    """Binary cosine of shingle sets from their bottom-k (KMV) sketches,
    for a whole Arrow batch at once — no per-pair numpy-call overhead
    (per-pair ``intersect1d`` costs ~30-60µs of dispatch; the batched
    equality matrix amortizes it to ~4µs/pair).

    Sketches are sorted-unique uint32 (top half of the 64-bit shingle
    hashes). When both sets fit in the sketch the count is exact;
    otherwise the KMV estimator runs on the bottom-k of the union: the
    fraction of union-bottom-k hashes present in both sets estimates
    Jaccard, and |A∩B| = J/(1+J)·(|A|+|B|) converts to cosine with the
    true set sizes. Distinct pad sentinels keep padding inert.
    """
    m = len(sha)
    if m == 0:
        return np.zeros(0)
    A = np.full((m, k), _PAD_A, dtype=np.uint32)
    B = np.full((m, k), _PAD_B, dtype=np.uint32)
    ska = np.zeros(m, dtype=np.int64)
    skb = np.zeros(m, dtype=np.int64)
    for j in range(m):
        va = np.asarray(sha[j], dtype=np.int32).view(np.uint32)
        vb = np.asarray(shb[j], dtype=np.int32).view(np.uint32)
        ska[j] = va.size
        skb[j] = vb.size
        A[j, : va.size] = va
        B[j, : vb.size] = vb

    eq = A[:, :, None] == B[:, None, :]          # (m, k, k); ≤ min(k,k) hits
    inter = eq.sum(axis=(1, 2)).astype(np.int64)

    denom = np.sqrt(na.astype(np.float64) * nb.astype(np.float64))
    denom[denom == 0.0] = np.inf                 # empty set ⇒ cosine 0
    exact = (na <= k) & (nb <= k)
    cos = np.where(exact, inter / denom, 0.0)

    kmv = ~exact & (na > 0) & (nb > 0)
    if kmv.any():
        idx = np.flatnonzero(kmv)
        conc = np.concatenate([A[idx], B[idx]], axis=1)
        conc.sort(axis=1)                        # pads sort last
        isnew = np.ones(conc.shape, dtype=bool)
        isnew[:, 1:] = conc[:, 1:] != conc[:, :-1]
        ranks = np.cumsum(isnew, axis=1)         # unique rank per position
        m_u = np.minimum(k, ska[idx] + skb[idx] - inter[idx])
        m_u = np.maximum(m_u, 1)
        pos = (ranks <= m_u[:, None]).sum(axis=1) - 1
        kth = np.take_along_axis(conc, pos[:, None], axis=1)  # (s,1)
        hits = (eq[idx] & (A[idx, :, None] <= kth[:, :, None])).sum(axis=(1, 2))
        j_est = hits / m_u
        inter_est = j_est / (1.0 + j_est) * (na[idx] + nb[idx])
        cos[idx] = np.minimum(1.0, inter_est / denom[idx])
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
