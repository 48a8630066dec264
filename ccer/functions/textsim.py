"""String-similarity kernels: Jaro-Winkler, Levenshtein, Jaccard, TF-IDF cosine.

From-scratch implementations (no jellyfish / rapidfuzz dependency) of the
similarity functions the reference pipeline scores with
(reference: query_db/analysis/name_matching.py:69-80 uses
jellyfish.jaro_winkler_similarity; query_db/udf.py:43-59 uses
rapidfuzz.fuzz.partial_ratio). Jaro-Winkler follows the standard
definition (boost threshold 0.7, prefix scale 0.1, max prefix 4) and is
unit-tested for equality against DuckDB's built-in
``jaro_winkler_similarity`` / ``levenshtein`` so the Spark results and the
driver's DuckDB oracle agree bit-for-bit.

``levenshtein`` is numpy-vectorized (row-DP with a prefix-min transform so
the insertion chain vectorizes) — suitable for Arrow-batched pandas UDFs
over long-ish strings.
"""

from __future__ import annotations

from collections import Counter
import math

import numpy as np


def jaro_similarity(s1: str, s2: str) -> float:
    """Standard Jaro similarity.

    Either side empty ⇒ 0.0 (DuckDB convention, matching our oracle; the
    reference guards empties upstream so the case never reaches scoring).
    """
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, ch in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == ch:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                transpositions += 1
            j += 1
    transpositions //= 2
    return (
        matches / len1 + matches / len2 + (matches - transpositions) / matches
    ) / 3.0


def jaro_winkler_similarity(
    s1: str, s2: str, prefix_weight: float = 0.1, boost_threshold: float = 0.7
) -> float:
    """Jaro-Winkler: Jaro plus common-prefix boost when Jaro > threshold."""
    if s1 is None or s2 is None:
        return 0.0
    jaro = jaro_similarity(s1, s2)
    if jaro <= boost_threshold:
        return jaro
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return jaro + prefix * prefix_weight * (1.0 - jaro)


def levenshtein(s1: str, s2: str) -> int:
    """Edit distance, numpy row-DP.

    The insertion recurrence cur[j] = min(cur[j-1]+1, cand[j]) is made
    vectorizable via the transform m[j] = cand[j] - j; then
    cur[j] = min_{k<=j} m[k] + j — a prefix-min plus ramp.
    """
    if s1 == s2:
        return 0
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    if len(s1) < len(s2):  # keep the inner (vectorized) dimension the long one
        s1, s2 = s2, s1
    b = np.frombuffer(s1.encode("utf-32-le"), dtype=np.uint32)
    a = np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32)
    n = b.size
    ramp = np.arange(n + 1, dtype=np.int64)
    prev = ramp.copy()
    cur = np.empty(n + 1, dtype=np.int64)
    for i, ca in enumerate(a):
        cur[0] = i + 1
        # substitution / deletion candidates (no sequential dependency)
        np.minimum(prev[1:] + 1, prev[:-1] + (b != ca), out=cur[1:])
        # insertion chain via prefix-min transform
        np.minimum.accumulate(cur - ramp, out=cur)
        cur += ramp
        prev, cur = cur, prev
    return int(prev[n])


def levenshtein_ratio(s1: str, s2: str) -> float:
    """Normalized similarity 1 - dist/max(len); 1.0 for two empties."""
    if not s1 and not s2:
        return 1.0
    m = max(len(s1 or ""), len(s2 or ""))
    return 1.0 - levenshtein(s1 or "", s2 or "") / m


def _lcs_length(a: str, b: str) -> int:
    """Longest-common-subsequence length (numpy row DP)."""
    if not a or not b:
        return 0
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.zeros(bb.size + 1, dtype=np.int64)
    cur = np.zeros(bb.size + 1, dtype=np.int64)
    for ch in np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32):
        match = prev[:-1] + (bb == ch)
        np.maximum(prev[1:], match, out=cur[1:])
        np.maximum.accumulate(cur, out=cur)
        prev, cur = cur.copy(), prev
    return int(prev[-1])


def indel_ratio(s1: str, s2: str) -> float:
    """Similarity 2·LCS/(|a|+|b|) — the insert/delete-only ratio
    (rapidfuzz fuzz.ratio semantics, 0..1 scale)."""
    if not s1 and not s2:
        return 1.0
    total = len(s1 or "") + len(s2 or "")
    if total == 0:
        return 1.0
    return 2.0 * _lcs_length(s1 or "", s2 or "") / total


def partial_ratio(s1: str, s2: str) -> float:
    """Best alignment of the shorter string inside the longer one
    (rapidfuzz fuzz.partial_ratio semantics, 0..1 scale; empty ⇒ 0.0 like
    the reference UDF null/empty guard, query_db/udf.py:43-59)."""
    if not s1 or not s2:
        return 0.0
    short, long_ = (s1, s2) if len(s1) <= len(s2) else (s2, s1)
    ls = len(short)
    best = 0.0
    for start in range(0, len(long_) - ls + 1):
        window = long_[start : start + ls]
        score = indel_ratio(short, window)
        if score > best:
            best = score
            if best == 1.0:
                break
    return best


def jaccard(a, b) -> float:
    """Jaccard similarity of two token iterables (set semantics)."""
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    union = len(sa | sb)
    return len(sa & sb) / union if union else 0.0


def cosine_tfidf(tokens_a, tokens_b, idf=None) -> float:
    """Cosine similarity of TF-IDF vectors built from two token lists.

    ``idf`` is an optional mapping token → idf weight (computed corpus-side
    by the scoring operator and broadcast); tokens absent from the map (or
    when idf is None) weigh 1.0 — degrading gracefully to plain TF cosine.
    """
    ca, cb = Counter(tokens_a), Counter(tokens_b)
    if not ca or not cb:
        return 0.0

    def _w(token: str, tf: int) -> float:
        w = idf.get(token, 1.0) if idf is not None else 1.0
        return tf * w

    dot = 0.0
    for token, tf in ca.items():
        if token in cb:
            dot += _w(token, tf) * _w(token, cb[token])
    if dot == 0.0:
        return 0.0
    na = math.sqrt(sum(_w(t, f) ** 2 for t, f in ca.items()))
    nb = math.sqrt(sum(_w(t, f) ** 2 for t, f in cb.items()))
    return dot / (na * nb)
