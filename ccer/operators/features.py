"""Per-record feature extraction — ONE Arrow pass over the page table.

Everything the downstream stages need (normalized url/host, capped
normalized text, title, MinHash signature, SimHash fingerprint, stable
63-bit record id) is computed in a single ``mapInPandas`` crossing so the
text is normalized exactly once (the byte-identical invariant) and no
later stage re-enters Python for per-record work.

Reference analog: the Rust ETL's extract+normalize relay
(parsing-utils/parse_join_normalize_author_affiliation_metadata/src/main.rs:363-381
— normalized key columns computed once, carried through all joins).

Scale note: output width per record is bounded — text_norm is capped at
``text_cap`` chars and the signature is ``num_perm`` longs — so the
features table is O(input) with a small constant, safe to checkpoint and
shuffle at 10^12 rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ccer.functions.hashing import (
    hash64,
    hash_tokens64,
    minhash_from_hashes,
    simhash_from_hashes,
)
from ccer.functions.normalize import html_to_text, normalize_text, normalize_url, url_host, word_shingles

FEATURES_SCHEMA = (
    "rid string, id long, url string, warc_ts timestamp, lang string, "
    "url_norm string, host string, title_norm string, text_norm string, "
    "text_prefix string, n_tokens int, n_sh int, sig array<long>, "
    "simhash long, sh array<long>"
)


def stable_id(rid: str) -> int:
    """Stable non-negative 63-bit record id from the business key.

    Content-derived (never monotonically_increasing_id) so cluster labels
    survive re-runs, resumes, and repartitioning. At 10^12 records a
    128-bit id (two longs) is the production choice; 63 bits keeps the CC
    shuffles cheap here and the upgrade is mechanical.
    """
    return hash64(rid) & 0x7FFFFFFFFFFFFFFF


def extract_features(
    pages: DataFrame,
    num_perm: int = 128,
    shingle_k: int = 3,
    text_cap: int = 4000,
    title_cap: int = 120,
    prefix_cap: int = 256,
    sketch_k: int = 256,
) -> DataFrame:
    """(url, warc_ts, html?, text?, lang) → features table.

    ``text`` is taken from the text column when present, else extracted
    deterministically from ``html`` via the canonical kernel.
    """
    cols = pages.columns
    has_text = "text" in cols
    has_html = "html" in cols

    # the Arrow pass parallelizes per partition — a small/single-file
    # input would otherwise run the whole corpus on one core
    target = pages.sparkSession.sparkContext.defaultParallelism
    if pages.rdd.getNumPartitions() < target:
        pages = pages.repartition(target)

    def gen(iterator):
        for pdf in iterator:
            out_rows = []
            n = len(pdf)
            urls = pdf["url"].tolist()
            tss = pdf["warc_ts"].tolist()
            langs = pdf["lang"].tolist() if "lang" in pdf else [None] * n
            texts = pdf["text"].tolist() if has_text else [None] * n
            htmls = pdf["html"].tolist() if has_html else [None] * n
            for i in range(n):
                url = urls[i] or ""
                text = texts[i]
                if text is None and htmls[i] is not None:
                    text = html_to_text(htmls[i])
                text = text or ""
                title = text.split("\n", 1)[0][:title_cap]
                text_norm = normalize_text(text[:text_cap]) or ""
                title_norm = normalize_text(title) or ""
                shingles = word_shingles(text_norm, k=shingle_k) if text_norm else []
                # hash shingles ONCE; signature, fingerprint, and the
                # pairwise-overlap sketch all derive from the same hashes
                sh = hash_tokens64(shingles)
                sig = minhash_from_hashes(sh, num_perm=num_perm)
                fp = simhash_from_hashes(sh)
                # bottom-k (KMV) sketch: the k smallest hashes of the
                # shingle set — a fixed-size, mergeable overlap sketch so
                # the pairwise-scoring join ships O(k) per record no
                # matter how long the document is
                sh_sorted = np.sort(sh)[:sketch_k].astype(np.int64)
                rid = f"{url}@{tss[i].isoformat() if tss[i] is not None else ''}"
                out_rows.append(
                    (
                        rid,
                        stable_id(rid),
                        url,
                        tss[i],
                        langs[i],
                        normalize_url(url),
                        url_host(url),
                        title_norm,
                        text_norm,
                        text_norm[:prefix_cap],
                        len(text_norm.split()),
                        int(sh.size),
                        sig.astype(np.int64).tolist(),  # uint64 bits as signed longs
                        np.uint64(fp).astype(np.int64).item(),
                        sh_sorted.tolist(),
                    )
                )
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "rid", "id", "url", "warc_ts", "lang", "url_norm", "host",
                    "title_norm", "text_norm", "text_prefix", "n_tokens", "n_sh",
                    "sig", "simhash", "sh",
                ],
            )

    return pages.mapInPandas(gen, schema=FEATURES_SCHEMA)
