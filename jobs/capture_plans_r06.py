"""Capture .explain("formatted") output for the queries touched in the
round-6 optimization pass, into plans/r06/<query>_<tag>.txt.

Usage: python jobs/capture_plans_r06.py before|after [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "er_cluster_documents",
    "er_cluster_invariants",
    "blocking_keys",
    "minhash_neardup",
    "ann_topk_ivf",
    "tfidf_top_terms",
    "chunk_dedup",
    "decontam_overlap",
    "source_stats",
    "lang_id",
    "quality_scores",
    "token_counts",
]


def _operator_plans(spark, sf_dir):
    """Plan builders for the ER operators the r6 pass restructured —
    captured at operator level because the composed flagship query's
    explain is truncated at its internal localCheckpoint barriers."""
    from pyspark.sql import functions as F

    from ccer.operators.blocking import block_keys, candidate_pairs, salt_oversized_blocks
    from ccer.operators.cluster import _large_star, _small_star
    from ccer.operators.features import extract_features
    from ccer.operators.scoring import score_pairs
    from ccer.plans.driver_queries import pages_from_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("doc_id") < 1500)
    feats = extract_features(pages_from_documents(docs))
    blocks = salt_oversized_blocks(block_keys(feats), block_cap=500)
    pairs = candidate_pairs(blocks)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    return {
        "er_candidate_pairs": pairs,
        "er_cc_round": _small_star(_large_star(edges)),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from ccer.plans import driver_queries as dq
    from ccer.session import get_spark

    spark = get_spark(app_name="ccer-plan-capture")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    plans = {n: getattr(dq, f"q_{n}")(spark, sf_dir) for n in names}
    if not sys.argv[2:]:
        plans.update(_operator_plans(spark, sf_dir))
    for name, df in plans.items():
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()


if __name__ == "__main__":
    main()
