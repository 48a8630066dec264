"""Extra benchmarks for optimization work (guide §1.4): NOT the driver's
bench — `bench.py` stays frozen. This file isolates the flagship ER
pipeline phase by phase (noop-sink style materialization per phase) and
reports stage-level task metrics (shuffle bytes, CPU, GC) so changes can
be attributed to the operator they touch.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py er
    python bench_extra.py queries     # per-headline-query noop timing

Prints one JSON line per invocation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def er_phases() -> None:
    from ccer.plans import driver_queries as dq
    from ccer.session import get_spark, task_metrics

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    amplify = int(os.environ.get("CCER_BENCH_AMPLIFY", "48"))
    spark = get_spark(
        app_name="ccer-bench-extra",
        cores=cores,
        shuffle_partitions=cores,
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = dq.pages_from_documents(docs, amplify=amplify)
    n_pages = pages.count()

    from ccer.operators.blocking import block_keys, candidate_pairs, salt_oversized_blocks
    from ccer.operators.cluster import assign_clusters, connected_components
    from ccer.operators.features import extract_features
    from ccer.operators.scoring import match_edges, score_pairs

    t: dict[str, float] = {}

    def phase(name, fn):
        sc.setJobDescription(f"er-phase: {name}")
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 3)
        sc.setJobDescription(None)
        return out

    feats = extract_features(pages).persist()
    phase("features", lambda: feats.count())
    blocks = salt_oversized_blocks(block_keys(feats), block_cap=500)
    blocks_ck = phase("blocks", lambda: blocks.localCheckpoint(eager=True))
    pairs = candidate_pairs(blocks_ck)
    pairs_ck = phase("pairs", lambda: pairs.localCheckpoint(eager=True))
    edges = match_edges(score_pairs(pairs_ck, feats))
    edges_ck = phase("edges", lambda: edges.localCheckpoint(eager=True))
    comps = phase("cc", lambda: connected_components(edges_ck).localCheckpoint(eager=True))
    clusters = assign_clusters(feats, comps)
    phase("assign", lambda: _noop(clusters))
    feats.unpersist()

    metrics = task_metrics(spark)
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    print(
        json.dumps(
            {
                "bench": "er_phases",
                "n_pages": n_pages,
                "phases_sec": t,
                "total_sec": round(sum(t.values()), 3),
                "task_metrics": metrics,
            }
        )
    )


def headline_queries() -> None:
    """noop-sink isolation of the non-ER headline queries (guide §1.4)."""
    from ccer.plans import driver_queries as dq
    from ccer.session import get_spark, task_metrics

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("CCER_BENCH_REPS", "2"))
    spark = get_spark(
        app_name="ccer-bench-extra",
        cores=cores,
        shuffle_partitions=cores,
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext
    names = [
        "tpch_q1_agg", "minhash_neardup", "token_jaccard_neardup", "ann_topk",
        "lang_id", "quality_scores", "token_counts", "ann_topk_ivf",
        "repetition_signals", "c4_filters", "pii_redact", "winnow_fingerprints",
        "decontam_overlap", "chunk_dedup", "tfidf_top_terms",
        "stratified_sample", "source_stats",
    ]
    t: dict[str, list[float]] = {}
    for name in names:
        fn = getattr(dq, f"q_{name}")
        t[name] = []
        for _ in range(reps):
            sc.setJobDescription(f"noop: {name}")
            t0 = time.time()
            _noop(fn(spark, sf_dir))
            t[name].append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
    metrics = task_metrics(spark)
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    print(
        json.dumps(
            {
                "bench": "headline_queries_noop",
                "sf_dir": sf_dir,
                "reps": t,
                "min_sec": {k: min(v) for k, v in t.items()},
                "task_metrics": metrics,
            }
        )
    )


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "er"
    if mode == "er":
        er_phases()
    elif mode == "queries":
        headline_queries()
    else:
        raise SystemExit(f"unknown mode {mode!r}")
