"""Streaming ingestion + incremental clustering equivalence."""

import os

import pytest
from pyspark.sql import functions as F

from ccer.operators.blocking import block_keys, candidate_pairs, salt_oversized_blocks
from ccer.operators.cluster import assign_clusters, connected_components
from ccer.operators.features import extract_features
from ccer.operators.scoring import match_edges, score_pairs
from ccer.sources.pages import synthesize_pages
from ccer.streaming.ingest import incremental_update, stream_ingest


def test_incremental_equals_batch(spark):
    pages = synthesize_pages(spark, 300, seed=42, with_labels=False).cache()
    pages.count()
    # batch reference run
    feats = extract_features(pages)
    blocks = salt_oversized_blocks(block_keys(feats))
    edges = match_edges(score_pairs(candidate_pairs(blocks), feats))
    batch_clusters = assign_clusters(feats, connected_components(edges))
    batch_map = {r["rid"]: r["cluster_id"] for r in batch_clusters.collect()}

    # two-increment run over the same rows (split by hash for stability)
    p1 = pages.filter(F.xxhash64("url") % 2 == 0)
    p2 = pages.subtract(p1)
    f1, b1, c1, _, pr1 = incremental_update(spark, None, None, p1)
    f1 = f1.localCheckpoint(eager=True)
    b1 = b1.localCheckpoint(eager=True)
    c1 = c1.localCheckpoint(eager=True)
    pr1 = pr1.localCheckpoint(eager=True)
    # prior block rows AND the block-size profile passed back in: old
    # records' keys are reused (not recomputed) and the salting profile
    # is advanced by the batch delta only — no per-batch aggregation
    # re-scans the corpus's block rows
    _, _, _, inc_clusters, pr2 = incremental_update(
        spark, f1, c1, p2, prior_blocks=b1, prior_profile=pr1
    )
    inc_map = {r["rid"]: r["cluster_id"] for r in inc_clusters.collect()}
    assert inc_map == batch_map
    # the merged profile equals a from-scratch count over all block rows
    full = {
        (r["block_key"], r["pass_id"]): r["count"]
        for r in block_keys(extract_features(pages)).groupBy("block_key", "pass_id").count().collect()
    }
    merged = {(r["block_key"], r["pass_id"]): r["count"] for r in pr2.collect()}
    assert merged == full
    pages.unpersist()


def test_incremental_profile_skips_corpus_recount(spark):
    """With prior_blocks + prior_profile supplied, the second batch's
    salting must derive its block-size profile from (prior profile ∪
    batch delta) — the physical plan may not re-aggregate the prior
    corpus's block rows (the last O(corpus) per-batch shuffle)."""
    pages = synthesize_pages(spark, 200, seed=7, with_labels=False).cache()
    pages.count()
    p1 = pages.filter(F.xxhash64("url") % 2 == 0)
    p2 = pages.subtract(p1)
    f1, b1, c1, _, pr1 = incremental_update(spark, None, None, p1)
    f1 = f1.localCheckpoint(eager=True)
    b1 = b1.localCheckpoint(eager=True)
    pr1 = pr1.localCheckpoint(eager=True)
    c1 = c1.localCheckpoint(eager=True)
    _, _, _, _, pr2 = incremental_update(
        spark, f1, c1, p2, prior_blocks=b1, prior_profile=pr1
    )
    # pr2 = merge(pr1 checkpoint, count(batch block rows)). The four
    # prior-state checkpoints all surface as "Scan ExistingRDD"; exactly
    # ONE (pr1) may appear in pr2's plan. A fallback that re-counted
    # blocks_raw_all would pull in b1's checkpoint as a second scan.
    pr2_plan = pr2._jdf.queryExecution().toString()
    assert pr2_plan.count("Scan ExistingRDD") == 1, pr2_plan
    pages.unpersist()


def test_stream_ingest_foreachbatch(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    workdir = str(tmp_path / "wd")
    pages = synthesize_pages(spark, 120, seed=42, with_labels=False)
    pages.write.mode("overwrite").parquet(input_dir)
    q = stream_ingest(spark, input_dir, workdir, trigger_once=True)
    q.awaitTermination(120)
    out = spark.read.parquet(os.path.join(workdir, "features_stream"))
    assert out.count() == 120
    assert "sig" in out.columns and "batch_id" in out.columns
    # features identical to the batch kernel (byte-identical invariant)
    batch = extract_features(pages)
    a = {r["rid"]: r["text_norm_hash"] for r in out.collect()}
    b = {r["rid"]: r["text_norm_hash"] for r in batch.collect()}
    assert a == b
