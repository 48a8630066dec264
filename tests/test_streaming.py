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


def _write_events(spark, src_dir, name, rows):
    """Land one parquet FILE (not a directory) in the stream's source dir
    — the file source lists flat files, and distinct names give a stable
    oldest-first processing order."""
    import glob
    import shutil

    tmp = os.path.join(src_dir, "_tmp_" + name)
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(src_dir, exist_ok=True)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dest = os.path.join(src_dir, name + ".parquet")
    shutil.move(part, dest)
    shutil.rmtree(tmp)
    # the file source orders new files by mtime: make arrival order
    # explicit (sub-second writes would otherwise tie)
    _write_events.seq += 1
    t = 1_700_000_000 + _write_events.seq
    os.utime(dest, (t, t))


_write_events.seq = 0


def _run_stream(spark, src_dir, schema, build, sink_name, ckpt):
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src_dir)
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {sink_name}")


EVENT_DDL = "event_id long, ts timestamp, user_id long, event_type string, value double"


def test_windowed_counts_stream_equals_batch_and_drops_late(spark, tmp_path):
    """Watermarked tumbling-window agg over a file stream: on-time rows
    aggregate identically to the batch code path (same function), and a
    row arriving later than the watermark delay is DROPPED, not merged
    into its already-finalized window.

    Spark applies the late-event filter with the PREVIOUS batch's
    watermark (two-phase watermark, SPARK-24634: eviction uses the
    current value, late-row filtering lags one batch) — hence three
    files: f1 advances event time past the target window, f2 lets that
    watermark become the late-filter bound, f3 carries the late row."""
    from datetime import datetime, timezone

    from ccer.streaming.windows import windowed_event_counts

    def t(h, m=0):
        return datetime(2024, 1, 1, h, m, tzinfo=timezone.utc)

    src = str(tmp_path / "ev")
    on_time = [
        (1, t(0, 10), 1, "click", 1.0),
        (2, t(0, 40), 1, "click", 2.0),
        (3, t(1, 10), 2, "view", 3.0),
    ]
    mid = [(4, t(2, 0), 2, "mid", 4.0)]
    # batch 2's late-filter watermark = 01:10 - 5 min = 01:05, strictly
    # past the click window's end (01:00): event 5 must be dropped, and
    # the flush row advances eviction so every on-time window finalizes
    late_and_flush = [
        (5, t(0, 20), 1, "click", 100.0),
        (6, t(8, 0), 3, "flush", 0.0),
    ]
    _write_events(spark, src, "f1", on_time)
    _write_events(spark, src, "f2", mid)
    _write_events(spark, src, "f3", late_and_flush)
    out = _run_stream(
        spark,
        src,
        EVENT_DDL,
        lambda s: windowed_event_counts(s, "1 hour", watermark="5 minutes"),
        "win_sink",
        str(tmp_path / "ck2"),
    )
    rows = out.collect()
    got = {
        (r["event_type"], r["window_start"]): (r["n_events"], r["total_value"])
        for r in rows
    }
    # the click window emitted EXACTLY once, with only the on-time rows
    assert got[("click", 1704067200)] == (2, 3.0)
    assert sum(1 for r in rows if r["event_type"] == "click") == 1
    assert got[("view", 1704070800)] == (1, 3.0)
    assert got[("mid", 1704074400)] == (1, 4.0)
    # batch twin on the on-time rows agrees (single code path)
    batch = spark.createDataFrame(on_time + mid, EVENT_DDL)
    bg = {
        (r["event_type"], r["window_start"]): (r["n_events"], r["total_value"])
        for r in windowed_event_counts(batch, "1 hour").collect()
    }
    for k, v in bg.items():
        assert got[k] == v


def test_sessionize_stateful_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: closed sessions across
    micro-batches equal the batch lag+cumsum sessionization (the
    driver-query oracle logic) on the same rows."""
    from datetime import datetime, timedelta, timezone

    from ccer.streaming.windows import sessionize_stateful

    base = datetime(2024, 1, 1, tzinfo=timezone.utc)

    def ev(eid, mins, uid, typ, val):
        return (eid, base + timedelta(minutes=mins), uid, typ, val)

    # file split is time-ordered so no real row falls behind the
    # watermark: f1 holds minutes 0-20, f2 minutes 35-85.
    # user 1: two sessions (60-min gap between minute 10 and 70);
    # user 2: one session spanning both files (gaps of 15 min).
    f1 = [ev(0, 0, 1, "click", 1.5), ev(1, 10, 1, "click", 1.5),
          ev(5, 5, 2, "view", 2.0), ev(6, 20, 2, "view", 2.0)]
    f2 = [ev(2, 70, 1, "click", 1.5), ev(3, 80, 1, "click", 1.5),
          ev(4, 85, 1, "click", 1.5), ev(7, 35, 2, "view", 2.0)]
    src = str(tmp_path / "sess")
    _write_events(spark, src, "f1", f1)
    _write_events(spark, src, "f2", f2)
    # sentinel far in the future: advances the watermark past every real
    # session's (end + gap) deadline so the event-time timeouts fire
    _write_events(
        spark, src, "f3", [(99, base + timedelta(days=2), 999, "flush", 0.0)]
    )
    out = _run_stream(
        spark,
        src,
        EVENT_DDL,
        lambda s: sessionize_stateful(s, gap_sec=1800, watermark="10 minutes"),
        "sess_sink",
        str(tmp_path / "ck_sess"),
    )
    got = {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            r["session_value"],
        )
        for r in out.filter(F.col("user_id") != 999).collect()
    }
    b = int(base.timestamp())
    assert got == {
        (1, b): (b + 600, 2, 3.0),
        (1, b + 4200): (b + 5100, 3, 4.5),
        (2, b + 300): (b + 2100, 3, 6.0),
    }
