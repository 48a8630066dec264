"""End-to-end ER pipeline: synthetic labeled corpus → clusters → F1 gate,
plus generator determinism and resume-equals-cold-run."""

import shutil

import pytest
from pyspark.sql import functions as F

from ccer.plans.evaluate import pairwise_scores
from ccer.plans.pipeline import PipelineConfig, STAGE_ORDER, run_pipeline
from ccer.sources.catalog import StageStore
from ccer.sources.pages import synthesize_pages


@pytest.fixture(scope="module")
def corpus(spark):
    pages = synthesize_pages(spark, 600, seed=42).cache()
    pages.count()
    yield pages
    pages.unpersist()


def test_generator_deterministic(spark):
    a = synthesize_pages(spark, 120, seed=42, n_partitions=2)
    b = synthesize_pages(spark, 120, seed=42, n_partitions=7)
    ra = sorted((r["url"], str(r["warc_ts"]), r["text"]) for r in a.collect())
    rb = sorted((r["url"], str(r["warc_ts"]), r["text"]) for r in b.collect())
    assert ra == rb


def test_generator_shape(corpus):
    rows = corpus.limit(5).collect()
    assert set(rows[0].asDict().keys()) == {
        "url", "warc_ts", "html", "text", "lang", "true_cluster_id"
    }
    assert isinstance(rows[0]["html"], (bytes, bytearray))
    n_clusters = corpus.select("true_cluster_id").distinct().count()
    assert n_clusters > 100  # cluster sizes 1..10, pattern mean 3


def test_pipeline_f1(spark, corpus, tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("pipe"))
    clusters = run_pipeline(spark, corpus.drop("true_cluster_id"), workdir)
    assert clusters.count() == corpus.count()
    labels = corpus.select("url", "warc_ts", "true_cluster_id")
    scores = pairwise_scores(clusters, labels)
    assert scores["f1"] >= 0.99, scores


def test_pipeline_resume_equals_cold(spark, corpus, tmp_path_factory):
    cold_dir = str(tmp_path_factory.mktemp("cold"))
    pages = corpus.drop("true_cluster_id")
    cold = run_pipeline(spark, pages, cold_dir)
    cold_rows = sorted((r["rid"], r["cluster_id"]) for r in cold.collect())

    # invalidate from 'edges' and resume: stages before are reused, later
    # stages recomputed — result must be identical
    store = StageStore(spark, cold_dir)
    store.invalidate_from("edges", STAGE_ORDER)
    resumed = run_pipeline(spark, pages, cold_dir, resume=True)
    resumed_rows = sorted((r["rid"], r["cluster_id"]) for r in resumed.collect())
    assert cold_rows == resumed_rows

    # manifest lists all stages complete
    assert set(store.completed_stages()) == set(STAGE_ORDER)
    shutil.rmtree(cold_dir, ignore_errors=True)


def test_skew_salting_bounds_block_size(spark, corpus, tmp_path_factory):
    from ccer.operators.blocking import block_keys, salt_oversized_blocks
    from ccer.operators.features import extract_features

    feats = extract_features(corpus).cache()
    blocks = salt_oversized_blocks(block_keys(feats), block_cap=50)
    max_block = blocks.groupBy("block_key").count().agg(F.max("count")).collect()[0][0]
    # mega-host block (~20% of rows) must have been subdivided
    assert max_block <= 120  # 600 docs * 20% = 120 hard ceiling, salted below
    feats.unpersist()


def test_scoring_backend_parity(spark, corpus):
    """The JVM (hybrid) scorer's cosine + decisions are double-for-double
    identical to the all-Python Arrow scorer, and the --no-udf SQL
    backend agrees on the decided tiers (its kernel tier is a documented
    levenshtein approximation, so only match SUPERSET/rows are compared
    where both are non-ambiguous)."""
    from ccer.operators.blocking import block_keys, candidate_pairs, salt_oversized_blocks
    from ccer.operators.features import extract_features
    from ccer.operators.scoring import ScoringConfig, score_pairs

    feats = extract_features(corpus.drop("true_cluster_id")).cache()
    pairs = candidate_pairs(salt_oversized_blocks(block_keys(feats))).cache()
    assert pairs.count() > 100

    def rows(backend):
        cfg = ScoringConfig(backend=backend)
        out = score_pairs(pairs, feats, cfg)
        return {
            (r["id_a"], r["id_b"]): (round(r["s_set"], 12), r["same_url"], r["is_match"])
            for r in out.collect()
        }

    py = rows("python")
    hy = rows("hybrid")
    assert set(py) == set(hy)
    mismatches = {k: (py[k], hy[k]) for k in py if py[k] != hy[k]}
    assert not mismatches, list(mismatches.items())[:5]

    # sql backend: same pair set; s_set identical to 12 decimals (the JVM
    # HOF cosine vs the numpy sort-merge estimator); tier-0/1 decisions
    # identical (its kernel tier is a documented levenshtein stand-in)
    sq = rows("sql")
    assert set(sq) == set(py)
    cos_mismatch = {
        k: (py[k][0], sq[k][0]) for k in py if py[k][0] != sq[k][0]
    }
    assert not cos_mismatch, list(cos_mismatch.items())[:5]
    cfg = ScoringConfig()
    for k, (s, same, m) in py.items():
        if same or s >= cfg.cos_hi or s < cfg.lev_band[0]:
            assert sq[k][2] == m, (k, py[k], sq[k])

    pairs.unpersist()
    feats.unpersist()


def test_scoring_null_url_pair(spark):
    """A pair where exactly one side has a NULL/empty normalized url must
    score (same_url=false), not crash the Arrow tier (`~NULL`) or be
    silently dropped by the sql backend's filters (3-valued logic on
    `uh_a == uh_b`)."""
    from ccer.operators.scoring import ScoringConfig, score_pairs

    feats = spark.createDataFrame(
        [
            (1, None, "alpha title", "alpha text prefix", "en", [10, 20, 30], 3),
            (2, "example.com/x", "alpha title", "alpha text prefix", "en", [10, 20, 30], 3),
            (3, "", "beta title", "beta text prefix", "en", [40, 50], 2),
            (4, "example.com/x", "alpha title", "alpha text prefix", "en", [10, 20, 30], 3),
        ],
        schema=(
            "id long, url_norm string, title_norm string, text_prefix string, "
            "lang string, sh array<int>, n_sh int"
        ),
    )
    pairs = spark.createDataFrame(
        [(2, 1), (1, 3), (2, 3), (2, 4)], schema="id_a long, id_b long"
    )
    for backend in ("python", "hybrid", "sql"):
        out = {
            (r["id_a"], r["id_b"]): (r["same_url"], r["is_match"])
            for r in score_pairs(pairs, feats, ScoringConfig(backend=backend)).collect()
        }
        # no pair dropped, no crash
        assert set(out) == {(2, 1), (1, 3), (2, 3), (2, 4)}, (backend, out)
        assert out[(2, 1)][0] is False, backend    # url vs NULL
        assert out[(1, 3)][0] is False, backend    # NULL vs empty
        assert out[(2, 3)][0] is False, backend    # url vs empty
        assert out[(2, 4)] == (True, True), backend  # identical urls still match
        # identical sketches: the similarity override must still fire
        assert out[(2, 1)][1] is True, (backend, out[(2, 1)])


def test_spark_minhash_band_keys_bit_exact(spark):
    """The numpy xxhash64 replica that lets the features pass precompute
    LSH band keys must match Spark's JVM expression bit-for-bit — this is
    what keeps precomputed and fallback-derived blocks mutually
    compatible (blocking.py block_keys, features.py FEATURE_BANDS)."""
    import numpy as np
    from pyspark.sql import functions as F

    from ccer.functions.hashing import spark_minhash_band_keys

    rng = np.random.RandomState(7)
    for bands, rows_per_band in [(32, 4), (16, 2)]:
        num_perm = bands * rows_per_band
        sig = rng.randint(-(2**31), 2**31, size=(64, num_perm)).astype(np.int32)
        df = spark.createDataFrame(
            [(i, sig[i].tolist()) for i in range(len(sig))], "id int, sig array<int>"
        )
        cols = [
            F.xxhash64(
                F.lit("m"), F.lit(b), F.slice("sig", b * rows_per_band + 1, rows_per_band)
            ).alias(f"b{b}")
            for b in range(bands)
        ]
        got = {r["id"]: r for r in df.select("id", *cols).collect()}
        expect = spark_minhash_band_keys(sig, bands, rows_per_band)
        for i in range(len(sig)):
            for b in range(bands):
                assert got[i][f"b{b}"] == int(expect[i, b])


def test_block_keys_precomputed_bands_match_jvm(spark, corpus):
    """block_keys over features WITH the precomputed bands column must
    produce exactly the rows the JVM fallback produces."""
    from ccer.operators.blocking import block_keys
    from ccer.operators.features import extract_features

    feats = extract_features(corpus).cache()
    with_bands = block_keys(feats)
    without_bands = block_keys(feats.drop("bands"))
    assert with_bands.exceptAll(without_bands).count() == 0
    assert without_bands.exceptAll(with_bands).count() == 0
    feats.unpersist()
