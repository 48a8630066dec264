"""End-to-end curation funnel: planted dups/contamination must be swept,
resume must reproduce the cold run bit-for-bit, and the funnel must be
monotone (every stage is a row filter)."""

import pytest
from pyspark.sql import functions as F

from ccer.plans.curation_workflow import (
    CurationConfig,
    run_curation,
    stage_counts,
)


@pytest.fixture(scope="module")
def pages(spark):
    from ccer.sources.pages import synthesize_pages

    df = synthesize_pages(spark, 300, with_labels=False).cache()
    df.count()
    return df


def test_curation_funnel_and_resume(spark, pages, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("curation"))
    cfg = CurationConfig(sample_fraction=0.8)
    out = run_curation(spark, pages, wd, config=cfg, resume=False)
    rows_cold = sorted(map(tuple, out.select("doc_id", "url").collect()))
    counts = stage_counts(wd)
    # monotone funnel over materialized stages
    order = [n for n in ["docs", "exact", "neardup", "quality", "sample"] if n in counts]
    vals = [counts[n]["rows"] for n in order]
    assert vals == sorted(vals, reverse=True)
    assert counts["docs"]["rows"] == 300
    # near-dup sweep must remove something: the synthetic corpus plants
    # heavy near-duplicate clusters
    assert counts["neardup"]["rows"] < counts["exact"]["rows"]

    again = run_curation(spark, pages, wd, config=cfg, resume=True)
    assert sorted(map(tuple, again.select("doc_id", "url").collect())) == rows_cold


def test_curation_decontam_stage(spark, pages, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("curation_eval"))
    # eval set = the exact text of a few input pages → those pages (and
    # their near-dup survivors carrying the same 8-grams) must be gone
    eval_docs = pages.select("text").limit(3)
    out = run_curation(
        spark,
        pages,
        wd,
        config=CurationConfig(),
        resume=False,
        eval_docs=eval_docs,
    )
    kept_texts = {r["text"] for r in out.collect()}
    leaked = {r["text"] for r in eval_docs.collect()} & kept_texts
    assert leaked == set()
    counts = stage_counts(wd)
    assert "decontam" in counts
    assert counts["decontam"]["rows"] <= counts["quality"]["rows"]


def test_curation_config_fingerprint_invalidates(spark, pages, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("curation_fp"))
    out1 = run_curation(
        spark, pages, wd, config=CurationConfig(sample_fraction=0.5), resume=False
    )
    n1 = out1.count()
    # changed config → resume must NOT reuse stages computed under the
    # old fingerprint (sample fraction changes the output)
    out2 = run_curation(
        spark, pages, wd, config=CurationConfig(sample_fraction=0.9), resume=True
    )
    n2 = out2.count()
    assert n2 > n1
