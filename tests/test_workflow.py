"""End-to-end linkage workflow (reference entry point 1) + entity ops."""

import pytest
from pyspark.sql import functions as F

from ccer.operators.entities import extract_org_entities, filter_entities
from ccer.plans.linkage_workflow import process_file
from ccer.sources.reference_fixtures import make_author_references, make_input_works


def test_entity_extraction_heuristic(spark):
    df = spark.createDataFrame(
        [
            ("Department of Biology, European Molecular Biology Laboratory, Heidelberg",),
            ("the quick brown fox",),
            ("EMBL",),
            (None,),
        ],
        "affiliation string",
    )
    ents = extract_org_entities(df, "affiliation")
    spans = {r["entity"] for r in ents.collect()}
    assert any("European Molecular Biology Laboratory" in s for s in spans)
    assert not any("quick" in s for s in spans)
    # deterministic across runs
    spans2 = {r["entity"] for r in extract_org_entities(df, "affiliation").collect()}
    assert spans == spans2


def test_entity_extraction_pluggable_model(spark):
    # factory defined as a closure: cloudpickle ships it by value (test
    # modules aren't importable on executors); fake backend returns the
    # uppercased first word — distinguishable from the heuristic, so the
    # test proves the injected factory is actually used
    class UpperFirstWordModel:
        def predict_batch(self, texts):
            return [[t.split()[0].upper()] if t else [] for t in texts]

    def upper_first_word_factory():
        return UpperFirstWordModel()

    df = spark.createDataFrame(
        [("department of biology",), ("quick brown fox",)],
        "affiliation string",
    )
    ents = extract_org_entities(df, "affiliation", model_factory=upper_first_word_factory)
    spans = {r["entity"] for r in ents.collect()}
    assert spans == {"DEPARTMENT", "QUICK"}
    # default heuristic path is unchanged
    heur = {r["entity"] for r in extract_org_entities(df, "affiliation").collect()}
    assert "DEPARTMENT" not in heur


def test_flair_model_parity(spark):
    """Real-NER-model parity harness (armed, not active, in this env).

    The fixture tests/fixtures/ner_org_flair.json carries the recorded
    ORG spans of the reference's Flair model (entity_extraction.py:55-68)
    for a fixed input set — recorded by jobs/record_ner_fixture.py on a
    machine with torch. Here it is skipped with an explicit reason; the
    day torch exists, dropping the real model into the pluggable factory
    yields a green/red signal instead of silent behavioral change."""
    import json
    import os

    fixture_path = os.path.join(
        os.path.dirname(__file__), "fixtures", "ner_org_flair.json"
    )
    with open(fixture_path) as f:
        fx = json.load(f)
    flair = pytest.importorskip("flair", reason="torch/flair not in this environment")
    if fx["status"] != "recorded":
        pytest.skip(
            "fixture unrecorded — run jobs/record_ner_fixture.py where flair exists"
        )

    from jobs.record_ner_fixture import flair_org_factory

    df = spark.createDataFrame([(t,) for t in fx["inputs"]], "affiliation string")
    ents = extract_org_entities(
        df, "affiliation", model_factory=flair_org_factory(fx["model"])
    )
    got = {}
    for r in ents.collect():
        got.setdefault(r["source_text"], []).append(r["entity"])
    want = {
        t: sorted(orgs)
        for t, orgs in zip(fx["inputs"], fx["expected_orgs"])
        if orgs
    }
    assert {k: sorted(v) for k, v in got.items()} == want


def test_entity_filter_reference_semantics(spark):
    ents = spark.createDataFrame(
        [
            ("src1", "E.M.B.L."),                                  # acronym → drop
            ("src2", "European Molecular Biology Laboratory"),     # keep
            ("src3", "Short Name"),                                # ≤15 → drop
        ],
        "source_text string, entity string",
    )
    kept = filter_entities(ents).collect()
    assert len(kept) == 1
    assert kept[0]["entity_key"] == "european molecular biology laboratory"


def test_process_file_end_to_end(spark):
    refs = make_author_references(spark, n_works=150)
    inputs = make_input_works(spark, n_rows=40)
    out = process_file(
        inputs,
        refs,
        author_sep=";",
        organization_names=[
            "european molecular biology laboratory",
            "university of heidelberg",
        ],
    )
    linkage = out["linkage"]
    assert linkage.count() > 0
    assert set(linkage.columns) >= {
        "input_doi", "input_work_id", "input_author_name",
        "ref_author_name", "ref_affiliation", "linkage_status",
    }
    discovered = out["discovered"]
    assert discovered is not None and discovered.count() > 0
    # every discovered work is outside the input id set (anti-join held)
    input_work_ids = {
        r["work_id"] for r in inputs.select("work_id").dropDuplicates().collect()
    }
    disc_ids = {r["work_id"] for r in discovered.select("work_id").collect()}
    assert not (disc_ids & input_work_ids)
    counts = {r["match_type"]: r["work_count"] for r in out["match_counts"].collect()}
    assert counts.get("affiliation_exact", 0) > 0
