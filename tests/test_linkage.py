"""Reference-parity tests: the transplanted linkage/discovery operators
vs a DuckDB oracle that executes the REFERENCE's own SQL shapes
(query_db/repository.py) with our kernels registered as DuckDB UDFs —
i.e. the closest thing to running the reference itself."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ccer.functions.names import are_names_similar
from ccer.functions.textsim import partial_ratio
from ccer.operators.linkage import (
    STATUS_FIRST_AVAILABLE,
    STATUS_ORG_MATCH,
    classify_linkage_status,
    combine_discovered_works,
    discover_works_by_affiliation,
    discover_works_by_entities,
    linkage_join,
    match_type_counts,
    search_affiliations,
    validate_entities,
)
from ccer.sources.reference_fixtures import (
    make_author_references,
    make_input_works,
)


@pytest.fixture(scope="module")
def refs(spark):
    df = make_author_references(spark, n_works=200).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def inputs(spark):
    df = make_input_works(spark, n_rows=60).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def oracle(refs, inputs):
    con = duckdb.connect()
    con.register("author_references", refs.toPandas())
    con.register("input_works", inputs.toPandas())
    con.create_function(
        "are_names_similar_udf",
        lambda a, b, s1, s2, t: are_names_similar(a or "", b or "", s1, s2, t),
        ["VARCHAR", "VARCHAR", "VARCHAR", "VARCHAR", "DOUBLE"],
        "BOOLEAN",
    )
    con.create_function(
        "partial_ratio_udf",
        lambda a, b: partial_ratio(a or "", b or ""),
        ["VARCHAR", "VARCHAR"],
        "DOUBLE",
    )
    return con


def test_linkage_join_matches_reference_sql(spark, refs, inputs, oracle):
    got = linkage_join(
        inputs, refs, doi_col="doi", work_id_col="work_id",
        authors_col="authors", author_sep=";",
    )
    got_set = {
        tuple(r)
        for r in got.select(
            "input_doi", "input_work_id", "input_author",
            "ref_author_name", "ref_affiliation",
        ).collect()
    }
    # the reference's linkage SQL (repository.py:112-142), with clean_doi
    # computed by our extract_doi kernel registered as a UDF
    from ccer.functions.normalize import extract_doi

    oracle.create_function(
        "extract_doi_udf", lambda x: extract_doi(x), ["VARCHAR"], "VARCHAR"
    )
    expected = oracle.execute(
        """
        WITH inp AS (
          SELECT DISTINCT extract_doi_udf(doi) AS input_doi,
                 work_id AS input_work_id,
                 trim(UNNEST(string_split(trim(authors), ';'))) AS input_author
          FROM input_works
          WHERE authors IS NOT NULL AND trim(authors) != ''
        )
        SELECT DISTINCT inp.input_doi, inp.input_work_id, inp.input_author,
               ref.author_name AS ref_author_name,
               ref.normalized_affiliation_name AS ref_affiliation
        FROM inp JOIN author_references ref ON (
          (inp.input_doi IS NOT NULL AND inp.input_doi != ''
           AND ref.doi IS NOT NULL AND ref.doi != ''
           AND inp.input_doi = ref.doi)
          OR
          (inp.input_work_id IS NOT NULL AND inp.input_work_id != ''
           AND ref.work_id IS NOT NULL AND ref.work_id != ''
           AND inp.input_work_id = ref.work_id)
        )
        AND are_names_similar_udf(inp.input_author, ref.author_name,
                                  'auto', 'auto', 0.85)
        WHERE inp.input_author IS NOT NULL AND inp.input_author != ''
        AND ref.author_name IS NOT NULL AND ref.author_name != ''
        """
    ).fetchall()
    assert got_set == set(map(tuple, expected))
    assert len(got_set) > 0  # fixtures guarantee overlap


def test_classify_and_discover_by_affiliation(spark, refs, inputs, oracle):
    linkage = linkage_join(
        inputs, refs, doi_col="doi", work_id_col="work_id",
        authors_col="authors", author_sep=";",
    )
    orgs = ["european molecular biology laboratory", "university of heidelberg"]
    classified = classify_linkage_status(linkage, orgs).cache()
    statuses = {r["linkage_status"] for r in classified.select("linkage_status").distinct().collect()}
    assert statuses <= {STATUS_ORG_MATCH, "name_match_no_org_affiliation"}

    exclude = inputs.select(
        F.expr("null").cast("string").alias("doi"), F.col("work_id")
    ).dropDuplicates()
    got = discover_works_by_affiliation(classified, refs, exclude)
    got_set = {
        (r["input_author_name"], r["discovered_work_id"], r["discovered_author"])
        for r in got.collect()
    }
    oracle.register("linkage_cls", classified.toPandas())
    expected = oracle.execute(
        f"""
        SELECT DISTINCT ld.input_author AS input_author_name,
               collab.work_id AS discovered_work_id,
               collab.author_name AS discovered_author
        FROM linkage_cls ld
        JOIN author_references collab
          ON lower(trim(ld.ref_affiliation)) = collab.normalized_affiliation_key
        LEFT JOIN (SELECT DISTINCT work_id FROM input_works) ex
          ON collab.work_id = ex.work_id AND collab.work_id IS NOT NULL
             AND ex.work_id IS NOT NULL
        WHERE ld.linkage_status IN ('{STATUS_ORG_MATCH}', '{STATUS_FIRST_AVAILABLE}')
          AND ex.work_id IS NULL
        """
    ).fetchall()
    # spark output is per-discovery-row; compare on the distinct key triple
    assert got_set == set(map(tuple, expected))
    classified.unpersist()


def test_entity_discovery_and_combine(spark, refs, oracle):
    entities = spark.createDataFrame(
        [("molecular biology", "src aff 1"), ("heidelberg", "src aff 2")],
        "entity_key string, source_affiliations string",
    )
    orgs = ["european molecular biology laboratory", "university of heidelberg"]
    exclude = spark.createDataFrame([], "doi string, work_id string")
    ent = discover_works_by_entities(entities, refs, orgs, exclude)
    got = {
        (r["extracted_entity"], r["discovered_work_id"]) for r in ent.collect()
    }
    expected = oracle.execute(
        """
        SELECT DISTINCT ek.entity_key, ar.work_id
        FROM (VALUES ('molecular biology'), ('heidelberg')) ek(entity_key)
        JOIN author_references ar
          ON ar.normalized_affiliation_key LIKE '%' || ek.entity_key || '%'
          AND (ar.normalized_affiliation_key LIKE '%european molecular biology laboratory%'
            OR ar.normalized_affiliation_key LIKE '%university of heidelberg%')
        """
    ).fetchall()
    assert got == set(map(tuple, expected))
    assert len(got) > 0

    # combine: entity-only rows survive; window dedup prefers affiliation
    combined = combine_discovered_works(None, ent)
    assert combined.count() == ent.count()
    counts = match_type_counts(combined).collect()
    assert {r["match_type"] for r in counts} == {"entity_extracted"}


def test_priority_dedup_prefers_affiliation(spark):
    aff = spark.createDataFrame(
        [("W1", "10.1/x", "A. Author", "Aff U", "ror1", "embl")],
        "discovered_work_id string, discovered_doi string, discovered_author string, "
        "discovered_author_affiliation string, discovered_ror_id string, "
        "linking_affiliation string",
    )
    ent = spark.createDataFrame(
        [
            ("src", "embl", "W1", "10.1/x", "A. Author", "Aff U", "aff u", "ror1"),
            ("src", "embl", "W2", "10.2/y", "B. Author", "Other", "other", None),
        ],
        "source_embl_affiliation string, extracted_entity string, "
        "discovered_work_id string, discovered_doi string, discovered_author string, "
        "discovered_author_affiliation string, discovered_normalized_affiliation string, "
        "discovered_ror_id string",
    )
    combined = combine_discovered_works(aff, ent)
    rows = {(r["work_id"], r["match_type"]) for r in combined.collect()}
    assert rows == {("W1", "affiliation_exact"), ("W2", "entity_extracted")}


def test_search_affiliations(spark, refs):
    inp = spark.createDataFrame(
        [("European Molecular Biology Laboratory!",), ("No Such Org",)],
        "affiliation string",
    )
    got = search_affiliations(inp, refs, "affiliation")
    terms = {r["input_search_term"] for r in got.collect()}
    assert terms == {"European Molecular Biology Laboratory!"}


def test_validate_entities_topk(spark, oracle):
    entities = spark.createDataFrame(
        [("european molecular biology lab", "aff1"), ("zzz unrelated", "aff2")],
        "entity_text string, source_affiliation string",
    )
    orgs = spark.createDataFrame(
        [("european molecular biology laboratory",), ("university of heidelberg",)],
        "org_name string",
    )
    got = validate_entities(entities, orgs, threshold=0.85).collect()
    assert len(got) == 1
    assert got[0]["entity_text"] == "european molecular biology lab"
    assert got[0]["matched_org"] == "european molecular biology laboratory"
    # score parity with the kernel itself
    expected = partial_ratio(
        "european molecular biology lab", "european molecular biology laboratory"
    )
    assert got[0]["score"] == pytest.approx(expected)
