"""End-to-end linkage workflow — the reference's flagship entry point
(``python -m query_db --process-file``, workflows.py:56-100) as one Spark
plan composition:

1. prescan input ids                (repository.py:13-52)
2. blocked fuzzy linkage join       (repository.py:54-147)
3. linkage-status classification    (services.py:47-76)
4. ORG-entity extraction + filter   (entity_extraction.py / services.py)
5. entity validation cross-join     (repository.py:527-597)
6. affiliation discovery            (repository.py:295-327)
7. entity discovery                 (repository.py:329-385)
8. combine + priority dedup         (repository.py:439-514)
9. ordered exports + match counts   (repository.py:170-192,516-525)

No chunk loop — the reference's 100k-row pandas chunking
(workflows.py:117-129) is partitioning here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ccer.operators.entities import extract_org_entities, filter_entities
from ccer.operators.linkage import (
    classify_linkage_status,
    combine_discovered_works,
    discover_works_by_affiliation,
    discover_works_by_entities,
    linkage_join,
    match_type_counts,
    validate_entities,
)


def process_file(
    input_df: DataFrame,
    references: DataFrame,
    doi_col: str = "doi",
    work_id_col: str = "work_id",
    authors_col: str = "authors",
    author_sep: str | None = None,
    input_name_style: str = "auto",
    reference_name_style: str = "auto",
    name_threshold: float = 0.85,
    organization_names: list[str] | None = None,
    entity_threshold: float = 0.85,
    run_entity_discovery: bool = True,
) -> dict:
    """Returns {'linkage', 'discovered', 'match_counts'} DataFrames."""
    orgs = organization_names or []

    # 1. prescan: the distinct input id set (drives all exclusion joins)
    input_ids = input_df.select(
        F.col(doi_col).alias("doi") if doi_col in input_df.columns else F.lit(None).cast("string").alias("doi"),
        F.col(work_id_col).cast("string").alias("work_id")
        if work_id_col in input_df.columns
        else F.lit(None).cast("string").alias("work_id"),
    ).dropDuplicates()

    # 2-3. linkage + classification
    linkage = linkage_join(
        input_df,
        references,
        doi_col=doi_col,
        work_id_col=work_id_col,
        authors_col=authors_col,
        author_sep=author_sep,
        input_name_style=input_name_style,
        reference_name_style=reference_name_style,
        name_threshold=name_threshold,
    )
    linkage = classify_linkage_status(linkage, orgs).withColumnRenamed(
        "input_author", "input_author_name"
    )

    # 6. affiliation discovery
    aff_discovered = discover_works_by_affiliation(
        linkage.withColumnRenamed("input_author_name", "input_author"),
        references,
        input_ids,
    )

    # 4-5, 7. entity path (optional — the reference's entity mode flag)
    ent_discovered = None
    if run_entity_discovery and orgs:
        org_affils = (
            linkage.filter(F.col("linkage_status") == "org_match_found")
            .select(F.col("ref_affiliation"))
            .dropDuplicates()
        )
        raw_entities = extract_org_entities(org_affils, "ref_affiliation")
        entity_keys = filter_entities(raw_entities)
        # validation against the known-org list (keeps only entities that
        # fuzzily match a configured organization)
        orgs_df = references.sparkSession.createDataFrame(
            [(o,) for o in orgs], "org_name string"
        )
        validated = validate_entities(
            entity_keys.select(
                F.col("entity_key").alias("entity_text"),
                F.col("source_affiliations").alias("source_affiliation"),
            ),
            orgs_df,
            threshold=entity_threshold,
        )
        validated_keys = validated.select(
            F.col("entity_text").alias("entity_key"),
            F.col("source_affiliation").alias("source_affiliations"),
        )
        ent_discovered = discover_works_by_entities(
            validated_keys, references, orgs, input_ids,
            already_discovered=aff_discovered.select(
                "discovered_work_id", "discovered_doi"
            ).dropDuplicates(),
        )
        # an empty ent_discovered unions harmlessly in combine — no
        # driver-side emptiness action (it would execute this branch twice)

    # 8-9. combine + counts
    combined = combine_discovered_works(aff_discovered, ent_discovered)
    counts = match_type_counts(combined) if combined is not None else None
    return {
        "linkage": linkage.orderBy(
            "input_doi", "input_work_id", "input_author_name"
        ),
        "discovered": combined.orderBy("match_type", "doi", "author")
        if combined is not None
        else None,
        "match_counts": counts,
    }
