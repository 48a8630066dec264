"""ETL parity operators: nested-JSON flattening and long→wide pivot.

The reference's three-program Rust relay (field extraction → external
sort → streaming group-by pivot → denormalize) collapses into Spark plan
shapes here:

- ``flatten_works``: nested work records → long/EAV rows via posexplode
  (array indices become integer columns instead of text-encoded
  ``authorships[0].…`` paths — openalex main.rs:389-500's trie traversal
  is just nested projection in Spark)
- ``parse_subfield_indices``: when the input IS the reference's
  long format, recover the indices with regexp_extract
  (parse_join…/src/main.rs:318-323)
- ``pivot_author_affiliations``: long rows → denormalized
  author × affiliation rows (parse_join…/src/main.rs:397-531), including
  the empty-affiliation row case (main.rs:487-500) as a left join +
  fillna, and the institution→ROR first-hit lookup (main.rs:466-471) as
  a broadcast hash join.

The ~700 LoC of external-sort machinery in the reference is the Spark
shuffle; nothing to write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ccer.operators.linkage import normalize_text_udf


def flatten_works(works: DataFrame) -> DataFrame:
    """Nested work records → long/EAV rows (the Rust trie traversal,
    openalex main.rs:389-500, as nested projection + posexplode).

    Expects the canonical nested shape
    ``work_id, doi, authorships: array<struct<author_name, affiliations:
    array<struct<affiliation_name, institution_id>>>>`` and emits the
    reference's long format with bracketed subfield paths — array indices
    come from posexplode positions instead of trie bookkeeping.
    """
    a = works.select(
        "work_id",
        "doi",
        F.posexplode_outer("authorships").alias("author_idx", "auth"),
    )
    names = a.select(
        "work_id",
        "doi",
        F.lit("authorships.author.display_name").alias("field_name"),
        F.concat(
            F.lit("authorships["), F.col("author_idx"), F.lit("].author.display_name")
        ).alias("subfield_path"),
        F.col("auth.author_name").alias("value"),
    )
    affs = a.select(
        "work_id",
        "doi",
        F.col("author_idx"),
        F.posexplode_outer("auth.affiliations").alias("aff_idx", "aff"),
    )
    aff_names = affs.filter(F.col("aff").isNotNull()).select(
        "work_id",
        "doi",
        F.lit("authorships.affiliations.raw_affiliation_string").alias("field_name"),
        F.concat(
            F.lit("authorships["), F.col("author_idx"),
            F.lit("].affiliations["), F.col("aff_idx"),
            F.lit("].raw_affiliation_string"),
        ).alias("subfield_path"),
        F.col("aff.affiliation_name").alias("value"),
    )
    inst = affs.filter(F.col("aff.institution_id").isNotNull()).select(
        "work_id",
        "doi",
        F.lit("authorships.affiliations.institution_ids").alias("field_name"),
        F.concat(
            F.lit("authorships["), F.col("author_idx"),
            F.lit("].affiliations["), F.col("aff_idx"),
            F.lit("].institution_ids[0]"),
        ).alias("subfield_path"),
        F.col("aff.institution_id").alias("value"),
    )
    long = names.unionByName(aff_names).unionByName(inst)
    return (
        long.filter(F.col("value").isNotNull())
        .withColumn("source_id", F.lit("S1"))
        .withColumn("doi_prefix", F.substring_index("doi", "/", 1))
        .withColumn("source_file_path", F.lit("nested"))
    )


def parse_subfield_indices(long_fields: DataFrame) -> DataFrame:
    """Add author_idx / aff_idx integer columns parsed from the bracketed
    subfield_path text (reference regexes, main.rs:318-323)."""
    return long_fields.withColumn(
        "author_idx",
        F.regexp_extract("subfield_path", r"authorships\[(\d+)\]", 1).cast("int"),
    ).withColumn(
        "aff_idx",
        F.regexp_extract("subfield_path", r"affiliations\[(\d+)\]", 1).cast("int"),
    )


def pivot_author_affiliations(
    long_fields: DataFrame, institution_ror: DataFrame | None = None
) -> DataFrame:
    """Long/EAV rows → (work_id, doi, author_sequence, author_name,
    normalized_author_name, affiliation_sequence, affiliation_name,
    normalized_affiliation_name, affiliation_ror).

    The reference's per-group pivot loop becomes: two filtered
    projections (authors, affiliations) + a LEFT join on
    (work_id, author_idx) — authors without affiliations keep one row
    with empty affiliation (main.rs:487-500).
    """
    indexed = parse_subfield_indices(long_fields)

    authors = (
        indexed.filter(F.col("field_name") == "authorships.author.display_name")
        .select(
            "work_id",
            "doi",
            F.col("author_idx"),
            F.col("value").alias("author_name"),
        )
        .dropDuplicates(["work_id", "author_idx"])
    )
    affs = (
        indexed.filter(
            F.col("field_name") == "authorships.affiliations.raw_affiliation_string"
        )
        .select(
            "work_id",
            F.col("author_idx"),
            F.col("aff_idx"),
            F.col("value").alias("affiliation_name"),
        )
        .dropDuplicates(["work_id", "author_idx", "aff_idx"])
    )
    inst = (
        indexed.filter(
            F.col("field_name") == "authorships.affiliations.institution_ids"
        )
        .select(
            "work_id",
            "author_idx",
            "aff_idx",
            F.col("value").alias("institution_id"),
        )
        # first-hit-wins lookup (main.rs:506-512)
        .groupBy("work_id", "author_idx", "aff_idx")
        .agg(F.min("institution_id").alias("institution_id"))
    )
    affs = affs.join(inst, ["work_id", "author_idx", "aff_idx"], "left")
    if institution_ror is not None:
        affs = affs.join(
            F.broadcast(institution_ror), "institution_id", "left"
        ).withColumnRenamed("ror", "affiliation_ror")
    else:
        affs = affs.withColumn("affiliation_ror", F.lit(None).cast("string"))

    out = authors.join(affs.drop("institution_id"), ["work_id", "author_idx"], "left")
    out = (
        out.withColumn("affiliation_name", F.coalesce("affiliation_name", F.lit("")))
        .withColumn("aff_idx", F.coalesce("aff_idx", F.lit(0)))
        .withColumn("author_sequence", F.col("author_idx") + 1)
        .withColumn("affiliation_sequence", F.col("aff_idx") + 1)
        .withColumn("normalized_author_name", normalize_text_udf("author_name"))
        .withColumn(
            "normalized_affiliation_name", normalize_text_udf("affiliation_name")
        )
    )
    return out.select(
        "work_id",
        "doi",
        "author_sequence",
        "author_name",
        "normalized_author_name",
        "affiliation_sequence",
        "affiliation_name",
        "normalized_affiliation_name",
        "affiliation_ror",
    )


def build_reference_table(author_affiliations: DataFrame) -> DataFrame:
    """The DuckDB-builder transform (build_db.py:252-276): null-normalize
    doi, validity filter, derived normalized_affiliation_key."""
    doi = F.col("doi")
    clean_doi = F.when(
        doi.isNull() | (doi == "") | (doi == "null"), F.lit(None)
    ).otherwise(doi)
    return (
        author_affiliations.withColumn("doi", clean_doi)
        .filter(
            F.col("work_id").isNotNull()
            & (F.col("work_id") != "")
            & (F.col("work_id") != "null")
            & (F.length("work_id") < 1000)
            & F.col("author_name").isNotNull()
            & (F.col("author_name") != "")
            & (F.length("author_name") < 500)
        )
        .withColumn(
            "normalized_affiliation_key",
            F.lower(F.trim(F.coalesce("normalized_affiliation_name", F.lit("")))),
        )
    )
