"""Reference-parity linkage & discovery operators, Spark-first.

The reference's flagship query engine (find_additional_works_from_input_csv/
query_db) re-expressed as composable DataFrame operators:

- OR-key blocked fuzzy linkage join          repository.py:112-144
- linkage-status classification              services.py:66-76
- affiliation-discovery equi-join            repository.py:295-327
- entity substring-containment discovery     repository.py:351-378
- anti-join exclusion (OR over two keys)     repository.py:309-313
- union + window priority dedup              repository.py:459-509
- match-type counts                          repository.py:516-525
- affiliation search                         workflows.py:253-298
- entity validation cross-join               repository.py:527-597

Plan-shape decisions (the Spark-first part):

* The reference's OR-condition join (`doi=doi OR work_id=work_id`) would
  force a nested-loop join; it is decomposed into TWO hash equi-joins
  unioned + dropDuplicates — Catalyst picks broadcast or SMJ per side.
* The per-row Python similarity UDF inside the reference join condition
  becomes an Arrow-batched pandas UDF applied AFTER the equi-join, so the
  join itself stays JVM-side.
* Anti-joins over OR-keys become two chained ``left_anti`` joins (each a
  first-class Spark anti join with null-safe semantics matching the
  reference's explicit IS NOT NULL guards).
* Substring-containment joins broadcast the (tiny, post-filtered) entity
  side; the EXISTS-over-orgs predicate is a column expression over a
  broadcast array literal — no join at all.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from ccer.functions.names import are_names_similar
from ccer.functions.normalize import extract_doi, normalize_text
from ccer.functions.textsim import partial_ratio

STATUS_ORG_MATCH = "org_match_found"
STATUS_FIRST_AVAILABLE = "first_available"
STATUS_NAME_MATCH_NO_ORG = "name_match_no_org_affiliation"
MATCH_TYPE_AFFILIATION = "affiliation_exact"
MATCH_TYPE_ENTITY = "entity_extracted"


# ---------------------------------------------------------------- UDF pool
def names_similar_udf(style_a: str, style_b: str, threshold: float):
    """Arrow-batched pandas UDF wrapping the canonical name-match kernel."""

    @F.pandas_udf(T.BooleanType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                are_names_similar(x or "", y or "", style_a, style_b, threshold)
                for x, y in zip(a, b)
            ]
        )

    return _udf


@F.pandas_udf(T.StringType())
def extract_doi_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: extract_doi(x) if x else None)


@F.pandas_udf(T.StringType())
def normalize_text_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: normalize_text(x) if isinstance(x, str) else None)


@F.pandas_udf(T.DoubleType())
def partial_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([partial_ratio(x or "", y or "") for x, y in zip(a, b)])


# ------------------------------------------------------------ core shapes
def _nonempty(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & (F.trim(c) != "")


def or_key_equi_join(
    left: DataFrame, right: DataFrame, key_pairs: list[tuple[str, str]]
) -> DataFrame:
    """UNION of one equi-join per key pair, de-duplicated — the hash-join
    decomposition of the reference's OR join (repository.py:120-130).
    Null/empty keys never match (the reference's explicit guards)."""
    parts = []
    for lk, rk in key_pairs:
        cond = _nonempty(left[lk]) & _nonempty(right[rk]) & (left[lk] == right[rk])
        parts.append(left.join(right, cond, "inner"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates()


def anti_join_any_key(
    df: DataFrame, exclude: DataFrame, key_pairs: list[tuple[str, str]]
) -> DataFrame:
    """Drop rows matching the exclude set on ANY key (repository.py:309-313
    LEFT JOIN … WHERE all NULL) as chained left_anti joins."""
    out = df
    for dk, ek in key_pairs:
        ex = exclude.select(F.col(ek).alias("_xk")).filter(_nonempty("_xk")).distinct()
        out = out.join(ex, out[dk] == ex._xk, "left_anti")
    return out


def explode_authors(
    df: DataFrame, authors_col: str, sep: str | None, keep_cols: list[str]
) -> DataFrame:
    """Multi-author split (repository.py:95-110): trim/UNNEST/DISTINCT."""
    base = df.filter(_nonempty(authors_col))
    if sep:
        author = F.explode(F.split(F.trim(F.col(authors_col)), F.lit(sep), -1))
    else:
        author = F.trim(F.col(authors_col))
    out = base.select(*keep_cols, author.alias("input_author"))
    if sep:
        out = out.withColumn("input_author", F.trim("input_author"))
    return out.filter(_nonempty("input_author")).dropDuplicates()


def linkage_join(
    input_df: DataFrame,
    references: DataFrame,
    doi_col: str | None = "doi",
    work_id_col: str | None = "work_id",
    authors_col: str = "authors",
    author_sep: str | None = None,
    input_name_style: str = "auto",
    reference_name_style: str = "auto",
    name_threshold: float = 0.85,
) -> DataFrame:
    """The flagship blocked fuzzy linkage (repository.py:54-147).

    input rows → clean_doi (kernel UDF) → explode authors → OR-key
    equi-join against references → Arrow-batched name-similarity
    post-filter → DISTINCT (input_doi, input_work_id, input_author,
    ref_author_name, ref_affiliation).
    """
    inp = input_df
    if doi_col and doi_col in inp.columns:
        inp = inp.withColumn("input_doi", extract_doi_udf(F.col(doi_col)))
    else:
        inp = inp.withColumn("input_doi", F.lit(None).cast("string"))
    if work_id_col and work_id_col in inp.columns:
        inp = inp.withColumn("input_work_id", F.col(work_id_col).cast("string"))
    else:
        inp = inp.withColumn("input_work_id", F.lit(None).cast("string"))

    authors = explode_authors(
        inp, authors_col, author_sep, ["input_doi", "input_work_id"]
    )

    refs = references.select(
        F.col("doi").alias("ref_doi"),
        F.col("work_id").alias("ref_work_id"),
        F.col("author_name").alias("ref_author_name"),
        F.col("normalized_affiliation_name").alias("ref_affiliation"),
    ).filter(_nonempty("ref_author_name"))

    joined = or_key_equi_join(
        authors,
        refs,
        [("input_doi", "ref_doi"), ("input_work_id", "ref_work_id")],
    )
    similar = names_similar_udf(input_name_style, reference_name_style, name_threshold)
    return (
        joined.filter(similar(F.col("input_author"), F.col("ref_author_name")))
        .select(
            "input_doi",
            "input_work_id",
            "input_author",
            "ref_author_name",
            "ref_affiliation",
        )
        .dropDuplicates()
    )


def classify_linkage_status(linkage: DataFrame, org_names: list[str]) -> DataFrame:
    """Linkage-status classifier (services.py:66-76) as column algebra.

    org substring found in normalized affiliation ⇒ org_match_found;
    empty org list ⇒ first_available; else name_match_no_org_affiliation.
    """
    if not org_names:
        return linkage.withColumn("linkage_status", F.lit(STATUS_FIRST_AVAILABLE))
    orgs = F.array(*[F.lit(normalize_text(o) or o.lower()) for o in org_names])
    aff_norm = F.lower(F.coalesce(F.col("ref_affiliation"), F.lit("")))
    has_org = F.exists(orgs, lambda o: aff_norm.contains(o))
    return linkage.withColumn(
        "linkage_status",
        F.when(has_org, F.lit(STATUS_ORG_MATCH)).otherwise(
            F.lit(STATUS_NAME_MATCH_NO_ORG)
        ),
    )


def discover_works_by_affiliation(
    linkage: DataFrame, references: DataFrame, exclude_ids: DataFrame
) -> DataFrame:
    """Affiliation-discovery join (repository.py:295-327): linked
    affiliations → every reference row sharing the normalized key, minus
    the input id set."""
    ld = linkage.filter(
        F.col("linkage_status").isin(STATUS_ORG_MATCH, STATUS_FIRST_AVAILABLE)
    )
    joined = ld.join(
        references,
        F.lower(F.trim(ld.ref_affiliation)) == references.normalized_affiliation_key,
        "inner",
    ).select(
        "input_doi",
        "input_work_id",
        F.col("input_author").alias("input_author_name"),
        F.col("ref_affiliation").alias("linking_affiliation"),
        F.col("work_id").alias("discovered_work_id"),
        F.col("doi").alias("discovered_doi"),
        F.col("author_name").alias("discovered_author"),
        F.col("affiliation_name").alias("discovered_author_affiliation"),
        F.col("affiliation_ror").alias("discovered_ror_id"),
    )
    return anti_join_any_key(
        joined,
        exclude_ids,
        [("discovered_doi", "doi"), ("discovered_work_id", "work_id")],
    )


def discover_works_by_entities(
    entity_keys: DataFrame,
    references: DataFrame,
    org_names: list[str],
    exclude_ids: DataFrame,
    already_discovered: DataFrame | None = None,
) -> DataFrame:
    """Entity substring-containment discovery (repository.py:351-378).

    references ⋈ broadcast(entities) on key CONTAINS entity_key, gated by
    EXISTS(org substring) as a broadcast-array predicate, minus already
    discovered and input ids. DISTINCT + deterministic ordering applied by
    the caller at export.
    """
    if not org_names:
        return entity_keys.sparkSession.createDataFrame(
            [],
            "source_embl_affiliation string, extracted_entity string, "
            "discovered_work_id string, discovered_doi string, "
            "discovered_author string, discovered_author_affiliation string, "
            "discovered_normalized_affiliation string, discovered_ror_id string",
        )
    orgs = F.array(*[F.lit(o.lower()) for o in org_names])
    refs = references.filter(
        F.exists(orgs, lambda o: F.col("normalized_affiliation_key").contains(o))
    )
    joined = (
        refs.join(
            F.broadcast(entity_keys),
            refs.normalized_affiliation_key.contains(entity_keys.entity_key),
            "inner",
        )
        .select(
            F.col("source_affiliations").alias("source_embl_affiliation"),
            F.col("entity_key").alias("extracted_entity"),
            F.col("work_id").alias("discovered_work_id"),
            F.col("doi").alias("discovered_doi"),
            F.col("author_name").alias("discovered_author"),
            F.col("affiliation_name").alias("discovered_author_affiliation"),
            F.col("normalized_affiliation_name").alias(
                "discovered_normalized_affiliation"
            ),
            F.col("affiliation_ror").alias("discovered_ror_id"),
        )
        .dropDuplicates()
    )
    if already_discovered is not None:
        joined = anti_join_any_key(
            joined,
            already_discovered,
            [
                ("discovered_work_id", "discovered_work_id"),
                ("discovered_doi", "discovered_doi"),
            ],
        )
    return anti_join_any_key(
        joined,
        exclude_ids,
        [("discovered_doi", "doi"), ("discovered_work_id", "work_id")],
    )


def combine_discovered_works(
    affiliation_discovered: DataFrame | None, entity_discovered: DataFrame | None
) -> DataFrame | None:
    """UNION ALL + ROW_NUMBER priority dedup (repository.py:459-509):
    affiliation matches outrank entity matches per (work_id, doi, author)."""
    from pyspark.sql import Window

    parts = []
    if affiliation_discovered is not None:
        parts.append(
            affiliation_discovered.select(
                F.col("discovered_work_id").alias("work_id"),
                F.col("discovered_doi").alias("doi"),
                F.col("discovered_author").alias("author"),
                F.col("discovered_author_affiliation").alias("author_affiliation"),
                F.col("discovered_ror_id").alias("ror_id"),
                F.col("linking_affiliation").alias("matching_affiliation"),
                F.lit(MATCH_TYPE_AFFILIATION).alias("match_type"),
            )
        )
    if entity_discovered is not None:
        parts.append(
            entity_discovered.select(
                F.col("discovered_work_id").alias("work_id"),
                F.col("discovered_doi").alias("doi"),
                F.col("discovered_author").alias("author"),
                F.col("discovered_author_affiliation").alias("author_affiliation"),
                F.col("discovered_ror_id").alias("ror_id"),
                F.col("extracted_entity").alias("matching_affiliation"),
                F.lit(MATCH_TYPE_ENTITY).alias("match_type"),
            )
        )
    if not parts:
        return None
    if len(parts) == 1:
        return parts[0]
    unioned = parts[0].unionByName(parts[1])
    priority = F.when(F.col("match_type") == MATCH_TYPE_AFFILIATION, 1).when(
        F.col("match_type") == MATCH_TYPE_ENTITY, 2
    )
    w = Window.partitionBy("work_id", "doi", "author").orderBy(priority)
    return (
        unioned.withColumn("priority", F.row_number().over(w))
        .filter(F.col("priority") == 1)
        .drop("priority")
    )


def match_type_counts(combined: DataFrame) -> DataFrame:
    """COUNT(DISTINCT COALESCE(work_id, doi)) per match_type
    (repository.py:516-525)."""
    return combined.groupBy("match_type").agg(
        F.countDistinct(F.coalesce("work_id", "doi")).alias("work_count")
    )


def search_affiliations(
    input_df: DataFrame, references: DataFrame, search_col: str
) -> DataFrame:
    """Affiliation search (workflows.py:253-298): normalize the search
    term, hash-join on normalized_affiliation_key, deterministic order."""
    inp = input_df.withColumn(
        "normalized_search_key", normalize_text_udf(F.col(search_col))
    ).withColumn("input_search_term", F.col(search_col))
    joined = inp.join(
        references,
        F.lower(F.trim(F.coalesce(inp.normalized_search_key, F.lit(""))))
        == references.normalized_affiliation_key,
        "inner",
    )
    return joined.select(
        "input_search_term",
        "work_id",
        "doi",
        "author_name",
        "affiliation_name",
        "affiliation_ror",
    ).orderBy("input_search_term", "doi", "author_name")


def validate_entities(
    entities: DataFrame, orgs: DataFrame, threshold: float = 0.85
) -> DataFrame:
    """Entity-validation cross join + partial-ratio filter
    (repository.py:569-579); both sides tiny ⇒ broadcast nested loop."""
    scored = (
        entities.crossJoin(F.broadcast(orgs))
        .withColumn(
            "score", partial_ratio_udf(F.col("entity_text"), F.col("org_name"))
        )
        .filter(F.col("score") > threshold)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("entity_text").orderBy(
        F.desc("score"), F.col("org_name")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .withColumnRenamed("org_name", "matched_org")
    )
