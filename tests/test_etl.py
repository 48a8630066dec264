"""EAV pivot/denormalize parity (the reference's Rust relay semantics)
verified against a DuckDB oracle over the same long-format fixture."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ccer.operators.etl import build_reference_table, pivot_author_affiliations
from ccer.sources.reference_fixtures import make_institution_ror_map, make_long_fields


@pytest.fixture(scope="module")
def long_fields(spark):
    df = make_long_fields(spark, n_works=50).cache()
    df.count()
    return df


def test_pivot_denormalize_matches_oracle(spark, long_fields):
    ror_map = make_institution_ror_map(spark)
    got = pivot_author_affiliations(long_fields, ror_map)
    got_rows = {
        (
            r["work_id"], r["author_sequence"], r["author_name"],
            r["affiliation_sequence"], r["affiliation_name"], r["affiliation_ror"],
        )
        for r in got.collect()
    }
    con = duckdb.connect()
    con.register("long_fields", long_fields.toPandas())
    con.register("inst_ror", ror_map.toPandas())
    expected = con.execute(
        r"""
        WITH idx AS (
          SELECT *,
                 TRY_CAST(regexp_extract(subfield_path, 'authorships\[(\d+)\]', 1) AS INT) AS author_idx,
                 TRY_CAST(regexp_extract(subfield_path, 'affiliations\[(\d+)\]', 1) AS INT) AS aff_idx
          FROM long_fields
        ), authors AS (
          SELECT DISTINCT work_id, doi, author_idx, value AS author_name
          FROM idx WHERE field_name = 'authorships.author.display_name'
        ), affs AS (
          SELECT DISTINCT work_id, author_idx, aff_idx, value AS affiliation_name
          FROM idx WHERE field_name = 'authorships.affiliations.raw_affiliation_string'
        ), inst AS (
          SELECT work_id, author_idx, aff_idx, min(value) AS institution_id
          FROM idx WHERE field_name = 'authorships.affiliations.institution_ids'
          GROUP BY work_id, author_idx, aff_idx
        ), aff_ror AS (
          SELECT a.*, r.ror AS affiliation_ror
          FROM affs a
          LEFT JOIN inst i USING (work_id, author_idx, aff_idx)
          LEFT JOIN inst_ror r ON i.institution_id = r.institution_id
        )
        SELECT au.work_id,
               au.author_idx + 1 AS author_sequence,
               au.author_name,
               coalesce(ar.aff_idx, 0) + 1 AS affiliation_sequence,
               coalesce(ar.affiliation_name, '') AS affiliation_name,
               ar.affiliation_ror
        FROM authors au LEFT JOIN aff_ror ar USING (work_id, author_idx)
        """
    ).fetchall()
    assert got_rows == set(map(tuple, expected))
    # empty-affiliation case present (authors with zero affiliations)
    assert any(r[4] == "" for r in got_rows)


def test_build_reference_table_cleaning(spark):
    raw = spark.createDataFrame(
        [
            ("W1", "10.1/x", 1, "A B", "a b", 1, "Org", "org", None),
            ("W2", "", 1, "C D", "c d", 1, "Org", "org", None),
            ("W3", "null", 1, "E F", "e f", 1, None, None, None),
            ("", "10.2/y", 1, "G H", "g h", 1, "Org", "org", None),   # dropped
            ("W5", "10.3/z", 1, "", "", 1, "Org", "org", None),        # dropped
        ],
        "work_id string, doi string, author_sequence int, author_name string, "
        "normalized_author_name string, affiliation_sequence int, "
        "affiliation_name string, normalized_affiliation_name string, "
        "affiliation_ror string",
    )
    out = build_reference_table(raw)
    rows = {r["work_id"]: r for r in out.collect()}
    assert set(rows) == {"W1", "W2", "W3"}
    assert rows["W2"]["doi"] is None and rows["W3"]["doi"] is None
    assert rows["W1"]["normalized_affiliation_key"] == "org"
    assert rows["W3"]["normalized_affiliation_key"] == ""
