"""Deterministic synthetic fixtures mirroring the reference's tables
(FIXTURES.md §3-5): ``author_references``, ``input_works``, and the
long-format ``long_fields`` EAV table.

Small-scale driver-side generation (pandas → createDataFrame) — these
exist to test the transplanted linkage/discovery/pivot operators against
a DuckDB oracle that executes the REFERENCE's own SQL shapes
(repository.py / build_db.py) with our kernels registered as UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ccer.functions.normalize import normalize_text

_FIRST = [
    "John", "Mary", "José", "Anna", "Li", "Søren", "Müller", "Elena",
    "Pierre", "Akiko", "Carlos", "Fatima", "Ivan", "Grace", "Ahmed",
]
_LAST = [
    "Smith", "García", "Chen", "Müller", "Johnson", "Kowalski", "Rossi",
    "Nakamura", "Ali", "Brown", "Søndergaard", "Petrov", "Silva", "Novák",
]
_ORGS = [
    "European Molecular Biology Laboratory",
    "University of Heidelberg",
    "Max Planck Institute for Biology",
    "Institut Pasteur",
    "Universidad de Buenos Aires",
    "Tokyo Institute of Technology",
    "EMBL Heidelberg Campus",
    "Centre National de la Recherche Scientifique",
]
_ORG_VARIANTS = {
    "European Molecular Biology Laboratory": [
        "European Molecular Biology Laboratory",
        "European Molecular Biology Laboratory (EMBL)",
        "EMBL - European Molecular Biology Laboratory",
    ],
    "University of Heidelberg": [
        "University of Heidelberg",
        "Universität Heidelberg",
        "Heidelberg University",
    ],
}


def _style_name(first: str, last: str, style_idx: int) -> str:
    if style_idx == 0:
        return f"{first} {last}"
    if style_idx == 1:
        return f"{last}, {first}"
    return f"{last} {first[0]}"


def make_author_references(
    spark: SparkSession, n_works: int = 300, seed: int = 42
) -> DataFrame:
    """author_references with dirty DOIs ('' / 'null'), styled names, org
    variants, ~15% null DOIs, derived normalized_affiliation_key
    (build_db.py:252-276 shape)."""
    rng = np.random.RandomState(seed)
    rows = []
    for w in range(n_works):
        work_id = f"W{w:06d}"
        r = rng.rand()
        if r < 0.15:
            doi = None
        elif r < 0.18:
            doi = ""
        elif r < 0.20:
            doi = "null"
        else:
            doi = f"10.{1000 + w % 9000}/ref.{w}"
        n_authors = rng.randint(1, 4)
        for a in range(n_authors):
            first = _FIRST[rng.randint(0, len(_FIRST))]
            last = _LAST[rng.randint(0, len(_LAST))]
            author = _style_name(first, last, 0)
            org = _ORGS[rng.randint(0, len(_ORGS))]
            variants = _ORG_VARIANTS.get(org, [org])
            aff = variants[rng.randint(0, len(variants))]
            norm_aff = normalize_text(aff)
            rows.append(
                {
                    "work_id": work_id,
                    "doi": doi,
                    "author_sequence": a + 1,
                    "author_name": author,
                    "normalized_author_name": normalize_text(author),
                    "affiliation_sequence": 1,
                    "affiliation_name": aff,
                    "normalized_affiliation_name": norm_aff,
                    "affiliation_ror": (
                        f"https://ror.org/{rng.randint(0, 10**9):09d}"
                        if rng.rand() > 0.3
                        else None
                    ),
                    "normalized_affiliation_key": (norm_aff or "").strip().lower(),
                }
            )
    pdf = pd.DataFrame(rows)
    return spark.createDataFrame(pdf)


def make_input_works(
    spark: SparkSession, references: pd.DataFrame | None = None,
    n_rows: int = 80, seed: int = 43, author_sep: str = ";",
) -> DataFrame:
    """input_works CSV shape (config_sample.yaml:9-12): dirty DOI forms,
    optional work_id, multi-author strings. ~70% overlap with the
    reference works so linkage finds matches."""
    rng = np.random.RandomState(seed)
    dirty_forms = [
        lambda d: d,
        lambda d: f"https://doi.org/{d}",
        lambda d: f"doi:{d}",
        lambda d: f"{d}?utm_source=x",
        lambda d: f'"{d}"',
    ]
    rows = []
    for i in range(n_rows):
        w = rng.randint(0, 300)
        overlap = rng.rand() < 0.7
        if overlap:
            doi_core = f"10.{1000 + w % 9000}/ref.{w}"
            work_id = f"W{w:06d}"
        else:
            doi_core = f"10.{5000 + i}/miss.{i}"
            work_id = f"X{i:06d}"
        doi = dirty_forms[rng.randint(0, len(dirty_forms))](doi_core)
        n_auth = rng.randint(1, 3)
        authors = author_sep.join(
            f"{_FIRST[rng.randint(0, len(_FIRST))]} {_LAST[rng.randint(0, len(_LAST))]}"
            for _ in range(n_auth)
        )
        rows.append(
            {
                "doi": doi,
                "work_id": work_id if rng.rand() < 0.8 else None,
                "authors": authors,
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows))


def make_long_fields(spark: SparkSession, n_works: int = 60, seed: int = 44) -> DataFrame:
    """Long/EAV field table (openalex main.rs:910-919 header shape) with
    bracketed array indices in subfield_path — the pivot/denormalize
    fixture, including the empty-affiliation case (main.rs:487-500)."""
    rng = np.random.RandomState(seed)
    rows = []
    for w in range(n_works):
        work_id = f"W{w:06d}"
        doi = f"10.{1000 + w}/long.{w}" if rng.rand() > 0.2 else None
        n_authors = rng.randint(1, 4)
        for a in range(n_authors):
            first = _FIRST[rng.randint(0, len(_FIRST))]
            last = _LAST[rng.randint(0, len(_LAST))]
            rows.append((work_id, doi, "authorships.author.display_name",
                         f"authorships[{a}].author.display_name", f"{first} {last}"))
            n_affs = rng.randint(0, 3)  # 0 ⇒ the empty-affiliation row case
            for f_idx in range(n_affs):
                org = _ORGS[rng.randint(0, len(_ORGS))]
                rows.append((work_id, doi, "authorships.affiliations.raw_affiliation_string",
                             f"authorships[{a}].affiliations[{f_idx}].raw_affiliation_string", org))
                if rng.rand() > 0.5:
                    rows.append((work_id, doi, "authorships.affiliations.institution_ids",
                                 f"authorships[{a}].affiliations[{f_idx}].institution_ids[0]",
                                 f"I{rng.randint(0, 50):04d}"))
    pdf = pd.DataFrame(
        rows, columns=["work_id", "doi", "field_name", "subfield_path", "value"]
    )
    pdf["source_id"] = "S1"
    pdf["doi_prefix"] = pdf["doi"].map(lambda d: d.split("/")[0] if d else None)
    pdf["source_file_path"] = "synthetic.jsonl.gz"
    return spark.createDataFrame(pdf)


def make_institution_ror_map(spark: SparkSession, seed: int = 45) -> DataFrame:
    rng = np.random.RandomState(seed)
    rows = [
        {"institution_id": f"I{i:04d}", "ror": f"https://ror.org/{rng.randint(0, 10**9):09d}"}
        for i in range(50)
    ]
    return spark.createDataFrame(pd.DataFrame(rows))
