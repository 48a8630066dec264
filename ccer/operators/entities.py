"""ORG-entity extraction over affiliation/text columns.

The reference batches Flair NER inference (query_db/analysis/
entity_extraction.py:55-68 — ``model.predict(sentences)`` over batches,
keep ORG spans). No torch/flair ships in this environment, so the model
call is replaced by a DETERMINISTIC heuristic extractor with the exact
same Spark plumbing — ``mapInPandas`` with a lazily-initialized
per-executor "model" — and the same downstream contract (entity spans →
acronym/length pre-filter, services.py:131-139 → entity keys). Plugging a
real model back in changes one function.

The heuristic: maximal runs of ≥2 capitalized words (allowing lowercase
connectors of/for/and/the/de/du/von), the standard org-name surface shape.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ccer.functions.normalize import is_likely_acronym, normalize_text

_CONNECTORS = {"of", "for", "and", "the", "de", "du", "von", "der", "di"}
_WORD_RE = re.compile(r"[A-Za-zÀ-ÖØ-öø-ÿ][\w.&-]*")


class _HeuristicOrgModel:
    """Stands in for the Flair SequenceTagger; loaded once per executor
    (the reference's module-level model load, entity_extraction.py:5-20).
    Replace ``predict_batch`` with a real model.predict to upgrade."""

    def predict_batch(self, texts: list[str]) -> list[list[str]]:
        out = []
        for text in texts:
            spans = []
            if text:
                words = _WORD_RE.findall(text)
                run: list[str] = []
                for w in words:
                    if w[0].isupper():
                        run.append(w)
                    elif w.lower() in _CONNECTORS and run:
                        run.append(w)
                    else:
                        if len([x for x in run if x[0].isupper()]) >= 2:
                            spans.append(" ".join(run).strip())
                        run = []
                if len([x for x in run if x[0].isupper()]) >= 2:
                    spans.append(" ".join(run).strip())
            out.append(spans)
        return out


_MODEL_CACHE: dict = {}


def _get_model(model_factory=None):
    """Per-executor model cache, keyed by factory identity. A
    ``model_factory`` is any zero-arg callable returning an object with
    ``predict_batch(list[str]) -> list[list[str]]`` — e.g. a module-level
    function loading a Flair/torch SequenceTagger (reference
    entity_extraction.py:5-20 module-level load) — so a real model drops
    in without code edits. Default is the deterministic heuristic. The
    cache key uses the factory's module+qualname so re-pickled task
    closures reuse the already-loaded model in the executor process."""
    factory = model_factory or _HeuristicOrgModel
    key = (getattr(factory, "__module__", ""), getattr(factory, "__qualname__", repr(factory)))
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = factory()
    return _MODEL_CACHE[key]


ENTITY_SCHEMA = "source_text string, entity string"


def extract_org_entities(df: DataFrame, text_col: str, model_factory=None) -> DataFrame:
    """(… text_col …) → (source_text, entity) rows, one per extracted ORG
    span — Arrow-batched, model cached per executor process.

    ``model_factory``: optional pluggable NER backend (see _get_model);
    must be picklable (a module-level function / functools.partial), as
    it ships to executors inside the Arrow task closure."""

    def gen(iterator):
        model = _get_model(model_factory)
        for pdf in iterator:
            texts = pdf[text_col].fillna("").tolist()
            spans = model.predict_batch(texts)
            rows = [
                (texts[i], span) for i in range(len(texts)) for span in spans[i]
            ]
            yield pd.DataFrame(rows, columns=["source_text", "entity"])

    return df.select(text_col).dropDuplicates().mapInPandas(gen, schema=ENTITY_SCHEMA)


def filter_entities(entities: DataFrame, min_len: int = 15) -> DataFrame:
    """The reference's entity pre-filter (services.py:131-139 +
    utils.py:62-70): drop acronyms; keep entities whose raw AND normalized
    forms exceed ``min_len``. Returns (entity_key, source_affiliations)
    rows ready for the discovery join."""
    from ccer.operators.linkage import normalize_text_udf

    import pandas as pd  # noqa: F811
    from pyspark.sql import types as T

    @F.pandas_udf(T.BooleanType())
    def is_acronym_udf(s: pd.Series) -> pd.Series:
        return pd.Series([is_likely_acronym(x or "") for x in s])

    return (
        entities.withColumn("entity_norm", normalize_text_udf("entity"))
        .filter(
            (~is_acronym_udf(F.col("entity")))
            & (F.length("entity") > min_len)
            & (F.length("entity_norm") > min_len)
        )
        .select(
            F.col("entity_norm").alias("entity_key"),
            F.col("source_text").alias("source_affiliations"),
        )
        .dropDuplicates(["entity_key"])
    )
