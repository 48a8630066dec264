"""Pure deterministic kernels — the byte-identical invariant surface.

Every normalization / similarity function used by the engine lives here
exactly once, as plain Python over str / numpy, so the same bytes are
produced whether the caller is a pandas UDF on an executor, the DuckDB
oracle harness, or a unit test on the driver.
"""

from ccer.functions.normalize import (
    ascii_fold,
    extract_doi,
    html_to_text,
    is_latin_char_text,
    is_likely_acronym,
    normalize_text,
    normalize_url,
    url_host,
    word_shingles,
    char_shingles,
)
from ccer.functions.textsim import (
    jaro_similarity,
    jaro_winkler_similarity,
    levenshtein,
    levenshtein_ratio,
    jaccard,
    cosine_tfidf,
)
from ccer.functions.names import parse_name_by_style, are_names_similar

__all__ = [
    "ascii_fold",
    "extract_doi",
    "html_to_text",
    "is_latin_char_text",
    "is_likely_acronym",
    "normalize_text",
    "normalize_url",
    "url_host",
    "word_shingles",
    "char_shingles",
    "jaro_similarity",
    "jaro_winkler_similarity",
    "levenshtein",
    "levenshtein_ratio",
    "jaccard",
    "cosine_tfidf",
    "parse_name_by_style",
    "are_names_similar",
]
