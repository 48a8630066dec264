"""Deterministic text / url / html normalization kernels.

Semantics mirror the reference pipeline's normalization chain
(reference: find_additional_works_from_input_csv/query_db/utils.py:9-70 —
``is_latin_char_text`` / ``normalize_text`` / ``extract_doi`` /
``is_likely_acronym``), re-implemented from scratch in pure Python.

The reference transliterates with the ``unidecode`` package; that package
is not part of our dependency set, so :func:`ascii_fold` is our canonical
transliteration: NFKD decomposition + combining-mark strip + an explicit
table for the non-decomposable Latin letters in U+00C0–U+024F. It is THE
single implementation — pandas UDFs, tests, and oracles all call this
module, which is what makes "byte-identical extracted text per url"
(BASELINE.json input_hint) hold across executors and batch boundaries.
"""

from __future__ import annotations

import re
import unicodedata

# Non-decomposable Latin letters (NFKD leaves them intact) mapped the way
# classic ASCII transliteration does. Covers Latin-1 Supplement and Latin
# Extended-A/B — i.e. the U+0000–U+024F range the reference's
# is_latin_char_text gate selects for transliteration.
_FOLD_TABLE = str.maketrans(
    {
        "ß": "ss",
        "ẞ": "SS",
        "æ": "ae",
        "Æ": "AE",
        "œ": "oe",
        "Œ": "OE",
        "ø": "o",
        "Ø": "O",
        "đ": "d",
        "Đ": "D",
        "ð": "d",
        "Ð": "D",
        "þ": "th",
        "Þ": "Th",
        "ł": "l",
        "Ł": "L",
        "ħ": "h",
        "Ħ": "H",
        "ŋ": "ng",
        "Ŋ": "NG",
        "ı": "i",
        "İ": "I",
        "ĸ": "k",
        "ſ": "s",
        "Ƿ": "W",
        "ƿ": "w",
        "Ȝ": "G",
        "ȝ": "g",
        # Greek (reference's unidecode transliterates these too when its
        # one-latin-char gate passes, utils.py:9-26 — mixed-script
        # affiliations must not silently lose their Greek/Cyrillic runs)
        "α": "a", "β": "b", "γ": "g", "δ": "d", "ε": "e", "ζ": "z",
        "η": "e", "θ": "th", "ι": "i", "κ": "k", "λ": "l", "μ": "m",
        "ν": "n", "ξ": "x", "ο": "o", "π": "p", "ρ": "r", "ς": "s",
        "σ": "s", "τ": "t", "υ": "u", "φ": "ph", "χ": "kh", "ψ": "ps",
        "ω": "o",
        "Α": "A", "Β": "B", "Γ": "G", "Δ": "D", "Ε": "E", "Ζ": "Z",
        "Η": "E", "Θ": "Th", "Ι": "I", "Κ": "K", "Λ": "L", "Μ": "M",
        "Ν": "N", "Ξ": "X", "Ο": "O", "Π": "P", "Ρ": "R", "Σ": "S",
        "Τ": "T", "Υ": "U", "Φ": "Ph", "Χ": "Kh", "Ψ": "Ps", "Ω": "O",
        # Cyrillic (GOST-style, unidecode's convention)
        "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e",
        "ж": "zh", "з": "z", "и": "i", "й": "i", "к": "k", "л": "l",
        "м": "m", "н": "n", "о": "o", "п": "p", "р": "r", "с": "s",
        "т": "t", "у": "u", "ф": "f", "х": "kh", "ц": "ts", "ч": "ch",
        "ш": "sh", "щ": "shch", "ъ": "'", "ы": "y", "ь": "'", "э": "e",
        "ю": "iu", "я": "ia",
        "А": "A", "Б": "B", "В": "V", "Г": "G", "Д": "D", "Е": "E",
        "Ж": "Zh", "З": "Z", "И": "I", "Й": "I", "К": "K", "Л": "L",
        "М": "M", "Н": "N", "О": "O", "П": "P", "Р": "R", "С": "S",
        "Т": "T", "У": "U", "Ф": "F", "Х": "Kh", "Ц": "Ts", "Ч": "Ch",
        "Ш": "Sh", "Щ": "Shch", "Ъ": "'", "Ы": "Y", "Ь": "'", "Э": "E",
        "Ю": "Iu", "Я": "Ia",
    }
)

_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)
_WS_RE = re.compile(r"\s+")


def ascii_fold(text: str) -> str:
    """Deterministic ASCII transliteration (our unidecode stand-in).

    NFKD-decompose FIRST (so precomposed Greek/Cyrillic — ά, ё — reduce
    to base letter + combining mark), then apply the fold table to the
    base letters, then drop remaining non-ASCII codepoints (combining
    marks, CJK — CJK pinyin transliteration is deliberately out of scope;
    the reference's unidecode romanizes it, documented divergence).
    """
    if not text:
        return text
    # pure-ASCII fast path: NFKD is the identity, the fold table has no
    # ASCII keys, and encode/decode are no-ops — skip all three. ASCII is
    # the common case for web text; str.isascii() is a C-level scan and
    # the translate() it avoids was the hottest call in the features
    # kernel's normalize step (measured 0.88 s of 4.8 s per 12k docs).
    if text.isascii():
        return text
    # mixed text: fold only the non-ASCII runs, memoized. Equivalent to
    # folding the whole string because NFKD decomposes per character
    # (never across run boundaries) and the fold table + ascii-drop are
    # per-character too; diacritic words repeat Zipfian-style, so the run
    # cache turns the remaining translate work into dict hits.
    return _NONASCII_RUN.sub(_fold_run, text)


_NONASCII_RUN = re.compile(r"[^\x00-\x7f]+")
_RUN_CACHE: dict[str, str] = {}


def _fold_run(m) -> str:
    s = m.group()
    v = _RUN_CACHE.get(s)
    if v is None:
        if len(_RUN_CACHE) > 500_000:
            _RUN_CACHE.clear()
        v = (
            unicodedata.normalize("NFKD", s)
            .translate(_FOLD_TABLE)
            .encode("ascii", "ignore")
            .decode("ascii")
        )
        _RUN_CACHE[s] = v
    return v


def is_latin_char_text(text) -> bool:
    """True iff any character falls in U+0000..U+024F.

    Same gate as the reference (utils.py:9-16): texts with at least one
    basic-Latin/Latin-extended character get transliterated; pure CJK /
    Cyrillic / etc. text does not.
    """
    if not isinstance(text, str):
        return False
    # C-speed short-circuit: any ASCII char is inside the gate, and for
    # latin text the genexpr below exits on the first char anyway \u2014 the
    # slow case is pure-CJK text, where isascii() fails instantly and the
    # scan below is unavoidable (it must prove NO char is in range)
    if text.isascii():
        return bool(text)
    return any(ch <= "\u024f" for ch in text)


def normalize_text(text):
    """Canonical text normalization (reference utils.py:18-26 semantics).

    fold-to-ascii (if latin) → lowercase → strip non-word/non-space →
    trim. Non-str input passes through unchanged, like the reference.
    """
    if not isinstance(text, str):
        return text
    if is_latin_char_text(text):
        text = ascii_fold(text)
    text = text.lower()
    text = _PUNCT_RE.sub("", text)
    return text.strip()


_DOI_URL_PREFIXES = [
    "https://doi.org/",
    "http://doi.org/",
    "https://dx.doi.org/",
    "http://dx.doi.org/",
    "https://www.doi.org/",
    "http://www.doi.org/",
    "doi.org/",
    "dx.doi.org/",
    "www.doi.org/",
    "doi:",
    "doi:",  # the reference lists 'doi:' and 'DOI:'; matching is lowercased
]

_DOI_RE = re.compile(r"^(10\.\d{4,}(?:\.\d+)?/[-._;()\/:a-zA-Z0-9]+)(?:\s|$)")


def extract_doi(text):
    """Extract a clean DOI from a dirty identifier string.

    Reference semantics (utils.py:29-59): strip wrapping <>/quotes, strip
    URL/doi: prefixes, cut at ?/# query/fragment, match the DOI grammar,
    fall back to any `10.*/` string with trailing punctuation stripped.
    """
    if not text or not isinstance(text, str):
        return None
    text = text.strip().strip("<>").strip('"').strip("'")
    lower = text.lower()
    for prefix in _DOI_URL_PREFIXES:
        if lower.startswith(prefix):
            text = text[len(prefix):]
            break
    if "?" in text:
        text = text.split("?")[0]
    if "#" in text:
        text = text.split("#")[0]
    text = text.strip()
    m = _DOI_RE.match(text)
    if m:
        return m.group(1).strip()
    if text.startswith("10.") and "/" in text:
        return text.rstrip(".,;:")
    return None


def is_likely_acronym(text) -> bool:
    """≤5 chars after removing './-' and all-uppercase (utils.py:62-70)."""
    if not text:
        return False
    text = text.strip()
    if len(text) <= 5 and text.isupper():
        return True
    stripped = text.replace(".", "").replace("-", "")
    return len(stripped) <= 5 and stripped.isupper()


# --------------------------------------------------------------------------
# URL normalization — the web-page analog of the reference's key building
# (build_db.py:267 `lower(trim(coalesce(...)))`), extended with the
# canonicalization rules a crawl dedup pipeline needs.
# --------------------------------------------------------------------------

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")
_TRACKING_PARAM_RE = re.compile(
    r"^(utm_[a-z]+|gclid|fbclid|msclkid|ref|referrer|source|mc_cid|mc_eid)$"
)


def url_host(url: str) -> str:
    """Normalized host: lowercase, strip scheme/userinfo/port, strip www."""
    if not url:
        return ""
    u = _SCHEME_RE.sub("", url.strip())
    host = u.split("/", 1)[0].split("?", 1)[0].split("#", 1)[0]
    if "@" in host:
        host = host.rsplit("@", 1)[1]
    host = host.split(":", 1)[0].lower().rstrip(".")
    if host.startswith("www."):
        host = host[4:]
    return host


def normalize_url(url: str) -> str:
    """Canonical page URL: host + path with tracking params, fragments,
    default docs (index.html), and trailing slashes removed.

    Two crawl records of the same page under utm-decorated / trailing-slash
    variants normalize to the same string (FIXTURES.md §1 near-dup rule).
    """
    if not url:
        return ""
    u = _SCHEME_RE.sub("", url.strip())
    u = u.split("#", 1)[0]
    if "?" in u:
        base, query = u.split("?", 1)
        kept = []
        for part in query.split("&"):
            key = part.split("=", 1)[0].lower()
            if part and not _TRACKING_PARAM_RE.match(key):
                kept.append(part)
        u = base + ("?" + "&".join(kept) if kept else "")
    hostpart, sep, path = u.partition("/")
    host = url_host("http://" + hostpart)
    path = path.rstrip("/") if sep else ""
    for default_doc in ("index.html", "index.htm", "index.php"):
        if path == default_doc or path.endswith("/" + default_doc):
            path = path[: -len(default_doc)].rstrip("/")
            break
    return host + ("/" + path if path else "")


# --------------------------------------------------------------------------
# Deterministic HTML → text extraction (the per-url byte-identical
# invariant of BASELINE.json input_hint). Pure regex state machine — no
# parser library — so the output is a pure function of the input bytes.
# --------------------------------------------------------------------------

_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_TAG_RE = re.compile(
    r"</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|section|article|header|"
    r"footer|blockquote|pre|hr|title)\b[^>]*>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]+>")
_ENTITY_MAP = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}
_NUM_ENTITY_RE = re.compile(r"&#(x?[0-9a-fA-F]+);")


def _decode_entities(text: str) -> str:
    for ent, ch in _ENTITY_MAP.items():
        text = text.replace(ent, ch)

    def _num(m: re.Match) -> str:
        body = m.group(1)
        try:
            code = int(body[1:], 16) if body[0] in "xX" else int(body)
            return chr(code) if 0 < code < 0x110000 else ""
        except ValueError:
            return ""

    return _NUM_ENTITY_RE.sub(_num, text)


def html_to_text(html) -> str:
    """Deterministic plain-text extraction from HTML bytes or str.

    Strategy: decode UTF-8 (errors→replace), drop script/style/comments,
    turn block tags into newlines, strip remaining tags, decode the common
    entities, collapse horizontal whitespace per line, collapse blank-line
    runs. Same input bytes → same output string, everywhere.
    """
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    text = _COMMENT_RE.sub(" ", html)
    text = _SCRIPT_STYLE_RE.sub(" ", text)
    text = _BLOCK_TAG_RE.sub("\n", text)
    text = _TAG_RE.sub(" ", text)
    text = _decode_entities(text)
    lines = []
    for line in text.split("\n"):
        line = _WS_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


# --------------------------------------------------------------------------
# Shingling — the unit the MinHash / SimHash / Jaccard operators consume.
# --------------------------------------------------------------------------


def word_shingles(text: str, k: int = 3) -> list[str]:
    """Sorted-unique word k-grams of the normalized text."""
    if not text:
        return []
    words = normalize_text(text).split()
    if len(words) < k:
        return [" ".join(words)] if words else []
    return sorted({" ".join(words[i : i + k]) for i in range(len(words) - k + 1)})


def char_shingles(text: str, k: int = 5) -> list[str]:
    """Sorted-unique character k-grams of the normalized text."""
    if not text:
        return []
    s = normalize_text(text)
    if len(s) < k:
        return [s] if s else []
    return sorted({s[i : i + k] for i in range(len(s) - k + 1)})
