"""Person-name parsing and gated fuzzy name matching.

Re-implements the reference's five name styles and its decision rule
(reference: query_db/analysis/name_matching.py:7-82) from scratch:

- styles ``last_initial`` / ``last_comma_first`` / ``last_first`` /
  ``first_initial_last`` are positional parses, reproduced exactly;
- the default ``first_last`` style in the reference delegates to the
  ``nameparser`` package's HumanName; our stand-in handles the same
  surface (honorific prefixes, generational suffixes, comma forms, last
  token = surname) deterministically in ~40 lines.

``are_names_similar`` is the reference's gate-then-override rule verbatim:
empty-last ⇒ exact normalized equality; JW(last) < threshold ⇒ False;
single-initial firsts compare by initial; else JW(first) ≥ threshold ⇒
True; else JW(last) ≥ 0.95 ⇒ True.
"""

from __future__ import annotations

import re
import unicodedata

from ccer.functions.textsim import jaro_winkler_similarity

_PREFIXES = {
    "dr", "dr.", "prof", "prof.", "professor", "mr", "mr.", "mrs", "mrs.",
    "ms", "ms.", "miss", "sir", "dame", "rev", "rev.", "hon", "hon.",
}
_SUFFIXES = {
    "jr", "jr.", "sr", "sr.", "ii", "iii", "iv", "v", "phd", "ph.d.",
    "md", "m.d.", "esq", "esq.",
}
_SEP_RE = re.compile(r"[-.,]")


def _simple_human_name(name: str) -> tuple[str, str, str]:
    """(first, middle, last) for a free-form western-style name string.

    Handles "Last, First Middle" comma form, honorific prefixes, and
    generational/degree suffixes; otherwise first token = first name,
    final token = last name, middle = the rest.
    """
    name = name.strip()
    if not name:
        return "", "", ""
    if "," in name:
        last_part, _, rest = name.partition(",")
        rest_tokens = [t for t in rest.split() if t.lower() not in _SUFFIXES]
        first = rest_tokens[0] if rest_tokens else ""
        middle = " ".join(rest_tokens[1:])
        return first, middle, last_part.strip()
    tokens = name.split()
    while tokens and tokens[0].lower() in _PREFIXES:
        tokens = tokens[1:]
    while tokens and tokens[-1].lower() in _SUFFIXES:
        tokens = tokens[:-1]
    if not tokens:
        return "", "", ""
    if len(tokens) == 1:
        return "", "", tokens[0]
    return tokens[0], " ".join(tokens[1:-1]), tokens[-1]


def parse_name_by_style(name: str, style: str = "auto") -> dict:
    """Parse a name under one of the reference's five styles.

    Returns {'first','last','middle','normalized','original','style'},
    all lowercase except 'original' (same contract as the reference,
    name_matching.py:7-61).
    """
    name = (name or "").strip()

    if style == "last_initial":
        parts = name.split()
        if len(parts) >= 2:
            last_name = " ".join(parts[:-1])
            initials = parts[-1]
            first_initial = initials[0].lower() if initials else ""
            return {
                "first": first_initial,
                "last": last_name.lower(),
                "middle": "",
                "normalized": f"{last_name.lower()} {first_initial}",
                "original": name,
                "style": style,
            }
        return {
            "first": "",
            "last": name.lower(),
            "middle": "",
            "normalized": name.lower(),
            "original": name,
            "style": style,
        }

    if style == "last_comma_first" and "," in name:
        parts = name.split(",", 1)
        last = parts[0].strip()
        rest = parts[1].strip() if len(parts) > 1 else ""
        rest_parts = rest.split()
        first = rest_parts[0].lower() if rest_parts else ""
        middle = " ".join(rest_parts[1:]).lower() if len(rest_parts) > 1 else ""
        return {
            "first": first,
            "last": last.lower(),
            "middle": middle,
            "normalized": f"{first} {middle} {last.lower()}".strip(),
            "original": name,
            "style": style,
        }

    if style == "last_first":
        parts = name.split()
        if len(parts) >= 2:
            last = parts[0]
            first = parts[1]
            middle = " ".join(parts[2:]) if len(parts) > 2 else ""
            return {
                "first": first.lower(),
                "last": last.lower(),
                "middle": middle.lower(),
                "normalized": f"{first.lower()} {middle.lower()} {last.lower()}".strip(),
                "original": name,
                "style": style,
            }

    if style == "first_initial_last":
        parts = name.split()
        initials = []
        last_idx = -1
        for i, part in enumerate(parts):
            if len(part) <= 2 and (part.endswith(".") or len(part) == 1):
                initials.append(part.replace(".", "").lower())
            else:
                last_idx = i
                break
        if last_idx >= 0:
            last = " ".join(parts[last_idx:])
            first = initials[0] if initials else ""
            middle = " ".join(initials[1:]) if len(initials) > 1 else ""
            return {
                "first": first,
                "last": last.lower(),
                "middle": middle,
                "normalized": f"{first} {middle} {last.lower()}".strip(),
                "original": name,
                "style": style,
            }

    # default: free-form "First [Middle] Last" (reference uses HumanName)
    first, middle, last = _simple_human_name(name)
    clean = f"{first} {middle} {last}".strip()
    clean = unicodedata.normalize("NFKD", clean).encode("ascii", "ignore").decode()
    normalized = _SEP_RE.sub(" ", clean.lower()).strip()
    normalized = re.sub(r"\s+", " ", normalized)
    return {
        "first": first.lower(),
        "last": last.lower(),
        "middle": middle.lower(),
        "normalized": normalized,
        "original": name,
        "style": "first_last",
    }


def are_names_similar(
    name1_str: str,
    name2_str: str,
    name1_style: str = "auto",
    name2_style: str = "auto",
    threshold: float = 0.85,
) -> bool:
    """Gated fuzzy name equality (reference name_matching.py:64-82)."""
    name1 = parse_name_by_style(name1_str, name1_style)
    name2 = parse_name_by_style(name2_str, name2_style)
    if not name1["last"] or not name2["last"]:
        return name1["normalized"] == name2["normalized"]
    last_similarity = jaro_winkler_similarity(name1["last"], name2["last"])
    if last_similarity < threshold:
        return False
    if name1["first"] and name2["first"]:
        if len(name1["first"]) == 1 or len(name2["first"]) == 1:
            if name1["first"][0] == name2["first"][0]:
                return True
        else:
            if jaro_winkler_similarity(name1["first"], name2["first"]) >= threshold:
                return True
    if last_similarity >= 0.95:
        return True
    return False
