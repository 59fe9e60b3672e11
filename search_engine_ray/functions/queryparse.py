"""Reference-compatible query parser (SURVEY.md §2.2 M7).

The reference grammar (``/root/reference/SearchEngine.h:103-133``,
``README.md:30-49``)::

    category: term term "quoted phrase" | category: term, term

Categories (dispatch via the ad-hoc hash ``c[0] + 2*c[1]`` at
``SearchEngine.h:109``; we dispatch by name): ``values`` (body text),
``title``, ``sites``, ``langs``, ``locations``, ``people``, ``orgs``,
``authors``, ``countries``.

Reference quirks, reproduced only under ``strict_compat=True`` (the
conformance mode; the default parser fixes them — SURVEY §2.2 M7 "preserve
quirks in the oracle; fix them behind a flag"):

- the category label itself matches the term regex and is probed as a term;
- terms with ``len(term) <= 2`` are skipped BEFORE quote stripping
  (``SearchEngine.h:116-119``), so ``"a"`` (3 chars with quotes) survives
  while bare ``a`` does not;
- a term with mismatched quotes is skipped ("term was skipped",
  ``SearchEngine.h:121-127``) while the rest of the group is still probed;
  the fixed (non-strict) mode rejects the group with QueryParseError;
- quoted multi-word phrases under ``values:``/``title:`` are kept as ONE
  term (spaces included) and can never match the tokenized index — phrases
  only work for metadata categories.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# category name → index field probed (metadata fields use set semantics)
CATEGORY_FIELD = {
    "values": "text",
    "title": "title",
    "sites": "site",
    "langs": "language",
    "locations": "location",
    "people": "person",
    "orgs": "organization",
    "authors": "author",
    "countries": "country",
}

TEXT_CATEGORIES = frozenset({"values", "title"})

# one category group: label + everything until the next label or '|'
_GROUP_RE = re.compile(r"(\w+)\s*:\s*([^|]*)")
# a term: a COMPLETE quoted phrase, else a bare word that may carry a
# dangling quote (the reference arg regex `"..."|[^, ]+`, SearchEngine.h:111:
# an unterminated quote is NOT a phrase — the word token keeps the quote char
# and later fails the quote-matching check)
_TERM_RE = re.compile(r'"[^"]+"|“[^”]+”|[^,\s]+')


@dataclass(frozen=True)
class Probe:
    """One (field, term) index probe compiled from the query."""
    category: str
    field: str
    term: str
    is_phrase: bool = False


class QueryParseError(ValueError):
    pass


def parse_query(raw: str, *, strict_compat: bool = False) -> list[Probe]:
    """Compile a reference-grammar query string into index probes.

    Driver-side pure function — no Dataset work (SURVEY §2.2 M7 RD mapping).
    """
    probes: list[Probe] = []
    for m in _GROUP_RE.finditer(raw):
        category, body = m.group(1).lower(), m.group(2)
        field = CATEGORY_FIELD.get(category)
        if field is None:
            if strict_compat:
                continue  # reference: unknown hash → no matching case, skipped
            raise QueryParseError(f"unknown category {category!r}")
        group_terms: list[tuple[str, bool]] = []
        if strict_compat:
            # quirk: the label itself ("values:") re-matches the term regex
            # in the reference scan and is probed as a term
            group_terms.append((category + ":", False))
        ok = True
        for tm in _TERM_RE.finditer(body):
            tok = tm.group(0)
            if strict_compat and len(tok) <= 2:
                continue  # quirk: length check BEFORE quote stripping
            quoted = (tok.startswith('"') or tok.startswith("“"))
            endq = (tok.endswith('"') or tok.endswith("”"))
            if quoted != endq:
                if strict_compat:
                    # reference prints "term was skipped" and continues —
                    # only the offending term is dropped, the rest of the
                    # group is still probed (SearchEngine.h:121-127)
                    continue
                ok = False  # fixed mode: mismatched quotes reject the group
                break
            if quoted:
                tok = tok[1:-1]
            if not tok:
                continue
            if not strict_compat and len(tok) <= 2 and not quoted:
                continue
            is_phrase = quoted and (" " in tok)
            if not strict_compat and is_phrase and category in TEXT_CATEGORIES:
                # fixed behavior: tokenized fields cannot match phrases —
                # split into individual terms instead of a dead probe
                for w in tok.split():
                    group_terms.append((w, False))
                continue
            group_terms.append((tok, is_phrase))
        if not ok:
            if strict_compat:
                continue
            raise QueryParseError(f"mismatched quotes in {category!r} group")
        for term, is_phrase in group_terms:
            probes.append(Probe(category=category, field=field, term=term,
                                is_phrase=is_phrase))
    return probes
