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
# strict-compat uses the reference regexes VERBATIM.  Group scan
# (SearchEngine.h:106): named categories immediately followed by ':', body
# up to '|'; the category LABEL is inside the match, so it re-matches the
# term regex naturally (and fuses with the first term when no space/comma
# separates them).  Term scan (SearchEngine.h:110,
# `"((?:\\"|[^"])+)"|([^, ]+)`): escaped quotes are legal inside phrases,
# and bare tokens split ONLY on comma/space (tabs stay inside a token).
_GROUP_RE_STRICT = re.compile(
    r"(?:(?:values)|(?:title)|(?:sites)|(?:langs)|(?:locations)|"
    r"(?:people)|(?:orgs)|(?:authors)|(?:countries)):[^|]*")
_TERM_RE_STRICT = re.compile(r'"(?:\\"|[^"])+"|[^, ]+')


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
    if strict_compat:
        return _parse_query_strict(raw)
    probes: list[Probe] = []
    for m in _GROUP_RE.finditer(raw):
        category, body = m.group(1).lower(), m.group(2)
        field = CATEGORY_FIELD.get(category)
        if field is None:
            raise QueryParseError(f"unknown category {category!r}")
        group_terms: list[tuple[str, bool]] = []
        ok = True
        for tm in _TERM_RE.finditer(body):
            tok = tm.group(0)
            quoted = (tok.startswith('"') or tok.startswith("“"))
            endq = (tok.endswith('"') or tok.endswith("”"))
            if quoted != endq:
                ok = False  # fixed mode: mismatched quotes reject the group
                break
            if quoted:
                tok = tok[1:-1]
            if not tok:
                continue
            if len(tok) <= 2 and not quoted:
                continue
            is_phrase = quoted and (" " in tok)
            if is_phrase and category in TEXT_CATEGORIES:
                # fixed behavior: tokenized fields cannot match phrases —
                # split into individual terms instead of a dead probe
                for w in tok.split():
                    group_terms.append((w, False))
                continue
            group_terms.append((tok, is_phrase))
        if not ok:
            raise QueryParseError(f"mismatched quotes in {category!r} group")
        for term, is_phrase in group_terms:
            probes.append(Probe(category=category, field=field, term=term,
                                is_phrase=is_phrase))
    return probes


def strict_skipped_terms(raw: str) -> list[tuple[str, str]]:
    """The (reason, token) skip decisions the reference prints while
    scanning ``raw`` (``"size"`` → 'Invalid term size', ``"quote"`` →
    'Invalid quote matching'), in scan order — conformance fuzzing compares
    this against the compiled engine's actual stdout."""
    skipped: list[tuple[str, str]] = []
    _parse_query_strict(raw, skipped=skipped)
    return skipped


def _parse_query_strict(raw: str,
                        skipped: list[tuple[str, str]] | None = None
                        ) -> list[Probe]:
    """The reference's ``HandleQuery`` scan, quirk for quirk
    (``SearchEngine.h:106-133``): the label is part of the group match and
    re-matches the term regex (fusing with the first term when nothing
    separates them), unknown categories simply never match the group regex,
    short terms are skipped before quote stripping, a mismatched-quote term
    is skipped alone, and a trailing ESCAPED quote does not close a
    phrase."""
    probes: list[Probe] = []
    for m in _GROUP_RE_STRICT.finditer(raw):
        gm = m.group(0)
        category = gm.split(":", 1)[0]
        field = CATEGORY_FIELD[category]
        for tm in _TERM_RE_STRICT.finditer(gm):
            tok = tm.group(0)
            if len(tok) <= 2:
                if skipped is not None:
                    skipped.append(("size", tok))
                continue  # quirk: length check BEFORE quote stripping
            front = tok.startswith('"')
            back = tok.endswith('"')
            esc = back and len(tok) >= 2 and tok[-2] == "\\"
            if (front and (not back or esc)) or \
                    (not front and back and not esc):
                if skipped is not None:
                    skipped.append(("quote", tok))
                continue  # "term was skipped" — rest of group still probed
            quoted = front and back and not esc
            if quoted:
                tok = tok[1:-1]
            if not tok:
                continue
            probes.append(Probe(category=category, field=field, term=tok,
                                is_phrase=quoted and " " in tok))
    return probes
