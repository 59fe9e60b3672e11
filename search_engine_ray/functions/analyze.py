"""Text analysis primitives: tokenization, normalization, stopwords, stemming.

Semantics are locked to the reference engine's tokenizer
(``/root/reference/KaggleFinanceSourceEngine.cpp:135-173,212,252-267``):

- Delimiter set is exactly ``" \\t\\v\\n\\r,.?!;:\\"/()"`` — note that ``-``,
  ``'``, ``<``, ``>``, ``&`` are NOT delimiters (``.cpp:212``).
- A token containing ANY non-ASCII byte is rejected outright
  (``CleanValue``, ``.cpp:142-144``).
- Apostrophes (``'``) are stripped from surviving tokens (``.cpp:145-148``).
- ASCII lowercase (``.cpp:149``).

The production engine keys postings by the normalized token *string*.  The
reference keys by ``std::hash`` of a buffer padded with one trailing NUL per
stripped apostrophe (``.cpp:140,152``); that quirk is reproduced only in
:func:`clean_value_reference_hash` for the conformance oracle.

Everything here is pure Python (reference/fallback path).  The vectorized
Arrow implementation lives in ``stages/tokenize.py`` and is property-tested
against these functions.
"""

from __future__ import annotations

import re

# Exactly the reference delimiter set (KaggleFinanceSourceEngine.cpp:212).
TOKEN_DELIMITERS = " \t\v\n\r,.?!;:\"/()"

# Same set as a regex character class, usable by Python `re`, RE2 (pyarrow
# split_pattern_regex) and DuckDB regexp functions. `]` not present; escape
# nothing but rely on positional rules: put literal chars safely.
TOKEN_SPLIT_PATTERN = r'[ \t\v\n\r,.?!;:"/()]+'

_SPLIT_RE = re.compile(TOKEN_SPLIT_PATTERN)
_NON_ASCII_RE = re.compile(r"[^\x00-\x7F]")


def sql_tokenize_cte(table: str = "documents", text_col: str = "text",
                     id_col: str = "doc_id") -> str:
    """DuckDB SQL fragment producing ``(doc_id, term)`` rows with EXACTLY the
    same semantics as :func:`tokenize` (no stemming, no stopwords).

    Used by ``__ray_entry__.oracle_sql`` so the Ray pipelines and the DuckDB
    oracles share one definition of a token.
    """
    return f"""
    SELECT {id_col} AS doc_id,
           lower(replace(tok, chr(39), '')) AS term
    FROM (
        SELECT {id_col}, unnest(string_split_regex({text_col}, '[ \t\v\n\r,.?!;:"/()]+')) AS tok
        FROM {table}
    )
    WHERE tok <> ''
      AND NOT regexp_matches(tok, '[^\\x00-\\x7F]')
      AND lower(replace(tok, chr(39), '')) <> ''
    """


def sql_token_list_cte(table: str = "documents", text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """DuckDB fragment producing ``(doc_id, toks)`` where ``toks`` is the
    document's ORDERED kept-token list — the list form of the
    :func:`sql_tokenize_cte` stream (list ops preserve order)."""
    return f"""
    SELECT {id_col} AS doc_id,
           list_filter(list_transform(
               list_filter(string_split_regex({text_col}, '[ \t\v\n\r,.?!;:"/()]+'),
                           tok -> tok <> ''
                              AND NOT regexp_matches(tok, '[^\\x00-\\x7F]')),
               tok -> lower(replace(tok, chr(39), ''))),
             t -> t <> '') AS toks
    FROM {table}
    """


def sql_ordinal_tokenize_cte(table: str = "documents",
                             text_col: str = "text",
                             id_col: str = "doc_id") -> str:
    """DuckDB fragment producing ``(doc_id, term, ord)`` rows — the same
    token stream as :func:`sql_tokenize_cte` but WITH each kept token's
    1-based position in its document's kept-token sequence (list ops keep
    order; ``generate_subscripts`` numbers the filtered list).  This is the
    positional-postings oracle: the engine's stored positions are 0-based
    indexes into exactly this stream."""
    return f"""
    SELECT doc_id, unnest(toks) AS term,
           generate_subscripts(toks, 1) AS ord
    FROM ({sql_token_list_cte(table, text_col, id_col)})
    """


def is_ascii(token: str) -> bool:
    return _NON_ASCII_RE.search(token) is None


def normalize_token(token: str) -> str | None:
    """Reference ``CleanValue`` (string-keyed production variant).

    Returns the normalized term, or ``None`` when the token is rejected
    (contains non-ASCII bytes) or normalizes to the empty string.
    """
    if not token or not is_ascii(token):
        return None
    out = token.replace("'", "").lower()
    return out or None


def clean_metadata(value: str) -> str:
    """Reference ``CleanMetaData`` (KaggleFinanceSourceEngine.cpp:155-173):
    same normalization, but a non-ASCII input maps to the EMPTY STRING, which
    callers still insert — all non-ASCII metadata aggregates under ``""``.
    """
    if not is_ascii(value):
        return ""
    return value.replace("'", "").lower()


def clean_value_reference_hash(token: str) -> int | None:
    """Byte-exact reference ``CleanValue`` → 64-bit term hash, including the
    trailing-NUL quirk (``.cpp:140-152``): the output buffer is pre-sized to
    the input length, so each stripped ``'`` leaves a ``\\x00`` byte that is
    included in the hashed view.  Conformance-oracle only.
    """
    if not token or not is_ascii(token):
        return None
    kept = token.replace("'", "").lower()
    padded = kept + "\x00" * (len(token) - len(kept))
    return fnv1a64(padded.encode("ascii"))


def fnv1a64(data: bytes) -> int:
    """Deterministic, seed-free 64-bit FNV-1a (public domain algorithm).

    Used wherever the reference used ``std::hash`` (docIDs from uuids, term
    hashes).  We do NOT reproduce libstdc++'s exact hash value — the reference
    never persists hashes, so only *consistency* matters — but we keep the
    same "identify by 64-bit hash" structure for docIDs.
    """
    from .hashing import fnv1a64_scalar
    return fnv1a64_scalar(data)


def doc_id_from_url(url: str) -> int:
    """docID = hash of the document's unique identifier (reference: hash of
    ``uuid``, KaggleFinanceSourceEngine.cpp:131-133; north-rule input keys
    pages by ``url``). Masked to int63 so it round-trips Parquet int64 >= 0.
    """
    return fnv1a64(url.encode("utf-8")) & 0x7FFFFFFFFFFFFFFF


def tokenize(text: str, *, stopwords: frozenset[str] | None = None,
             stem: bool = False) -> list[str]:
    """Split + normalize. Optional stopword filter / Porter stemming are the
    north-rule extensions (disabled for oracle-SQL-checked paths)."""
    out: list[str] = []
    for raw in _SPLIT_RE.split(text):
        term = normalize_token(raw)
        if term is None:
            continue
        if stopwords is not None and term in stopwords:
            continue
        if stem:
            term = porter_stem(term)
        out.append(term)
    return out


# ---------------------------------------------------------------------------
# Stopwords — classic English stopword list (public domain, the Van
# Rijsbergen / SMART-derived short list used by most IR systems).
# ---------------------------------------------------------------------------

ENGLISH_STOPWORDS = frozenset("""
a about above after again against all am an and any are arent as at be because
been before being below between both but by cant cannot could couldnt did didnt
do does doesnt doing dont down during each few for from further had hadnt has
hasnt have havent having he hed hell hes her here heres hers herself him himself
his how hows i id ill im ive if in into is isnt it its itself lets me more most
mustnt my myself no nor not of off on once only or other ought our ours
ourselves out over own same shant she shed shell shes should shouldnt so some
such than that thats the their theirs them themselves then there theres these
they theyd theyll theyre theyve this those through to too under until up very
was wasnt we wed well were weve werent what whats when whens where wheres which
while who whos whom why whys with wont would wouldnt you youd youll youre youve
your yours yourself yourselves
""".split())


# ---------------------------------------------------------------------------
# Porter stemmer — faithful implementation of the original algorithm
# (M.F. Porter, "An algorithm for suffix stripping", Program 14(3), 1980).
# ---------------------------------------------------------------------------

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in the C?(VC)^m V? form."""
    m = 0
    i, n = 0, len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (len(word) >= 2 and word[-1] == word[-2] and _is_cons(word, len(word) - 1))


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if (_is_cons(word, len(word) - 3) and not _is_cons(word, len(word) - 2)
            and _is_cons(word, len(word) - 1)):
        return word[-1] not in "wxy"
    return False


_STEP2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
          ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
          ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
          ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
          ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")]

_STEP3 = [("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
          ("ical", "ic"), ("ful", ""), ("ness", "")]

_STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
          "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize"]


def porter_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                continue
            if _measure(stem) > 1:
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w
