"""Query-biased snippet extraction (best-window selection).

The reference REPL's ``see N`` prints the WHOLE stored document
(``DisplaySource``, KaggleFinanceSourceEngine.cpp:99-116).  At web scale a
serving tier returns a query-biased excerpt instead: the W-token window of
the document containing the most DISTINCT query terms (ties: most total
hits, then earliest window), with the hits highlighted.  This is the classic
Luhn-style significant-window heuristic every public search stack uses.

Determinism contract: tokenization mirrors the index analyzer exactly
(``TOKEN_DELIMITERS`` split + ``normalize_token`` + optional Porter stem),
so a term matches the snippet iff it matched at index time.  Pure function
of (text, terms, window) — golden-pinned and property-tested in
``tests/test_snippet.py``.

Scale shape: snippets are computed for the k result docs of a query (k≈10),
never corpus-wide; the per-doc cost is one linear scan of the doc's tokens
(numpy two-pointer over match positions).
"""

from __future__ import annotations

import re

import numpy as np

from .analyze import TOKEN_DELIMITERS, normalize_token, porter_stem

# one token = a maximal run of non-delimiter chars, with its char span
_TOKEN_RE = re.compile("[^" + re.escape(TOKEN_DELIMITERS) + "]+")


def tokenize_with_offsets(text: str, *, stem: bool = False
                          ) -> list[tuple[int, int, str | None]]:
    """``[(char_start, char_end, normalized_term_or_None), ...]`` in document
    order.  ``None`` marks a token the analyzer rejects (non-ASCII etc.) —
    callers drop it before window selection (window width is measured in
    KEPT tokens, the stream the positional index stores); the char span is
    kept so the raw-text render can still print the rejected token."""
    out = []
    for m in _TOKEN_RE.finditer(text):
        term = normalize_token(m.group())
        if term is not None and stem:
            term = porter_stem(term)
        out.append((m.start(), m.end(), term))
    return out


def best_window(norm_terms: list[str | None], qterms: frozenset[str],
                window: int) -> tuple[int, int] | None:
    """Token-index span ``[lo, hi]`` (inclusive) of the best ``window``-token
    window: max distinct query terms, then max total hits, then earliest.
    ``None`` when no token matches."""
    window = max(1, window)
    hit_pos = np.array([i for i, t in enumerate(norm_terms)
                        if t is not None and t in qterms], dtype=np.int64)
    if hit_pos.size == 0:
        return None
    hit_term = [norm_terms[i] for i in hit_pos]
    best = None  # (distinct, total, -start_pos, lo_hit, hi_hit)
    counts: dict[str, int] = {}
    distinct = 0
    b = 0
    for a in range(hit_pos.size):
        # extend right edge while the window still spans <= `window` tokens
        while b < hit_pos.size and hit_pos[b] - hit_pos[a] + 1 <= window:
            t = hit_term[b]
            counts[t] = counts.get(t, 0) + 1
            if counts[t] == 1:
                distinct += 1
            b += 1
        key = (distinct, b - a, -int(hit_pos[a]), a, b - 1)
        if best is None or key > best:
            best = key
        # retire the left hit before advancing
        t = hit_term[a]
        counts[t] -= 1
        if counts[t] == 0:
            distinct -= 1
    lo_hit, hi_hit = best[3], best[4]
    return int(hit_pos[lo_hit]), int(hit_pos[hi_hit])


def center_window(lo: int, hi: int, n_kept: int, window: int
                  ) -> tuple[int, int]:
    """Pad the match span ``[lo, hi]`` out to ``window`` KEPT tokens,
    clamped to ``[0, n_kept - 1]`` — the single definition of excerpt
    centering shared by :func:`make_snippet` (raw-text serving render) and
    ``q_doc_snippets`` (the SQL-verified render); the third copy is the
    arithmetic inlined in the ``doc_snippets`` DuckDB oracle."""
    pad = max(0, window - (hi - lo + 1))
    start = max(0, lo - pad // 2)
    end = min(n_kept - 1, start + window - 1)
    start = max(0, end - window + 1)
    return start, end


def make_snippet(text: str, qterms, *, window: int = 30,
                 mark: tuple[str, str] = ("**", "**"),
                 stem: bool = False, ellipsis: str = "…") -> str | None:
    """Best-window excerpt of ``text`` with query-term hits wrapped in
    ``mark``.  The match span is centered inside a ``window``-token excerpt
    (clamped to the document).  Returns ``None`` when no term matches.

    Window width is measured in KEPT tokens (analyzer-rejected tokens —
    non-ASCII, apostrophe-only — occupy no width), so the selected window
    is exactly the one ``best_window`` picks over the kept-token stream
    that the positional index stores and the ``snippet_windows`` SQL
    oracle verifies.  Rejected tokens inside the chosen raw-text span
    still render (unhighlighted) — they are part of the original text."""
    window = max(1, window)
    qset = frozenset(qterms)
    toks = tokenize_with_offsets(text, stem=stem)
    if not toks:
        return None
    norm = [t for _, _, t in toks]
    kept_idx = [i for i, t in enumerate(norm) if t is not None]
    if not kept_idx:
        return None
    span = best_window([norm[i] for i in kept_idx], qset, window)
    if span is None:
        return None
    lo_k, hi_k = span
    start_k, end_k = center_window(lo_k, hi_k, len(kept_idx), window)
    start, end = kept_idx[start_k], kept_idx[end_k]
    pieces = []
    if start > 0:
        pieces.append(ellipsis)
    cursor = toks[start][0]
    for i in range(start, end + 1):
        c0, c1, t = toks[i]
        pieces.append(text[cursor:c0])
        if t is not None and t in qset:
            pieces.append(mark[0] + text[c0:c1] + mark[1])
        else:
            pieces.append(text[c0:c1])
        cursor = c1
    if end < len(toks) - 1:
        pieces.append(ellipsis)
    return "".join(pieces)
