"""HTML → text extraction, the north-rule "parse" stage.

Reference analogue: the rapidjson DOM parse of raw article files
(``/root/reference/KaggleFinanceSourceEngine.cpp:202-210``); the north-rule
input replaces JSON with Common-Crawl-style HTML (``html:binary``), and the
per-row invariant is **byte-identical extracted text per url** vs the
corpus generator (``sources/pages.py``).

Fully vectorized: the article body is isolated with two anchored regex
replaces, paragraph tags become ``\\n\\n`` joins, and the 5-entity escape map
is inverted with chained ``replace_substring`` — no per-row Python.  The
extraction contract (entity map + paragraph separator) is frozen here and
versioned; changing it invalidates built indexes.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

EXTRACT_VERSION = 1

# inverse of sources.pages._ESCAPES, applied in reverse order (& last)
_UNESCAPES = [("&#39;", "'"), ("&quot;", '"'), ("&gt;", ">"),
              ("&lt;", "<"), ("&amp;", "&")]


def _list_edge(sp: pa.ListArray, *, last: bool) -> pa.Array:
    """First (or last) element of each list in a NON-NULL ListArray —
    ``list_element`` accepts only scalar indices, so select via the raw
    offsets + one take."""
    import numpy as np
    off = np.frombuffer(sp.buffers()[1], np.int32)[
        sp.offset: sp.offset + len(sp) + 1]
    idx = (off[1:] - 1) if last else off[:-1]
    return sp.values.take(pa.array(idx))


def extract_text_array(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    """``html:binary`` → extracted ``text:string`` (vectorized)."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    s = html.cast(pa.string())  # corpus HTML is valid UTF-8 by construction
    # keep only the <article> body.  Anchors are literals, so two
    # max_splits=1 splits + edge selection replace the anchored regex
    # scans (memmem vs RE2 over the whole doc — 210 → 143 ms per 25k-doc
    # block, byte-identical incl. anchorless rows, where the 1-element
    # list's last==first element is the unchanged string).
    if s.null_count == 0:
        sp = pc.split_pattern(s, "<article><p>", max_splits=1)
        tail = _list_edge(sp, last=True)
        sp2 = pc.split_pattern(tail, "</p></article>", max_splits=1)
        s = _list_edge(sp2, last=False)
    else:
        # null rows make the offset edge-selection ill-defined; the regex
        # path propagates nulls as nulls (rare: corpus html is non-null)
        s = pc.replace_substring_regex(s, r"(?s)^.*?<article><p>", "")
        s = pc.replace_substring_regex(s, r"(?s)</p></article>.*$", "")
    # paragraph boundaries → ground-truth separator
    s = pc.replace_substring(s, "</p><p>", "\n\n")
    # entity unescape on the dirty-row SUBSET only: every entity starts
    # with '&', so one literal scan finds the rows that can match at all
    # (few percent on web-ish text); blindly chaining 5 full-column
    # replaces materialized the whole batch 5× (measured: 203 ms/204 MB →
    # 120 ms/65 MB per 8192-doc batch, byte-identical output)
    m = pc.match_substring(s, "&")
    if pc.any(m).as_py():
        sub = s.filter(m)
        for ent, raw in _UNESCAPES:
            sub = pc.replace_substring(sub, ent, raw)
        s = pc.replace_with_mask(s, m, sub)
    return s


_FULL_UNESCAPES = _UNESCAPES + [("&copy;", "©"), ("&mdash;", "—")]


def extract_full_text_array(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    """``html:binary`` → ALL visible text (nav/footer boilerplate INCLUDED),
    one paragraph per markup block, ``\\n\\n``-joined.

    This is the input to boilerplate-paragraph removal
    (``stages/webtext.BoilerplateParagraphs``): unlike
    :func:`extract_text_array` (which relies on the ``<article>`` anchor),
    real crawl pipelines extract everything and remove repeated blocks
    statistically.  Vectorized: every tag run → newline, entity unescape,
    blank-line collapse, edge trim."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    s = html.cast(pa.string())
    s = pc.replace_substring_regex(s, r"(?:<[^>]*>)+", "\n")
    for ent, raw in _FULL_UNESCAPES:
        s = pc.replace_substring(s, ent, raw)
    # any newline run (plus surrounding blanks) → one paragraph separator
    s = pc.replace_substring_regex(s, r"\s*\n\s*", "\n\n")
    return pc.replace_substring_regex(s, r"^\s+|\s+$", "")


class ExtractText:
    """``map_batches`` callable: pages batch → ``(url, text, lang, ...)``.

    Drops the heavy ``html`` binary column immediately (SURVEY §7.5 item 6:
    the shuffle must never carry it) and derives the int63 ``doc_id`` from
    ``url`` (reference docID = hash of uuid,
    ``KaggleFinanceSourceEngine.cpp:131-133``).
    """

    def __init__(self, *, html_col: str = "html", url_col: str = "url",
                 keep_cols: tuple[str, ...] = ("lang",)):
        self.html_col = html_col
        self.url_col = url_col
        self.keep_cols = keep_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import doc_ids_from_urls
        text = extract_text_array(batch[self.html_col])
        cols = {
            "doc_id": pa.array(doc_ids_from_urls(batch[self.url_col]),
                               type=pa.int64()),
            "url": batch[self.url_col],
            "text": text,
        }
        for c in self.keep_cols:
            if c in batch.column_names:
                cols[c] = batch[c]
        return pa.table(cols)
