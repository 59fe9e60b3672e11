"""Web-text stages: URL parsing / normalization, boilerplate removal.

Common-Crawl-style pipelines group, filter, and rate-limit by URL parts
(host, registered domain, TLD, path depth) long before any text operator
runs.  This stage does the parse with ONE ``pyarrow.compute`` RE2 extract
per batch — no Python row loop — so it composes with ``map_batches`` at
full Arrow speed.

The regex and the normalization rules are mirrored verbatim by the DuckDB
parity tests (`tests/test_webtext.py`): both engines are RE2, so one
pattern literal serves both sides.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# One-shot URL splitter (RE2; no backtracking constructs).  Groups:
# scheme '://' host [':' port] [path-without-query] — query/fragment
# dropped by the path group's character class.
URL_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
          r"(?P<host>[^/:?#]+)(?::(?P<port>[0-9]+))?(?P<path>/[^?#]*)?")

# a path segment = '/' followed by one-or-more non-'/' chars
_SEG_RE = r"/[^/]+"


class UrlParse:
    """pages batch → batch + (scheme, host, domain, tld, path, path_depth).

    Normalization: scheme and host lowercased, trailing host dot stripped,
    missing path → "/".  ``domain`` is the last two host labels (the
    eTLD+1 approximation used when no public-suffix list is shipped);
    ``tld`` the last label.  Unparseable URLs yield null parts (kept, not
    dropped — the caller decides).
    """

    def __init__(self, *, url_col: str = "url",
                 keep: tuple[str, ...] = ()) -> None:
        self.url_col = url_col
        self.keep = keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch[self.url_col]
        m = pc.extract_regex(urls, URL_RE)  # null row on no-match
        scheme = pc.utf8_lower(pc.struct_field(m, "scheme"))
        host = pc.utf8_lower(pc.struct_field(m, "host"))
        host = pc.utf8_rtrim(host, ".")
        # an unmatched optional group extracts as "" (not null) → root path
        path = pc.struct_field(m, "path")
        path = pc.if_else(pc.equal(pc.coalesce(path, pa.scalar("")), ""),
                          pa.scalar("/"), path)
        # null out path where the whole parse failed
        path = pc.if_else(pc.is_valid(host), path, pa.scalar(None, pa.string()))
        depth = pc.if_else(pc.is_valid(path),
                           pc.count_substring_regex(path, _SEG_RE),
                           pa.scalar(None, pa.int32()))
        # last and last-two dot labels, one regex each
        tld = pc.struct_field(
            pc.extract_regex(host, r"(?P<t>[^.]+)$"), "t")
        dom2 = pc.extract_regex(host, r"(?P<d>[^.]+\.[^.]+)$")
        domain = pc.coalesce(pc.struct_field(dom2, "d"), host)
        cols: dict = {self.url_col: urls}
        for c in self.keep:
            cols[c] = batch[c]
        cols.update({"scheme": scheme, "host": host, "domain": domain,
                     "tld": tld, "path": path,
                     "path_depth": depth.cast(pa.int32())})
        return pa.table(cols)


class ExtractLinks:
    """pages batch → ``(src_host, dst_host)`` host-graph edge rows.

    Vectorized (no Python row loop): ONE ``split_pattern`` on ``href="``
    per batch, numpy offset bookkeeping to map fragments back to their
    rows, then RE2 kernels to slice each fragment at the closing quote and
    classify absolute ``http(s)://host`` targets.  Relative hrefs resolve
    to the page's own host and are dropped by default (``drop_self``) —
    the host graph cares about cross-host endorsement, not nav self-loops.
    Multi-edges are preserved; aggregate to weights downstream."""

    def __init__(self, *, html_col: str = "html", url_col: str = "url",
                 drop_self: bool = True):
        self.html_col = html_col
        self.url_col = url_col
        self.drop_self = drop_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        html = batch[self.html_col]
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()
        src = pc.utf8_lower(pc.struct_field(
            pc.extract_regex(batch[self.url_col], URL_RE), "host"))
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        parts = pc.split_pattern(html.cast(pa.string()), 'href="')
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        offsets = parts.offsets.to_numpy(zero_copy_only=False)
        n_per = np.diff(offsets)
        row_idx = np.repeat(np.arange(batch.num_rows), n_per)
        flat = parts.flatten()
        # the first fragment of every row precedes any href → mask it out
        keep = np.ones(len(flat), dtype=bool)
        base = offsets[:-1] - offsets[0]
        keep[base[n_per > 0]] = False
        cand = flat.filter(pa.array(keep))
        rows = row_idx[keep]
        target = pc.struct_field(
            pc.extract_regex(cand, r'^(?P<u>[^"]*)"'), "u")
        dst = pc.utf8_lower(pc.struct_field(
            pc.extract_regex(target, r'^[Hh][Tt][Tt][Pp][Ss]?://'
                                     r'(?P<h>[^/:?#"]+)'), "h"))
        src_rows = src.take(pa.array(rows))
        valid = pc.is_valid(dst)
        if self.drop_self:
            valid = pc.and_(valid, pc.not_equal(dst, src_rows))
        valid = pc.fill_null(valid, False)
        return pa.table({"src_host": src_rows.filter(valid),
                         "dst_host": dst.filter(valid)})


# ---------------------------------------------------------------------------
# Boilerplate-paragraph removal (the CCNet / crawl-hygiene shape)
# ---------------------------------------------------------------------------

def _explode_paragraphs(texts: pa.Array | pa.ChunkedArray
                        ) -> tuple["np.ndarray", pa.Array, "np.ndarray"]:
    """``\\n\\n``-joined texts → ``(row_idx, flat_paragraphs, list_lengths)``
    (empty paragraphs dropped; order preserved)."""
    import numpy as np
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lst = pc.split_pattern(pc.fill_null(texts, ""), "\n\n")
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    lens = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    flat = pc.list_flatten(lst)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return row_idx[keep], flat.filter(pa.array(keep)), lens


class ParagraphHashes:
    """pages batch → distinct ``(h1, h2)`` per (paragraph, doc) — the
    stage-1 shuffle rows of boilerplate detection.  16 bytes per distinct
    paragraph-occurrence; the paragraph TEXT never enters the exchange.
    A paragraph repeated within one doc counts once (df semantics)."""

    def __init__(self, *, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        from ..functions.hashing import content_hash128
        row_idx, paras, _ = _explode_paragraphs(batch[self.text_col])
        h1, h2 = content_hash128(paras)
        order = np.lexsort((h2, h1, row_idx))
        r, a, b = row_idx[order], h1[order], h2[order]
        first = np.ones(r.size, dtype=bool)
        first[1:] = (r[1:] != r[:-1]) | (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return pa.table({"h1": pa.array(a[first].view(np.int64)),
                         "h2": pa.array(b[first].view(np.int64))})


def _member128(h1, h2, set_h1, set_h2):
    """Exact vectorized membership of (h1, h2) pairs in a SORTED-by-(h1, h2)
    small set: one searchsorted + a loop over the set's max h1 multiplicity
    (≈1 for hash keys)."""
    import numpy as np
    # normalize to ONE dtype: int64 vs uint64 comparisons silently promote
    # to float64 (precision loss → wrong membership), so reinterpret all
    # four arrays as uint64 bit patterns before any comparison
    h1 = np.ascontiguousarray(h1).view(np.uint64)
    h2 = np.ascontiguousarray(h2).view(np.uint64)
    set_h1 = np.ascontiguousarray(set_h1).view(np.uint64)
    set_h2 = np.ascontiguousarray(set_h2).view(np.uint64)
    n = h1.size
    hit = np.zeros(n, dtype=bool)
    if not set_h1.size:
        return hit
    lo = np.searchsorted(set_h1, h1, side="left")
    hi = np.searchsorted(set_h1, h1, side="right")
    span = hi - lo
    for j in range(int(span.max(initial=0))):
        sel = span > j
        hit[sel] |= set_h2[lo[sel] + j] == h2[sel]
    return hit


class DropBoilerplate:
    """pages batch → per-page cleaned text stats after removing paragraphs
    whose 128-bit hash is in the broadcast boilerplate set.

    The set travels as ONE ``ray.put`` ObjectRef (fetched and sorted once
    per worker on first use, never re-shipped per batch); reconstruction is
    local to the batch — no shuffle touches paragraph text anywhere in the
    boilerplate pipeline.  ASSUMPTION (documented, CCNet-style): the set of
    paragraphs with df ≥ threshold is small enough to broadcast — true for
    real corpora where high-df blocks are nav/footer/legal boilerplate."""

    def __init__(self, set_ref, *, text_col: str = "text",
                 keep_cols: tuple[str, ...] = ("url",)):
        self.set_ref = set_ref
        self.text_col = text_col
        self.keep_cols = keep_cols
        self._set = None

    def _load(self):
        import numpy as np
        import ray
        if self._set is None:
            s1, s2 = ray.get(self.set_ref) if hasattr(self.set_ref, "hex") \
                else self.set_ref
            s1 = np.asarray(s1, dtype=np.uint64)
            s2 = np.asarray(s2, dtype=np.uint64)
            order = np.lexsort((s2, s1))
            self._set = (s1[order], s2[order])
        return self._set

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        from ..functions.hashing import content_hash128, fnv1a64_array
        s1, s2 = self._load()
        n = batch.num_rows
        row_idx, paras, _ = _explode_paragraphs(batch[self.text_col])
        h1, h2 = content_hash128(paras)
        drop = _member128(h1, h2, s1, s2)
        kept = paras.filter(pa.array(~drop))
        kept_rows = row_idx[~drop]
        kept_counts = np.bincount(kept_rows, minlength=n)
        offsets = np.zeros(n + 1, dtype=np.int32)
        offsets[1:] = np.cumsum(kept_counts)
        lst = pa.ListArray.from_arrays(pa.array(offsets), kept)
        clean = pc.binary_join(lst, "\n\n")
        cols = {c: batch[c] for c in self.keep_cols}
        cols.update({
            "n_paras": pa.array(np.bincount(row_idx, minlength=n)
                                .astype(np.int32)),
            "n_dropped": pa.array(np.bincount(row_idx[drop], minlength=n)
                                  .astype(np.int32)),
            "clean_len": pc.utf8_length(clean).cast(pa.int32()),
            "clean_hash": pa.array(fnv1a64_array(clean).view(np.int64)),
        })
        return pa.table(cols)
