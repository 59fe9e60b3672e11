"""Web-text URL analytics: vectorized URL parsing / normalization.

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
