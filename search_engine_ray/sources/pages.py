"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md §1).

Schema per BASELINE.json ``input_hint``::

    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

``text`` is the ground truth; ``html`` is a deterministic wrapper (entity
escaping of ``& < > " '`` only, plus nav/footer boilerplate the extractor
must strip).  INVARIANT: ``stages/extract.py`` must reproduce ``text``
byte-identically per url — property-tested round-trip.

Generation is distributed (``ray.data.range → map_batches``) and
batching-independent: every doc derives its own Philox stream keyed by
``(seed, doc_index)``, so the same ``(n_docs, seed)`` always yields the same
corpus regardless of block sizes or parallelism.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

_SITES = 100
_BASE_TS_US = 1_519_689_600_000_000  # 2018-02-27T00:00:00Z in microseconds

# vocabulary: seeded from the reference sample docs' domain (finance news
# words) + synthetic tail tokens; ~2% apostrophe and ~1% non-ASCII tokens
# exercise the CleanValue quirks (SURVEY §2.2 M2).
_BASE_WORDS = ("the of and to in funds euro german income market stock bank "
               "rate growth shares investors trading price index economy "
               "company quarter earnings profit revenue billion million "
               "percent analyst report federal europe asia global").split()
_VOCAB = _BASE_WORDS + [f"w{k:05d}" for k in range(10_000 - len(_BASE_WORDS))]
_QUIRK_APOSTROPHE = ["it's", "o'brien's", "won't", "market's"]
_QUIRK_NON_ASCII = ["naïve", "zürich", "café"]

_LANGS = ["english", "spanish", "german", "french", "italian", "dutch"]
_LANG_P = [0.90, 0.03, 0.03, 0.02, 0.01, 0.01]

# articles-shaped metadata pools (FIXTURES.md §1b); ~1% of metadata values
# carry non-ASCII bytes to exercise the CleanMetaData empty-string quirk
# (/root/reference/KaggleFinanceSourceEngine.cpp:162-164,217-220)
_AUTHORS = [f"author {i:03d}" for i in range(500)]
_COUNTRIES = ["US", "GB", "DE", "FR", "ES", "IT", "NL", "JP"]
_COUNTRY_P = [0.40, 0.15, 0.12, 0.10, 0.08, 0.07, 0.05, 0.03]
_PERSONS = [f"person {i:03d}" for i in range(300)] + ["josé pérez", "björn über"]
_LOCATIONS = [f"city {i:03d}" for i in range(200)] + ["zürich", "são paulo"]
_ORGS = [f"org {i:03d} inc" for i in range(250)] + ["café corp"]

_HEADER = (b'<html><head><title>%s</title>'
           b'<meta charset="utf-8"></head><body>'
           b'<div class="nav"><a href="/">home</a> | <a href="/about">about</a>'
           b' | <a href="/contact">contact</a></div><article>')
_FOOTER_OPEN = (b'</article><footer>&copy; 2018 %s &mdash; all rights '
                b'reserved.<div class="links"><a href="/terms">terms</a>'
                b'</div>')
_FOOTER_CLOSE = b'</footer></body></html>'

# cross-host outlinks (the host link graph behind PageRank / host analytics):
# drawn from a SEPARATE Philox stream so every pre-existing field of the
# corpus stays byte-identical across generator versions; anchor text is a
# CONSTANT token so full-text extraction sees one more df-frequent
# boilerplate paragraph per link, never new content text.
_LINKS_KEY = 0x4C494E4B  # "LINK"


def _links_html(doc: int, seed: int) -> bytes:
    rng = np.random.Generator(np.random.Philox(key=[seed ^ _LINKS_KEY, doc]))
    n = int(rng.integers(1, 4))
    sites = np.minimum(rng.zipf(1.3, size=n).astype(np.int64) - 1, _SITES - 1)
    anchors = "".join(
        f'<a href="https://site{int(s):03d}.example/p/'
        f'{int(rng.integers(0, 10_000_000)):07d}">related</a>'
        for s in sites)
    return f'<div class="rel">{anchors}</div>'.encode("ascii")

# escape order matters: & first out, & last back (stages/extract.py inverts)
_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
            ('"', "&quot;"), ("'", "&#39;")]


def escape_html(s: str) -> str:
    for raw, ent in _ESCAPES:
        s = s.replace(raw, ent)
    return s


def _doc_row(doc: int, seed: int) -> dict:
    rng = np.random.Generator(np.random.Philox(key=[seed, doc]))
    # Zipf-ish site popularity over a fixed site set
    site = min(int(rng.zipf(1.3)) - 1, _SITES - 1)
    url = f"https://site{site:03d}.example/p/{doc:07d}"
    n_words = int(rng.integers(50, 401))
    # Zipf(1.1) over the vocab, clipped
    idx = np.minimum(rng.zipf(1.1, size=n_words) - 1, len(_VOCAB) - 1)
    words = [_VOCAB[i] for i in idx]
    r = rng.random()
    if r < 0.02:
        words[int(rng.integers(0, n_words))] = _QUIRK_APOSTROPHE[
            int(rng.integers(0, len(_QUIRK_APOSTROPHE)))]
    elif r < 0.03:
        words[int(rng.integers(0, n_words))] = _QUIRK_NON_ASCII[
            int(rng.integers(0, len(_QUIRK_NON_ASCII)))]
    # paragraphs of ~40 words, joined by \n\n — part of the ground-truth text
    paras = [" ".join(words[i:i + 40]) for i in range(0, n_words, 40)]
    text = "\n\n".join(paras)
    title = " ".join(_VOCAB[i] for i in
                     np.minimum(rng.zipf(1.1, size=int(rng.integers(3, 13))) - 1,
                                len(_VOCAB) - 1))
    lang = _LANGS[int(rng.choice(len(_LANGS), p=_LANG_P))]
    body = "</p><p>".join(escape_html(p) for p in paras)
    html = (_HEADER % escape_html(title).encode("utf-8")
            + b"<p>" + body.encode("utf-8") + b"</p>"
            + _FOOTER_OPEN % f"site{site:03d}.example".encode("ascii")
            + _links_html(doc, seed) + _FOOTER_CLOSE)
    # articles-shaped metadata (FIXTURES §1b) — drawn AFTER the text fields
    # so adding them kept html/text byte-stable across generator versions
    author = _AUTHORS[min(int(rng.zipf(1.3)) - 1, len(_AUTHORS) - 1)]
    country = _COUNTRIES[int(rng.choice(len(_COUNTRIES), p=_COUNTRY_P))]
    def _pick(pool):
        k = int(rng.integers(0, 6))
        return [pool[int(i)] for i in rng.integers(0, len(pool), size=k)]
    return {"url": url,
            "warc_ts": _BASE_TS_US + doc * 1_000_000,
            "html": html,
            "text": text,
            "lang": lang,
            "title": title,
            "site": f"site{site:03d}.example",
            "author": author,
            "country": country,
            "persons": _pick(_PERSONS),
            "locations": _pick(_LOCATIONS),
            "organizations": _pick(_ORGS)}


PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("title", pa.string()),
    ("site", pa.string()),
    ("author", pa.string()),
    ("country", pa.string()),
    ("persons", pa.list_(pa.string())),
    ("locations", pa.list_(pa.string())),
    ("organizations", pa.list_(pa.string())),
])


def pages_batch(ids: np.ndarray, seed: int = 42) -> pa.Table:
    rows = [_doc_row(int(d), seed) for d in ids]
    cols = {}
    for field in PAGES_SCHEMA:
        cols[field.name] = pa.array([r[field.name] for r in rows],
                                    type=field.type)
    return pa.table(cols, schema=PAGES_SCHEMA)


def synthesize_pages(n_docs: int, out_dir: str, *, seed: int = 42,
                     overwrite: bool = False) -> str:
    """Write the deterministic pages corpus as partitioned parquet; returns
    ``out_dir``.  Skips generation when the corpus already exists (marker
    file records (n_docs, seed))."""
    import ray.data
    # v2: cross-host outlinks in the footer (text/url/metadata byte-stable)
    marker = os.path.join(out_dir, f"_PAGES_{n_docs}_{seed}_v2")
    if os.path.exists(marker) and not overwrite:
        return out_dir
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def gen(batch: pa.Table) -> pa.Table:
        return pages_batch(batch["id"].to_numpy(zero_copy_only=False), seed)

    (ray.data.range(n_docs)
     .map_batches(gen, batch_format="pyarrow", batch_size=2048)
     .write_parquet(out_dir))
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
