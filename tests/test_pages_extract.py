"""Pages corpus synthesis + HTML extraction byte-identity (FIXTURES.md §1)."""

import numpy as np
import pyarrow as pa

from search_engine_ray.sources.pages import escape_html, pages_batch
from search_engine_ray.stages.extract import ExtractText, extract_text_array


def test_roundtrip_byte_identical():
    t = pages_batch(np.arange(300))
    got = extract_text_array(t["html"])
    assert got.to_pylist() == t["text"].to_pylist()


def test_generation_batching_independent():
    whole = pages_batch(np.arange(100))
    part = pages_batch(np.arange(40, 60))
    assert part["html"].to_pylist() == whole.slice(40, 20)["html"].to_pylist()
    assert part["url"].to_pylist() == whole.slice(40, 20)["url"].to_pylist()


def test_entity_escape_roundtrip():
    s = """a & b < c > d "e" 'f' &amp; already-escaped"""
    esc = escape_html(s)
    assert "&" not in esc.replace("&amp;", "").replace("&lt;", "") \
        .replace("&gt;", "").replace("&quot;", "").replace("&#39;", "")
    # extractor inverse
    arr = pa.array([f"<html><body><article><p>{esc}</p></article></body></html>"
                    .encode()], type=pa.binary())
    assert extract_text_array(arr).to_pylist() == [s]


def test_extract_stage_drops_html_and_hashes_url():
    t = pages_batch(np.arange(10))
    out = ExtractText()(t)
    assert "html" not in out.column_names
    assert out.column_names == ["doc_id", "url", "text", "lang"]
    assert out["text"].to_pylist() == t["text"].to_pylist()
    ids = out["doc_id"].to_pylist()
    assert len(set(ids)) == 10 and all(i >= 0 for i in ids)


def test_schema_and_quirk_rates():
    t = pages_batch(np.arange(2000))
    texts = t["text"].to_pylist()
    n_apos = sum("'" in x for x in texts)
    n_na = sum(any(ord(c) > 127 for c in x) for x in texts)
    # ~2% apostrophe docs, ~1% non-ASCII docs (FIXTURES §1)
    assert 10 <= n_apos <= 100
    assert 5 <= n_na <= 60
    assert t["warc_ts"].to_pylist()[1].timestamp() - \
        t["warc_ts"].to_pylist()[0].timestamp() == 1.0
