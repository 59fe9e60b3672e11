"""Vectorized Arrow stages vs the pure-Python reference implementations."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.functions.analyze import fnv1a64, tokenize
from search_engine_ray.functions.hashing import doc_ids_from_urls, fnv1a64_array
from search_engine_ray.stages.postings import (
    decode_posting,
    encode_postings_table,
)
from search_engine_ray.stages.tokenize import TokenizePostings, split_and_normalize


@given(st.lists(st.text(max_size=80), max_size=30))
@settings(max_examples=150, deadline=None)
def test_split_and_normalize_matches_python(texts):
    row_idx, terms = split_and_normalize(pa.array(texts, type=pa.string()))
    got = {}
    for i, t in zip(row_idx, terms.to_pylist()):
        got.setdefault(int(i), []).append(t)
    for i, tx in enumerate(texts):
        assert got.get(i, []) == tokenize(tx)


@given(st.lists(st.text(max_size=60), max_size=50))
@settings(max_examples=150, deadline=None)
def test_fnv_vectorized_matches_scalar(strings):
    got = fnv1a64_array(pa.array(strings, type=pa.string()))
    want = np.array([fnv1a64(s.encode("utf-8")) for s in strings],
                    dtype=np.uint64)
    assert np.array_equal(got, want)


def test_doc_ids_nonnegative():
    ids = doc_ids_from_urls(pa.array(["https://a/1", "https://a/2"]))
    assert (ids >= 0).all()
    assert ids.dtype == np.int64


def test_tokenize_postings_stage():
    batch = pa.table({
        "doc_id": pa.array([7, 8], type=pa.int64()),
        "text": pa.array(["red red blue", "blue green"]),
    })
    out = TokenizePostings(n_buckets=4, n_doc_shards=2)(batch)
    rows = {(r["term"], r["doc_id"]): (r["tf"], r["doc_len"])
            for r in out.to_pylist()}
    assert rows == {("red", 7): (2, 3), ("blue", 7): (1, 3),
                    ("blue", 8): (1, 2), ("green", 8): (1, 2)}
    for r in out.to_pylist():
        # part = shard * n_buckets + bucket
        assert r["part"] == (r["doc_id"] % 2) * 4 + \
            fnv1a64(r["term"].encode()) % 4


def test_encode_decode_postings_roundtrip():
    rng = np.random.default_rng(42)
    n_terms, rows = 50, []
    for t in range(n_terms):
        docs = np.unique(rng.integers(0, 10_000, rng.integers(1, 40)))
        for d in docs:
            rows.append(("term%03d" % t, int(d), int(rng.integers(1, 9)),
                         int(rng.integers(5, 500))))
    rng.shuffle(rows)
    group = pa.table({
        "term": [r[0] for r in rows],
        "doc_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "tf": pa.array([r[2] for r in rows], type=pa.int32()),
        "doc_len": pa.array([r[3] for r in rows], type=pa.int32()),
    })
    seg = encode_postings_table(group)
    assert seg.num_rows == n_terms
    want = {}
    for term, d, tf, dl in rows:
        want.setdefault(term, []).append((d, tf, dl))
    for row in seg.to_pylist():
        ids, tfs = decode_posting(row)
        expect = sorted(want[row["term"]])
        assert list(ids) == [e[0] for e in expect]
        assert list(tfs) == [e[1] for e in expect]
        assert row["df"] == len(expect)
        assert row["total_tf"] == sum(e[1] for e in expect)
        assert row["max_tf"] == max(e[1] for e in expect)


def test_encode_empty_group():
    group = pa.table({"term": pa.array([], type=pa.string()),
                      "doc_id": pa.array([], type=pa.int64()),
                      "tf": pa.array([], type=pa.int32()),
                      "doc_len": pa.array([], type=pa.int32())})
    assert encode_postings_table(group).num_rows == 0


class TestHashedLinearClassifier:
    def _brute(self, text: str, w):
        from search_engine_ray.functions.analyze import tokenize
        from search_engine_ray.functions.hashing import fnv1a64_scalar
        toks = tokenize(text)
        z = sum(int(w[fnv1a64_scalar(t.encode()) % len(w)]) for t in toks)
        n = len(toks)
        if n == 0:
            return 0.5, False
        import math
        x = (z - 4095 * n) / (4095.0 * n)
        return round(1.0 / (1.0 + math.exp(-x)), 6), z > 4095 * n

    def test_brute_force_parity(self):
        import pyarrow as pa
        from search_engine_ray.stages.textstats import (
            HashedLinearClassifier, classifier_weights)
        texts = ["scan merge window", "", "the the the zzz",
                 "Quick BROWN fox's lazy-dog", "a b c d e f g " * 40,
                 "日本語 ascii mix token", "!!! ... ---"]
        t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                      "text": texts})
        out = HashedLinearClassifier()(t).to_pandas()
        w = classifier_weights()
        for i, txt in enumerate(texts):
            s, lab = self._brute(txt, w)
            assert abs(out.clf_score[i] - s) < 1e-9, (i, txt)
            assert bool(out.clf_label[i]) == lab, (i, txt)

    def test_batching_invariance(self):
        import pyarrow as pa
        import numpy as np
        from search_engine_ray.stages.textstats import HashedLinearClassifier
        texts = [f"w{i % 7} tok{i} shared value line" for i in range(50)]
        t = pa.table({"doc_id": pa.array(range(50), type=pa.int64()),
                      "text": texts})
        c = HashedLinearClassifier()
        whole = c(t).to_pandas()
        parts = [c(t.slice(o, 13)).to_pandas() for o in range(0, 50, 13)]
        import pandas as pd
        joined = pd.concat(parts, ignore_index=True)
        assert np.allclose(whole.clf_score, joined.clf_score)
        assert (whole.clf_label == joined.clf_label).all()

    def test_broadcast_objectref_path(self, ray_session):
        import ray
        import pyarrow as pa
        from search_engine_ray.stages.textstats import (
            HashedLinearClassifier, classifier_weights)
        ref = ray.put(classifier_weights())
        c = HashedLinearClassifier(ref)
        t = pa.table({"doc_id": pa.array([7], type=pa.int64()),
                      "text": ["scan merge window"]})
        base = HashedLinearClassifier()(t).to_pandas()
        got = c(t).to_pandas()
        assert got.equals(base)


class TestDocChunker:
    def _brute(self, text, size, stride):
        from search_engine_ray.functions.analyze import tokenize
        n = len(tokenize(text))
        out = {}
        for p in range(n):
            for k in range(p // stride, -1, -1):
                if p >= k * stride + size:
                    break
                cnt, lo, hi = out.get(k, (0, p, p))
                out[k] = (cnt + 1, min(lo, p), max(hi, p))
        return out

    def test_brute_force_parity(self):
        import pyarrow as pa
        from search_engine_ray.stages.textstats import DocChunker
        texts = ["tok " * 200, "a b c", "", "word " * 64, "x " * 49,
                 "one two three " * 37]
        t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                      "text": [s.strip() for s in texts]})
        got = DocChunker(size=64, stride=48)(t).to_pandas()
        for i, txt in enumerate(texts):
            want = self._brute(txt.strip(), 64, 48)
            sub = got[got.doc_id == i]
            assert len(sub) == len(want), (i, len(sub), len(want))
            for _, r in sub.iterrows():
                cnt, lo, hi = want[r.chunk_id]
                assert (r.n_tokens, r.start_pos, r.end_pos) == (cnt, lo, hi)

    def test_batching_invariance(self):
        import pandas as pd
        import pyarrow as pa
        from search_engine_ray.stages.textstats import DocChunker
        texts = [("w%d " % i) * (i * 7 % 130) for i in range(40)]
        t = pa.table({"doc_id": pa.array(range(40), type=pa.int64()),
                      "text": texts})
        c = DocChunker()
        whole = c(t).to_pandas().sort_values(
            ["doc_id", "chunk_id"], ignore_index=True)
        parts = pd.concat([c(t.slice(o, 11)).to_pandas()
                           for o in range(0, 40, 11)], ignore_index=True)
        parts = parts.sort_values(["doc_id", "chunk_id"], ignore_index=True)
        pd.testing.assert_frame_equal(whole, parts)

    def test_param_validation(self):
        import pytest
        from search_engine_ray.stages.textstats import DocChunker
        with pytest.raises(ValueError):
            DocChunker(size=100, stride=40)   # a token could span 3 chunks
        with pytest.raises(ValueError):
            DocChunker(size=10, stride=20)


class TestSequencePacking:
    def test_brute_force_parity(self, ray_session):
        import collections
        import pyarrow as pa
        import ray.data
        from search_engine_ray.functions.analyze import tokenize
        from search_engine_ray.pipelines.queries import q_sequence_packing
        import os, tempfile
        texts = {i: ("tok%d " % i) * (i * 37 % 300) for i in range(1, 41)}
        t = pa.table({"doc_id": pa.array(sorted(texts), type=pa.int64()),
                      "text": [texts[i].strip() for i in sorted(texts)],
                      "lang": ["en"] * 40})
        d = tempfile.mkdtemp()
        import pyarrow.parquet as pq
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        got = q_sequence_packing(d, capacity=50, n_streams=4).to_pandas()
        # brute force: concat within stream in doc_id order, split every 50
        want = collections.Counter()
        toks = collections.Counter()
        offs = collections.Counter()
        for i in sorted(texts):
            n = len(tokenize(texts[i].strip()))
            if n == 0:
                continue
            s = i % 4
            c = offs[s]
            for seq in range(c // 50, (c + n - 1) // 50 + 1):
                want[(s, seq)] += 1
                toks[(s, seq)] += min((seq + 1) * 50, c + n) - max(seq * 50, c)
            offs[s] = c + n
        assert len(got) == len(want)
        for _, r in got.iterrows():
            assert want[(r.stream, r.seq_id)] == r.n_docs
            assert toks[(r.stream, r.seq_id)] == r.n_tokens
        # every sequence except possibly each stream's last is exactly full
        for s in got.stream.unique():
            sub = got[got.stream == s].sort_values("seq_id")
            assert (sub.n_tokens.iloc[:-1] == 50).all()


def test_tokenize_chunking_invariance(monkeypatch):
    """Sub-chunked processing (SERX_TOK_CHUNK, the round-4 allocator-
    pressure fix) must emit exactly the same (term, doc_id, tf, doc_len,
    part) multiset as whole-batch processing — chunking is an execution
    detail, never a semantic one."""
    texts = [f"w{i % 7} w{i % 3} shared tail w{i}" for i in range(64)]
    batch = pa.table({
        "doc_id": pa.array(list(range(100, 164)), type=pa.int64()),
        "text": pa.array(texts),
        "url": pa.array([f"u{i}" for i in range(64)]),
    })

    def run(chunk: str, dict_terms: bool) -> list[tuple]:
        monkeypatch.setenv("SERX_TOK_CHUNK", chunk)
        stage = TokenizePostings(n_buckets=4, n_doc_shards=2)
        stage.emit_doc_rows = True
        stage.keep_cols = ("url",)
        stage.dict_terms = dict_terms
        out = stage(batch)
        tbl = out.set_column(
            out.column_names.index("term"), "term",
            out["term"].cast(pa.string()))
        return sorted(
            ((r["term"] or "", r["doc_id"], r["tf"], r["doc_len"],
              r["part"], r["url"]) for r in tbl.to_pylist()))

    whole = run("0", False)
    assert run("5", False) == whole          # tiny chunks, string terms
    assert run("5", True) == whole           # per-chunk dictionaries
    assert run("1000000", True) == whole     # chunk > batch → one slice
