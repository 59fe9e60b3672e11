"""Positional postings + phrase queries: engine vs brute-force oracle."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from search_engine_ray.functions.analyze import tokenize
from search_engine_ray.pipelines.query import QueryEngine, bm25_idf, top_k
from search_engine_ray.state.checkpoint import IndexConfig

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"


def brute_phrase(tokens_by_doc: dict[int, list[str]], phrase: list[str]
                 ) -> dict[int, int]:
    """doc_id → number of phrase start positions (overlaps count)."""
    n = len(phrase)
    out = {}
    for d, toks in tokens_by_doc.items():
        c = sum(1 for i in range(len(toks) - n + 1)
                if toks[i:i + n] == phrase)
        if c:
            out[d] = c
    return out


@pytest.fixture(scope="module")
def pos_index(ray_session, tmp_path_factory):
    from search_engine_ray.pipelines.build import build_index
    idx = str(tmp_path_factory.mktemp("posidx") / "idx")
    build_index(SF_DOCS, idx,
                IndexConfig(n_buckets=8, n_doc_shards=4, positions=True))
    return idx


@pytest.fixture(scope="module")
def corpus_tokens():
    t = pq.read_table(SF_DOCS, columns=["doc_id", "text"])
    return {i: tokenize(x or "") for i, x in
            zip(t["doc_id"].to_pylist(), t["text"].to_pylist())}


@pytest.mark.parametrize("phrase", ["scan merge", "window order sort",
                                    "the the", "value value value",
                                    "scan scan", "fast key"])
def test_phrase_matches_bruteforce(pos_index, corpus_tokens, phrase):
    qe = QueryEngine(pos_index, num_searchers=3, use_actors=False)
    terms = tokenize(phrase)
    want_tf = brute_phrase(corpus_tokens, terms)

    # per-doc phrase tf straight from the searchers
    got_tf = {}
    for s in qe.searchers:
        local, ptf = s._phrase_cached(terms)
        for d, c in zip(s._docs[local], ptf):
            got_tf[int(d)] = int(c)
    assert got_tf == want_tf, phrase

    # full top-k ranking vs brute-force BM25 on phrase tf
    res = qe.phrase_query(phrase, k=10)
    if not want_tf:
        assert res == []
        return
    import json
    with open(os.path.join(pos_index, "docstats.json")) as f:
        st = json.load(f)
    n_docs, avgdl = st["n_docs"], st["avgdl"]
    dl = {d: len(t) for d, t in corpus_tokens.items()}
    idf = bm25_idf(n_docs, len(want_tf))
    ids = np.array(sorted(want_tf), dtype=np.int64)
    tf = np.array([want_tf[d] for d in ids], dtype=np.float64)
    dlv = np.array([dl[d] for d in ids], dtype=np.float64)
    sc = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dlv / avgdl))
    wids, wsc = top_k(ids, sc, 10)
    assert [d for d, _ in res] == list(wids)
    np.testing.assert_allclose([s for _, s in res], wsc, rtol=1e-12)


def test_phrase_empty_and_missing(pos_index):
    qe = QueryEngine(pos_index, num_searchers=2, use_actors=False)
    assert qe.phrase_query("") == []
    assert qe.phrase_query("zzzqqq nohit") == []
    assert qe.phrase_query("¿ñ!") == []


def test_single_term_phrase_equals_term_query(pos_index):
    qe = QueryEngine(pos_index, num_searchers=2, use_actors=False)
    a = qe.phrase_query("scan", k=10)
    b = qe.query("scan", k=10)
    assert [d for d, _ in a] == [d for d, _ in b]
    np.testing.assert_allclose([s for _, s in a], [s for _, s in b],
                               rtol=1e-12)


def test_bm25_unaffected_by_positions(pos_index, ray_session, tmp_path):
    """A positional index must serve ordinary BM25 queries identically to a
    non-positional build of the same corpus."""
    from search_engine_ray.pipelines.build import build_index
    plain = str(tmp_path / "plain")
    build_index(SF_DOCS, plain, IndexConfig(n_buckets=8, n_doc_shards=4))
    qa = QueryEngine(pos_index, num_searchers=2, use_actors=False)
    qb = QueryEngine(plain, num_searchers=2, use_actors=False)
    for q in ["scan merge window fast", "the key line"]:
        ra, rb = qa.query(q, k=10), qb.query(q, k=10)
        assert [d for d, _ in ra] == [d for d, _ in rb]
        np.testing.assert_allclose([s for _, s in ra], [s for _, s in rb],
                                   rtol=1e-12)


def test_merge_preserves_positions(ray_session, tmp_path, corpus_tokens):
    """Two positional half-corpus indexes merged → same phrase results as
    the full positional build."""
    import pyarrow as pa
    import ray.data
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.merge import merge_indexes
    t = pq.read_table(SF_DOCS, columns=["doc_id", "text"])
    half = t.num_rows // 2
    p1, p2 = str(tmp_path / "h1.parquet"), str(tmp_path / "h2.parquet")
    pq.write_table(t.slice(0, half), p1)
    pq.write_table(t.slice(half), p2)
    cfg = IndexConfig(n_buckets=4, n_doc_shards=2, positions=True)
    i1, i2, im = (str(tmp_path / d) for d in ("i1", "i2", "im"))
    build_index(p1, i1, cfg)
    build_index(p2, i2, cfg)
    merge_indexes([i1, i2], im)
    qe = QueryEngine(im, num_searchers=2, use_actors=False)
    terms = tokenize("scan merge")
    want = brute_phrase(corpus_tokens, terms)
    got = {}
    for s in qe.searchers:
        local, ptf = s._phrase_cached(terms)
        for d, c in zip(s._docs[local], ptf):
            got[int(d)] = int(c)
    assert got == want
