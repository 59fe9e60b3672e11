"""Wildcard / prefix BM25: term-dictionary range scan + OR-union scoring,
vs the in-process oracle, plus expansion edge cases."""

import shutil

import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def engine(ray_session, tmp_path_factory):
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.query import QueryEngine
    from search_engine_ray.state.checkpoint import IndexConfig
    idx = str(tmp_path_factory.mktemp("prefix") / "idx")
    build_index(SRC, idx, IndexConfig(n_buckets=8))
    yield QueryEngine(idx, num_searchers=2, use_actors=False)


@pytest.fixture(scope="module")
def oracle():
    from search_engine_ray.pipelines.oracle import build_oracle
    t = pq.read_table(SRC, columns=["doc_id", "text"])
    return build_oracle(list(zip(t["doc_id"].to_pylist(),
                                 t["text"].to_pylist())))


@pytest.mark.parametrize("q", [
    "s* window",            # multi-match prefix + exact term
    "sc*",                  # single prefix
    "s* so*",               # overlapping expansions (dedup in the union)
    "scan* merge",          # prefix that equals a full term
    "zzz* merge",           # prefix matching nothing → exact part only
    "zzz*",                 # nothing at all
])
def test_prefix_query_matches_oracle(engine, oracle, q):
    got = engine.prefix_query(q, k=10)
    want = oracle.bm25_prefix(q, k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    assert all(abs(a[1] - b[1]) < 1e-9 for a, b in zip(got, want))


def test_prefix_equals_exact_when_unique(engine, oracle):
    """A prefix matching exactly one term scores identically to the exact
    query for that term."""
    terms = sorted(oracle.postings)
    # find a term that is the unique expansion of its first 4 chars
    pick = next(t for t in terms if len(t) >= 4 and sum(
        1 for u in terms if u.startswith(t[:4])) == 1)
    got = engine.prefix_query(pick[:4] + "*", k=10)
    exact = engine.query(pick, k=10)
    assert got == exact


def test_expand_prefix_limit_and_edges(engine):
    s = engine.searchers[0]
    full = s.expand_prefix("s")
    assert full == sorted(full)
    assert all(t.startswith("s") for t in full)
    assert s.expand_prefix("s", limit=2) == full[:2]
    assert s.expand_prefix("") == []
    assert s.expand_prefix("zzzz") == []


def test_prefix_query_empty_inputs(engine):
    assert engine.prefix_query("", k=10) == []
    assert engine.prefix_query("*", k=10) == []          # bare star ignored
    assert engine.prefix_query("!!!* ...", k=10) == []   # normalizes away


class TestFuzzy:
    def test_edit_distance_le1_semantics(self):
        from search_engine_ray.pipelines.query import edit_distance_le1 as d
        assert d("window", "window")
        assert d("window", "windoq")       # one substitution
        assert d("window", "windo")        # one deletion
        assert d("windo", "window")        # one insertion
        assert not d("window", "widnow")   # transposition = distance 2
        assert not d("window", "wind")     # two deletions
        assert not d("ab", "ba")
        assert d("a", "")
        assert not d("abc", "a")

    def test_expand_matches_bruteforce_levenshtein(self, engine):
        from search_engine_ray.pipelines.query import edit_distance_le1
        s = engine.searchers[0]
        vocab = sorted(s.vocabulary("text"))
        for probe in ["windoq", "scan", "xyz", "mergee", vocab[0]]:
            want = sorted(t for t in vocab if edit_distance_le1(probe, t))
            assert s.expand_fuzzy(probe) == want, probe

    def test_fuzzy_query_equals_expanded_or_union(self, engine):
        import numpy as np
        from search_engine_ray.pipelines.query import (edit_distance_le1,
                                                       top_k)
        got = engine.fuzzy_query("windoq~ merge", k=10)
        # brute force: per searcher, expand over ITS vocabulary (matches
        # the local-expansion semantics), exact-search, then global merge
        partials = []
        for s in engine.searchers:
            vocab = s.vocabulary("text")
            terms = sorted({t for t in vocab
                            if edit_distance_le1("windoq", t)}
                           | ({"merge"} & vocab))
            partials.append(s.search(terms, 10) if terms else
                            (np.zeros(0, dtype=np.int64),
                             np.zeros(0, dtype=np.float64)))
        ids = np.concatenate([p[0] for p in partials])
        sc = np.concatenate([p[1] for p in partials])
        wid, wsc = top_k(ids, sc, 10)
        assert [d for d, _ in got] == list(wid)
        assert np.allclose([s for _, s in got], wsc)
