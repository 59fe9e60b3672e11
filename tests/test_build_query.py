"""End-to-end: distributed build + BM25 query ≡ single-process oracle,
plus checkpoint/resume semantics (SURVEY.md §5 items 2 and 5)."""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from search_engine_ray.pipelines.oracle import build_oracle
from search_engine_ray.state import checkpoint as ckpt
from search_engine_ray.state.checkpoint import IndexConfig

QUERIES = ["table row merge", "spark", "window agg sort", "customer filter",
           "dup", "the a big", "nosuchterm", "hash hash join",
           "it's O'Brien", "naïve café table"]


@pytest.fixture(scope="module")
def built_index(ray_session, sf_small, tmp_path_factory):
    from search_engine_ray.pipelines.build import build_index
    idx = str(tmp_path_factory.mktemp("idx") / "sf_small")
    man = build_index(os.path.join(sf_small, "documents.parquet"), idx,
                      IndexConfig(n_buckets=8), keep_cols=("lang",))
    return idx, man


@pytest.fixture(scope="module")
def oracle(sf_small):
    t = pq.read_table(os.path.join(sf_small, "documents.parquet"),
                      columns=["doc_id", "text"])
    return build_oracle(list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist())))


def test_manifest_complete(built_index):
    idx, man = built_index
    assert len(man["buckets"]) == 8
    assert all(os.path.exists(os.path.join(ckpt.bucket_dir(idx, b), "_DONE"))
               for b in range(8))


def test_docstats_match_oracle(built_index, oracle):
    idx, _ = built_index
    stats = ckpt.read_docstats(idx)
    assert stats["n_docs"] == oracle.n_docs
    assert stats["avgdl"] == pytest.approx(oracle.avgdl)


def test_df_match_oracle(built_index, oracle):
    from search_engine_ray.pipelines.query import SegmentSearcher
    idx, _ = built_index
    s = SegmentSearcher(idx, list(range(8)))
    assert set(s.terms) == set(oracle.postings)
    for term in oracle.postings:
        assert s.df_of([term])[term] == oracle.df(term)


@pytest.mark.parametrize("use_actors", [False, True])
def test_bm25_rank_and_score_identical(built_index, oracle, use_actors,
                                       ray_session):
    from search_engine_ray.pipelines.query import QueryEngine
    idx, _ = built_index
    qe = QueryEngine(idx, num_searchers=3, use_actors=use_actors)
    for q in QUERIES:
        got = qe.query(q, k=10)
        want = oracle.bm25(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9), q


def test_resume_skips_finished_buckets(ray_session, sf_small, tmp_path):
    from search_engine_ray.pipelines.build import build_index
    idx = str(tmp_path / "resume")
    src = os.path.join(sf_small, "documents.parquet")
    build_index(src, idx, IndexConfig(n_buckets=8))

    # wreck half the buckets: delete markers + files
    for b in range(4):
        shutil.rmtree(ckpt.bucket_dir(idx, b))
    mtimes = {b: os.path.getmtime(os.path.join(ckpt.bucket_dir(idx, b),
                                               "postings.parquet"))
              for b in range(4, 8)}
    assert ckpt.pending_buckets(idx, 8) == [0, 1, 2, 3]

    man = build_index(src, idx, IndexConfig(n_buckets=8))
    assert len(man["buckets"]) == 8
    # finished partitions were NOT recomputed
    for b in range(4, 8):
        assert os.path.getmtime(os.path.join(ckpt.bucket_dir(idx, b),
                                             "postings.parquet")) == mtimes[b]

    # and the resumed index equals a fresh build
    idx2 = str(tmp_path / "fresh")
    build_index(src, idx2, IndexConfig(n_buckets=8))
    for b in range(8):
        t1 = pq.read_table(os.path.join(ckpt.bucket_dir(idx, b), "postings.parquet"))
        t2 = pq.read_table(os.path.join(ckpt.bucket_dir(idx2, b), "postings.parquet"))
        assert t1.equals(t2)
