"""North-rule analyzer extensions end-to-end: stopword filtering + Porter
stemming flow through build, docstats, and query identically to the oracle
(the reference's stop-word hook is dead code in practice — SURVEY §2.2 M6 —
here it is a real, exercised stage)."""

import os

import pyarrow.parquet as pq
import pytest

from search_engine_ray.pipelines.oracle import build_oracle
from search_engine_ray.state.checkpoint import IndexConfig


@pytest.fixture(scope="module")
def stemmed_index(ray_session, sf_small, tmp_path_factory):
    from search_engine_ray.pipelines.build import build_index
    idx = str(tmp_path_factory.mktemp("stem") / "idx")
    build_index(os.path.join(sf_small, "documents.parquet"), idx,
                IndexConfig(n_buckets=4, n_doc_shards=2,
                            stopwords=True, stem=True))
    return idx


def test_stopworded_stemmed_build_matches_oracle(stemmed_index, sf_small,
                                                 ray_session):
    from search_engine_ray.pipelines.query import QueryEngine, SegmentSearcher
    t = pq.read_table(os.path.join(sf_small, "documents.parquet"),
                      columns=["doc_id", "text"])
    orc = build_oracle(list(zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist())),
                       stopwords=True, stem=True)
    s = SegmentSearcher(stemmed_index, [0, 1])
    assert s.vocabulary("text") == set(orc.postings)
    # stopwords are gone from the index
    assert "the" not in s.vocabulary("text")
    qe = QueryEngine(stemmed_index, num_searchers=2, use_actors=False)
    # query-side analysis applies the same stopword+stem config (from the
    # manifest), so surface forms match stemmed index terms
    for q in ["merged tables", "the scanning windows", "sorted"]:
        got = qe.query(q, k=10)
        want = orc.bm25(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9)
