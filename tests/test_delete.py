"""Tombstone deletes + compaction: searchable-deletes semantics."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from search_engine_ray.pipelines.maintenance import (compact_index,
                                                     delete_docs,
                                                     load_tombstones)
from search_engine_ray.pipelines.query import QueryEngine
from search_engine_ray.state.checkpoint import IndexConfig

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"
QUERY = "scan merge window fast"
DEAD = list(range(0, 500, 7))   # 72 docs across all shards


@pytest.fixture(scope="module")
def deleted_index(ray_session, tmp_path_factory):
    from search_engine_ray.pipelines.build import build_index
    idx = str(tmp_path_factory.mktemp("del") / "idx")
    build_index(SF_DOCS, idx, IndexConfig(n_buckets=8, n_doc_shards=4))
    assert delete_docs(idx, DEAD) == len(DEAD)
    return idx


def test_deletes_visible_with_predelete_stats(deleted_index):
    """After delete_docs: dead docs vanish from results, but scores of the
    survivors still use PRE-delete statistics (df, avgdl, N) — i.e. the
    ranking equals the undeleted engine's ranking minus the dead docs."""
    qe = QueryEngine(deleted_index, num_searchers=3, use_actors=False)
    res = qe.query(QUERY, k=500)
    got_ids = {d for d, _ in res}
    assert got_ids.isdisjoint(DEAD)

    # un-deleted twin: same query, drop dead, take same k — must be equal
    # (scores included) because stats are untouched by tombstones
    from search_engine_ray.pipelines.build import build_index
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        build_index(SF_DOCS, f"{d}/idx",
                    IndexConfig(n_buckets=8, n_doc_shards=4))
        qe0 = QueryEngine(f"{d}/idx", num_searchers=3, use_actors=False)
        want = [(i, s) for i, s in qe0.query(QUERY, k=500)
                if i not in set(DEAD)]
    assert [d for d, _ in res] == [d for d, _ in want]
    np.testing.assert_allclose([s for _, s in res], [s for _, s in want],
                               rtol=1e-12)


def test_deletes_apply_to_pruned_phrase_and_facets(ray_session,
                                                   tmp_path_factory):
    from search_engine_ray.pipelines.build import build_index
    idx = str(tmp_path_factory.mktemp("delpos") / "idx")
    build_index(SF_DOCS, idx,
                IndexConfig(n_buckets=8, n_doc_shards=4, positions=True))
    qe0 = QueryEngine(idx, num_searchers=2, use_actors=False)
    full = qe0.phrase_query("scan merge", k=500)
    assert full, "phrase must match something for this test to bite"
    dead = [full[0][0]]
    delete_docs(idx, dead)
    qe = QueryEngine(idx, num_searchers=2, use_actors=False)
    assert dead[0] not in [d for d, _ in qe.phrase_query("scan merge", k=500)]
    assert dead[0] not in [d for d, _ in qe.query(QUERY, k=500, prune=True)]


def test_compaction_equals_fresh_build(deleted_index, ray_session, tmp_path):
    """compact → BM25 results (ranks AND scores) identical to an index
    built from scratch over only the surviving documents."""
    out = str(tmp_path / "compacted")
    man = compact_index(deleted_index, out)
    assert all(p.get("n_terms") is not None for p in man["partitions"])

    t = pq.read_table(SF_DOCS)
    alive = t.filter(~np.isin(t["doc_id"].to_numpy(zero_copy_only=False),
                              DEAD))
    src = str(tmp_path / "alive.parquet")
    pq.write_table(alive, src)
    from search_engine_ray.pipelines.build import build_index
    fresh = str(tmp_path / "fresh")
    build_index(src, fresh, IndexConfig(n_buckets=8, n_doc_shards=4))

    qa = QueryEngine(out, num_searchers=3, use_actors=False)
    qb = QueryEngine(fresh, num_searchers=3, use_actors=False)
    for q in [QUERY, "the key line", "scan"]:
        ra, rb = qa.query(q, k=50), qb.query(q, k=50)
        assert [d for d, _ in ra] == [d for d, _ in rb]
        np.testing.assert_allclose([s for _, s in ra], [s for _, s in rb],
                                   rtol=1e-12)
    # compacted index carries no tombstones and smaller docstats
    assert load_tombstones(out, 0).size == 0
    import json, os
    with open(os.path.join(out, "docstats.json")) as f:
        st = json.load(f)
    assert st["n_docs"] == 500 - len(DEAD)
