"""Connected components (label propagation) vs a union-find reference."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.stages.graph import connected_components


def _union_find(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _pairs_table(pairs):
    return pa.table({"doc_a": pa.array([a for a, _ in pairs], pa.int64()),
                     "doc_b": pa.array([b for _, b in pairs], pa.int64())})


def test_cc_empty():
    out = connected_components(_pairs_table([]))
    assert out.num_rows == 0


def test_cc_chain_and_clique(ray_session):
    # chain 1-2-3-4 (diameter 3) + clique {10,11,12} + isolated pair
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)]
    out = connected_components(_pairs_table(pairs))
    got = dict(zip(out["node"].to_pylist(), out["component"].to_pylist()))
    assert got == _union_find(pairs)
    assert got[4] == 1 and got[12] == 10 and got[21] == 20


def test_cc_random_matches_union_find(ray_session):
    rng = np.random.RandomState(9)
    pairs = [(int(a), int(b)) for a, b in
             rng.randint(0, 60, size=(80, 2)) if a != b]
    out = connected_components(_pairs_table(pairs))
    got = dict(zip(out["node"].to_pylist(), out["component"].to_pylist()))
    assert got == _union_find(pairs)


def test_cc_iteration_cap(ray_session):
    # a 12-node path needs ~11 rounds of pure propagation; cap at 2 → raise
    pairs = [(i, i + 1) for i in range(12)]
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(_pairs_table(pairs), max_iters=2)


def test_minhash_dedup_keep_collapses_clusters(ray_session):
    """Every near-dup cluster keeps exactly its min docID; non-pair docs
    all survive."""
    from search_engine_ray.pipelines.queries import (
        q_minhash_dedup_keep, q_minhash_neardup)
    sf = "/root/testdata/sf0.001"
    pairs = q_minhash_neardup(sf)
    comp = _union_find(list(zip(pairs["doc_a"].to_pylist(),
                                pairs["doc_b"].to_pylist())))
    non_keepers = {n for n, c in comp.items() if n != c}
    kept = q_minhash_dedup_keep(sf).to_pandas()
    import pyarrow.parquet as pq
    all_ids = set(pq.read_table(sf + "/documents.parquet",
                                columns=["doc_id"])["doc_id"].to_pylist())
    assert set(kept["doc_id"]) == all_ids - non_keepers
    assert kept["doc_id"].is_monotonic_increasing
