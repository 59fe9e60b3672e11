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


def _dense_pagerank(edges, nodes, iters=5, d=0.85):
    """Reference dense power iteration with the same formula grouping."""
    import numpy as np
    n = len(nodes)
    pos = {v: i for i, v in enumerate(nodes)}
    outw = np.zeros(n)
    for s, t, w in edges:
        outw[pos[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        inflow = np.zeros(n)
        for s, t, w in edges:
            inflow[pos[t]] += r[pos[s]] * w / outw[pos[s]]
        dang = r[outw == 0].sum()
        r = (1 - d) / n + d * (inflow + dang / n)
    return r


def test_pagerank_matches_dense_power_iteration(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from search_engine_ray.stages.graph import pagerank
    rng = np.random.RandomState(7)
    n_nodes = 30
    m = 200
    src = rng.randint(0, n_nodes, m)
    dst = rng.randint(0, n_nodes, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.randint(1, 5, len(src)).astype(float)
    # node 29 is dangling: strip its outgoing edges
    mask = src != 29
    src, dst, w = src[mask], dst[mask], w[mask]
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(src, type=pa.int64()),
        "dst": pa.array(dst, type=pa.int64()),
        "w": pa.array(w)})).repartition(4)
    got = pagerank(ds, weight="w", iters=5)
    nodes = got["node"].to_pylist()
    want = _dense_pagerank(list(zip(src, dst, w)), nodes, iters=5)
    np.testing.assert_allclose(got["rank"].to_numpy(), want, rtol=0, atol=1e-13)
    assert abs(got["rank"].to_numpy().sum() - 1.0) < 1e-9  # mass conserved


def test_pagerank_unweighted_string_nodes_and_empty(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from search_engine_ray.stages.graph import pagerank
    ds = ray.data.from_arrow(pa.table({
        "src": ["a.x", "a.x", "b.x", "c.x"],
        "dst": ["b.x", "c.x", "c.x", "a.x"]}))
    got = pagerank(ds, iters=10)
    want = _dense_pagerank([("a.x", "b.x", 1), ("a.x", "c.x", 1),
                            ("b.x", "c.x", 1), ("c.x", "a.x", 1)],
                           got["node"].to_pylist(), iters=10)
    np.testing.assert_allclose(got["rank"].to_numpy(), want, atol=1e-13)
    # c has two in-edges and feeds a: c outranks b
    ranks = dict(zip(got["node"].to_pylist(), got["rank"].to_pylist()))
    assert ranks["c.x"] > ranks["b.x"]
    empty = pagerank(ray.data.from_arrow(pa.table(
        {"src": pa.array([], type=pa.string()),
         "dst": pa.array([], type=pa.string())})))
    assert empty.num_rows == 0
