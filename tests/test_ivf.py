"""IVF ANN: build/search roundtrip + recall vs brute force."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.stages.ivf import IVFIndex, train_centroids


def test_train_centroids_deterministic():
    rng = np.random.RandomState(0)
    x = rng.standard_normal((500, 16))
    c1 = train_centroids(x, 8)
    c2 = train_centroids(x, 8)
    assert np.array_equal(c1, c2)
    norms = np.linalg.norm(c1, axis=1)
    assert np.allclose(norms, 1.0)


@pytest.fixture(scope="module")
def ivf_index(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq
    root = tmp_path_factory.mktemp("ivf")
    rng = np.random.RandomState(1)
    # clustered vectors so cells are meaningful
    centers = rng.standard_normal((8, 32)) * 3
    vecs = np.concatenate([centers[i % 8] + rng.standard_normal(32) * 0.5
                           for i in range(800)]).reshape(800, 32)
    src = str(root / "emb.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(range(800), type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs]),
    }), src)
    idx = IVFIndex.build(src, str(root / "idx"), n_cells=8)
    return idx, vecs


def test_ivf_high_nprobe_equals_bruteforce(ivf_index):
    idx, vecs = ivf_index
    q = vecs[:3]
    res = idx.search(q, k=5, nprobe=8)  # probe ALL cells → exact
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    for qi in range(3):
        sims = vn @ qn[qi]
        want = np.lexsort((np.arange(800), -sims))[:5].tolist()
        got = res.filter(pa.compute.equal(res["query_idx"], qi))
        assert got["vec_id"].to_pylist() == want
        assert got["vec_id"].to_pylist()[0] == qi  # self nearest


def test_ivf_low_nprobe_good_recall(ivf_index):
    idx, vecs = ivf_index
    q = vecs[:20]
    res = idx.search(q, k=5, nprobe=2)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    hits = total = 0
    for qi in range(20):
        sims = vn @ qn[qi]
        want = set(np.lexsort((np.arange(800), -sims))[:5].tolist())
        got = set(res.filter(pa.compute.equal(res["query_idx"], qi))
                  ["vec_id"].to_pylist())
        hits += len(want & got)
        total += 5
    assert hits / total >= 0.8  # clustered data: 2 probes recall most


def test_sample_vectors_unbiased_across_row_groups(tmp_path):
    """A file CLUSTERED by value (sorted) must yield a whole-range sample,
    not the head — the round-2 head-sample bias."""
    import pyarrow.parquet as pq
    from search_engine_ray.stages.ivf import sample_vectors
    n = 10_000
    vals = np.arange(n, dtype=np.float64)          # sorted → head is biased
    src = str(tmp_path / "clustered.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.array([[v] for v in vals]),
    }), src, row_group_size=1000)
    s = sample_vectors(src, "embedding", 256).reshape(-1)
    assert s.size == 256
    assert s.max() > n * 0.8 and s.min() < n * 0.2   # spans the file
    s2 = sample_vectors(src, "embedding", 256).reshape(-1)
    assert np.array_equal(s, s2)                     # seeded → deterministic
    small = sample_vectors(src, "embedding", n + 5)
    assert small.shape[0] == n                       # sample >= total: all


def test_cell_searcher_actor_cap_enforced(ivf_index):
    """Loading more resident vectors than max_actor_floats must raise with
    the sizing remedy, not OOM mid-load (VERDICT round-3 item: the
    cell-fit assumption was prose, not code)."""
    from search_engine_ray.stages.ivf import CellSearcher
    idx, _ = ivf_index
    with pytest.raises(ValueError, match="n_searchers"):
        CellSearcher(idx.index_dir, shard=0, n_searchers=1,
                     max_actor_floats=100)   # 800×32 floats ≫ 100
    # generous cap: loads fine
    s = CellSearcher(idx.index_dir, shard=0, n_searchers=1,
                     max_actor_floats=1 << 30)
    assert sum(v.size for _, v in s.cells.values()) == 800 * 32


def test_sample_vectors_directory_source(tmp_path):
    # IVFIndex.build accepts parquet DIRECTORIES for the assign phase; the
    # centroid sampler used to crash on them (pq.ParquetFile is file-only)
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from search_engine_ray.stages.ivf import sample_vectors
    rng = np.random.RandomState(0)
    d = tmp_path / "emb"
    d.mkdir()
    sizes = [60, 40, 10]
    for i, n in enumerate(sizes):
        vecs = rng.randn(n, 4)
        pq.write_table(pa.table({
            "vec_id": pa.array(np.arange(n) + i * 1000, type=pa.int64()),
            "embedding": pa.array(vecs.tolist()),
        }), str(d / f"part-{i}.parquet"))
    s = sample_vectors(str(d), "embedding", 32, seed=7)
    assert s.shape[1] == 4
    assert 30 <= s.shape[0] <= 40      # proportional split, >=1 per file
    # determinism
    s2 = sample_vectors(str(d), "embedding", 32, seed=7)
    np.testing.assert_array_equal(s, s2)
