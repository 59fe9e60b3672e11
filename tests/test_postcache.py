"""Decoded-postings cache: hit/miss identity, invalidation, GC."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def small_corpus(tmp_path):
    rng = np.random.default_rng(11)
    words = [f"w{i:03d}" for i in range(40)]
    texts = [" ".join(rng.choice(words, size=30)) for _ in range(120)]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(120), type=pa.int64()),
        "text": pa.array(texts)}), src)
    return src, texts


def _build(src, idx):
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.state.checkpoint import IndexConfig
    build_index(src, idx, IndexConfig(n_buckets=4, n_doc_shards=2))


def test_cache_roundtrip_and_invalidation(ray_session, tmp_path, small_corpus):
    from search_engine_ray.pipelines.query import SegmentSearcher
    src, texts = small_corpus
    idx = str(tmp_path / "idx")
    _build(src, idx)

    s1 = SegmentSearcher(idx, [0, 1])          # miss → decode + write
    files1 = sorted(glob.glob(os.path.join(idx, "_postcache", "*.npy")))
    assert len(files1) == 3
    r1 = s1.search(["w001", "w002", "w003"], k=10)

    s2 = SegmentSearcher(idx, [0, 1])          # hit → mmap
    assert isinstance(s2._post_local, np.memmap)
    r2 = s2.search(["w001", "w002", "w003"], k=10)
    assert np.array_equal(r1[0], r2[0])
    assert np.allclose(r1[1], r2[1])

    # different shard subset → separate cache entry, same build prefix
    SegmentSearcher(idx, [0])
    files2 = sorted(glob.glob(os.path.join(idx, "_postcache", "*.npy")))
    assert len(files2) == 6
    prefixes = {os.path.basename(f).split("-")[0] for f in files2}
    assert len(prefixes) == 1

    # manifest rewrite in place (what a rebuild/merge does) → stale caches
    # are invalidated AND garbage-collected by the next writer
    man = os.path.join(idx, "manifest.json")
    with open(man) as f:
        body = f.read()
    with open(man, "w") as f:
        f.write(body + "\n")
    s3 = SegmentSearcher(idx, [0, 1])
    assert not isinstance(s3._post_local, np.memmap)   # stale → re-decoded
    r3 = s3.search(["w001", "w002", "w003"], k=10)
    assert np.array_equal(r1[0], r3[0])
    files3 = sorted(glob.glob(os.path.join(idx, "_postcache", "*.npy")))
    assert len(files3) == 3                            # old 6 GC'd, 3 new
    assert not set(files3) & set(files2)
