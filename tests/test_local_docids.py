"""Local-docID segment format + shard-partitioned docstore (round 3).

Replaces the round-2 decoded-postings cache tests: local-space segments
make the searcher's load decode a cumsum + gather, so the cache machinery
was deleted.  These tests pin the format invariants instead:

- new builds write ``docstore/shard=K/`` partitions and LOCAL-space
  segments (schema metadata ``docid_space=local``);
- local segments round-trip through ``decode_segment_to_rows`` to the same
  global docIDs as a global-space encode;
- search results are identical between a local-format index and a
  force-global encode of the same corpus;
- legacy (flat docstore + global segments) indexes still load.
"""

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


def _build(src, idx, exchange="fs"):
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.state.checkpoint import IndexConfig
    build_index(src, idx, IndexConfig(n_buckets=4, n_doc_shards=2),
                exchange=exchange)


@pytest.mark.parametrize("exchange", ["fs", "groupby"])
def test_build_writes_local_format(ray_session, tmp_path, small_corpus,
                                   exchange):
    from search_engine_ray.stages.postings import (decode_segment_streams,
                                                   segment_docid_space)
    src, _texts = small_corpus
    idx = str(tmp_path / f"idx_{exchange}")
    _build(src, idx, exchange=exchange)
    # docstore is shard-partitioned, covering every doc exactly once
    shard_dirs = sorted(glob.glob(os.path.join(idx, "docstore", "shard=*")))
    assert len(shard_dirs) == 2
    ids = pq.read_table(os.path.join(idx, "docstore"),
                        columns=["doc_id"])["doc_id"].to_pylist()
    assert sorted(ids) == list(range(120))
    for s, sdir in enumerate(shard_dirs):
        sids = pq.read_table(sdir, columns=["doc_id"])["doc_id"].to_pylist()
        assert all(i % 2 == s for i in sids)
    # every segment is local-space with in-range local ids
    for path in glob.glob(os.path.join(idx, "segments", "shard=*",
                                       "bucket=*", "postings.parquet")):
        seg = pq.read_table(path)
        assert segment_docid_space(seg) == "local"
        if seg.num_rows:
            doc_vals, _tfs, _off = decode_segment_streams(seg)
            assert doc_vals.min() >= 0 and doc_vals.max() < 60


def test_local_roundtrip_matches_global(small_corpus, tmp_path):
    from search_engine_ray.stages.postings import (decode_segment_to_rows,
                                                   encode_postings_table,
                                                   segment_docid_space)
    rng = np.random.default_rng(3)
    doc_dict = np.unique(rng.integers(0, 2**62, size=50).astype(np.int64))
    rows = pa.table({
        "term": pa.array(np.repeat(["alpha", "beta", "gamma"], 20)),
        "doc_id": pa.array(rng.choice(doc_dict, size=60), type=pa.int64()),
        "tf": pa.array(rng.integers(1, 9, size=60).astype(np.int32)),
    })
    glob_seg = encode_postings_table(rows)
    loc_seg = encode_postings_table(rows, doc_dict)
    assert segment_docid_space(glob_seg) == "global"
    assert segment_docid_space(loc_seg) == "local"
    # local segments are never larger (dense small deltas vs 62-bit hashes)
    assert (len(b"".join(loc_seg["doc_ids"].to_pylist()))
            < len(b"".join(glob_seg["doc_ids"].to_pylist())))
    back_g = decode_segment_to_rows(glob_seg)
    back_l = decode_segment_to_rows(loc_seg, doc_dict)
    assert back_g.equals(back_l)
    with pytest.raises(ValueError):
        decode_segment_to_rows(loc_seg)        # dict required for local
    with pytest.raises(ValueError):
        # posting docID absent from the dictionary → explicit error
        encode_postings_table(rows, doc_dict[:-5][doc_dict[:-5] !=
                                                  rows["doc_id"][0].as_py()])


def test_search_identical_to_legacy_global(ray_session, tmp_path,
                                           small_corpus):
    """A legacy index (flat docstore + global segments, simulated by
    rewriting a local index) returns identical results."""
    from search_engine_ray.pipelines.query import SegmentSearcher
    from search_engine_ray.stages.postings import (decode_segment_to_rows,
                                                   encode_postings_table,
                                                   load_shard_dict)
    src, _texts = small_corpus
    idx = str(tmp_path / "idx")
    _build(src, idx)
    legacy = str(tmp_path / "legacy")
    import shutil
    shutil.copytree(idx, legacy)
    # flatten docstore + re-encode segments in global space
    store = pq.read_table(os.path.join(legacy, "docstore"))
    if "shard" in store.column_names:
        store = store.drop_columns(["shard"])
    shutil.rmtree(os.path.join(legacy, "docstore"))
    os.makedirs(os.path.join(legacy, "docstore"))
    pq.write_table(store, os.path.join(legacy, "docstore", "flat.parquet"))
    for path in glob.glob(os.path.join(legacy, "segments", "shard=*",
                                       "bucket=*", "postings.parquet")):
        shard = int(path.split("shard=")[1][:3])
        ddict = load_shard_dict(os.path.join(idx, "docstore"), shard)
        rows = decode_segment_to_rows(pq.read_table(path), ddict)
        pq.write_table(encode_postings_table(rows), path)

    s_new = SegmentSearcher(idx, [0, 1])
    s_old = SegmentSearcher(legacy, [0, 1])
    for terms in (["w001"], ["w001", "w002", "w003"], ["w010", "w039"]):
        a, b = s_new.search(terms, k=10), s_old.search(terms, k=10)
        assert np.array_equal(a[0], b[0])
        assert np.allclose(a[1], b[1])
        ap, bp = (s_new.search_pruned(terms, k=10),
                  s_old.search_pruned(terms, k=10))
        assert np.array_equal(ap[0], a[0]) and np.array_equal(bp[0], a[0])
