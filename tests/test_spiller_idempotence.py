"""Task-retry idempotence of the filesystem-exchange map side.

On a real cluster Ray RETRIES failed map tasks; the fs exchange writes
side-effect fragment files, so a replayed task must overwrite — never
duplicate — its first attempt's output (`FragmentSpiller` derives fragment
names from a content hash of the batch's docID column and publishes via
atomic tmp+rename; stages/postings.py).  These tests pin that contract for
both the transient posting fragments and the PUBLISHED docstore shards:
a doubled docstore would silently corrupt doc stats and local-docID
dictionaries."""

import hashlib
import os

import pyarrow as pa
import pyarrow.feather as feather
import pyarrow.parquet as pq

from search_engine_ray.stages.postings import FragmentSpiller


def _batch() -> pa.Table:
    # posting rows (part >= 0) + doc rows (part == -1), the spiller's input
    # layout from the fused tokenize stage
    return pa.table({
        "field": pa.array([0, 0, 0, 1, 0, 0], type=pa.int8()),
        "term": pa.array(["scan", "merge", "scan", "scan", "", ""]),
        "doc_id": pa.array([11, 11, 24, 24, 11, 24], type=pa.int64()),
        "tf": pa.array([2, 1, 3, 1, 0, 0], type=pa.int32()),
        "part": pa.array([0, 1, 0, 2, -1, -1], type=pa.int32()),
        "doc_len": pa.array([None, None, None, None, 3, 4],
                            type=pa.int32()),
    })


def _tree_digest(root: str) -> dict[str, str]:
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = hashlib.sha256(
                    fh.read()).hexdigest()
    return out


def test_retry_overwrites_identically(tmp_path):
    frag = str(tmp_path / "frags")
    docs = str(tmp_path / "docstore")
    sp = FragmentSpiller(frag, docs, n_doc_shards=2)
    b = _batch()

    m1 = sp(b)                       # first attempt
    snap1_frag, snap1_doc = _tree_digest(frag), _tree_digest(docs)
    m2 = sp(b)                       # task retry replays the same block
    snap2_frag, snap2_doc = _tree_digest(frag), _tree_digest(docs)

    # same file SET and same BYTES — no duplicate fragments anywhere
    assert snap1_frag == snap2_frag and snap1_frag
    assert snap1_doc == snap2_doc and snap1_doc
    # the metrics row is identical too (only the surviving attempt's row
    # ever reaches the consuming aggregate — Ray discards failed outputs)
    assert m1.equals(m2)


def test_double_spill_reads_back_single_copy(tmp_path):
    frag = str(tmp_path / "frags")
    docs = str(tmp_path / "docstore")
    sp = FragmentSpiller(frag, docs, n_doc_shards=2)
    b = _batch()
    sp(b)
    sp(b)                            # retry

    # postings: every (term, doc) appears exactly once across fragments
    # (fragments carry block-local doc_idx + a shared per-block docdict;
    # resolve_fragment_docids is the encoder's read path)
    from search_engine_ray.stages.postings import resolve_fragment_docids
    rows = []
    for dirpath, _, files in os.walk(frag):
        if os.path.basename(dirpath) == "docdict":
            continue
        for f in files:
            t = resolve_fragment_docids(
                feather.read_table(os.path.join(dirpath, f)), frag, f)
            rows.extend((r["term"], r["doc_id"]) for r in t.to_pylist())
    assert sorted(rows) == sorted(
        [("scan", 11), ("merge", 11), ("scan", 24), ("scan", 24)])

    # docstore: each doc exactly once, routed to doc_id % n_doc_shards
    for shard, want in ((0, [24]), (1, [11])):
        t = pq.read_table(os.path.join(docs, f"shard={shard}"))
        assert t["doc_id"].to_pylist() == want


def test_distinct_blocks_never_collide(tmp_path):
    frag = str(tmp_path / "frags")
    sp = FragmentSpiller(frag, None)
    a = _batch()
    # same leading docID, different content → different fragment tag
    other = a.set_column(2, "doc_id",
                         pa.array([11, 11, 99, 99, 11, 99],
                                  type=pa.int64()))
    sp(a)
    sp(other)
    # part=0 receives one fragment from EACH block
    p0_dir = os.path.join(frag, "part=00000")
    assert len(os.listdir(p0_dir)) == 2


def test_zero_posting_block(tmp_path):
    # every doc in the block tokenized to nothing (empty/binary text,
    # all-stopword): only doc rows (part == -1), zero posting rows.  The
    # spiller must still spill the doc rows and return a metrics row —
    # regression: pvals.max() on the empty part array raised ValueError.
    frag = str(tmp_path / "frags")
    docs = str(tmp_path / "docstore")
    sp = FragmentSpiller(frag, docs, n_doc_shards=2)
    b = pa.table({
        "field": pa.array([0, 0], type=pa.int8()),
        "term": pa.array(["", ""]),
        "doc_id": pa.array([11, 24], type=pa.int64()),
        "tf": pa.array([0, 0], type=pa.int32()),
        "part": pa.array([-1, -1], type=pa.int32()),
        "doc_len": pa.array([0, 0], type=pa.int32()),
    })
    m = sp(b)
    assert m["n_docs"][0].as_py() == 2
    assert m["total_tokens"][0].as_py() == 0
    # doc rows landed in the docstore spill; no posting fragments exist
    assert any(f.startswith("frag-") for _, _, fs in os.walk(docs)
               for f in fs)
    assert not any(f.startswith("frag-") for _, _, fs in os.walk(frag)
                   for f in fs)
