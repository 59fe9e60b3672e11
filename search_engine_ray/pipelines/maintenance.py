"""Index maintenance: document deletes (tombstones) and compaction.

Lucene-style lifecycle, restated for the (doc-shard × term-bucket) segment
grid:

- :func:`delete_docs` appends the docIDs to shard-partitioned tombstone
  parquet fragments.  Every :class:`SegmentSearcher` loads its own shards'
  tombstones at startup and masks those documents out of every query path
  (BM25 / MaxScore / phrase / faceted / reference ranking) — deletes are
  visible on the next searcher start without touching a single segment.
  Corpus statistics (n_docs, avgdl, df) intentionally stay PRE-delete until
  compaction, the standard searchable-deletes convention.
- :func:`compact_index` rewrites the index without the dead documents:
  docstore shards are filtered first (new local-docID dictionaries), then
  one Ray task per partition decodes its segment, drops dead postings and
  re-encodes against the new dictionary; docstats and termstats are
  recomputed and the tombstones removed.  Each partition commits atomically
  (tmp + rename + ``_DONE``), so a killed compaction resumes like a build.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..state import checkpoint as ckpt


def delete_docs(index_dir: str, doc_ids) -> int:
    """Append tombstones for ``doc_ids``; returns how many were recorded.
    Unknown docIDs are recorded harmlessly (searchers ignore them)."""
    man = ckpt.read_manifest(index_dir)
    n_shards = man["config"]["n_doc_shards"]
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    if not ids.size:
        return 0
    shards = ids % n_shards
    for s in np.unique(shards):
        d = ckpt.tombstones_shard_dir(index_dir, int(s))
        os.makedirs(d, exist_ok=True)
        t = pa.table({"doc_id": pa.array(ids[shards == s], type=pa.int64())})
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.parquet")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(d, f"del-{uuid.uuid4().hex}.parquet"))
    return int(ids.size)


def load_tombstones(index_dir: str, shard: int) -> np.ndarray:
    """Sorted unique deleted global docIDs of one shard (empty if none)."""
    d = ckpt.tombstones_shard_dir(index_dir, shard)
    if not os.path.isdir(d):
        return np.zeros(0, dtype=np.int64)
    files = glob.glob(os.path.join(d, "del-*.parquet"))
    if not files:
        return np.zeros(0, dtype=np.int64)
    ids = np.concatenate([
        pq.read_table(f, columns=["doc_id"])["doc_id"]
        .to_numpy(zero_copy_only=False).astype(np.int64) for f in files])
    return np.unique(ids)


class _CompactPartition:
    """One Ray task per ``part``: decode → drop dead docIDs → re-encode
    against the compacted docstore's shard dictionary → atomic commit."""

    def __init__(self, src_dir: str, out_dir: str, n_buckets: int,
                 dead_refs: dict, dict_refs: dict):
        self.src_dir = src_dir
        self.out_dir = out_dir
        self.n_buckets = n_buckets
        self.dead_refs = dead_refs      # shard -> ObjectRef(sorted int64)
        self.dict_refs = dict_refs      # (src|out, shard) -> ObjectRef

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray
        from ..stages.postings import (decode_segment_to_rows,
                                       encode_postings_table)
        rows_out = []
        for part in batch["part"].to_pylist():
            shard, bucket = ckpt.split_part(part, self.n_buckets)
            src = os.path.join(ckpt.partition_dir(self.src_dir, shard, bucket),
                               "postings.parquet")
            in_dict = ray.get(self.dict_refs[("src", shard)])
            out_dict = ray.get(self.dict_refs[("out", shard)])
            dead = ray.get(self.dead_refs[shard])
            seg = pq.read_table(src) if os.path.exists(src) else None
            if seg is not None and seg.num_rows:
                rows = decode_segment_to_rows(seg, in_dict)
                ids = rows["doc_id"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(dead, ids)
                pos_ok = pos < dead.size
                is_dead = np.zeros(ids.size, dtype=bool)
                is_dead[pos_ok] = dead[pos[pos_ok]] == ids[pos_ok]
                rows = rows.filter(pa.array(~is_dead))
            else:
                rows = pa.table({"term": pa.array([], type=pa.string()),
                                 "doc_id": pa.array([], type=pa.int64()),
                                 "tf": pa.array([], type=pa.int32())})
            out_seg = encode_postings_table(rows, out_dict)
            part_dir = ckpt.partition_dir(self.out_dir, shard, bucket)
            os.makedirs(part_dir, exist_ok=True)
            tmp = os.path.join(part_dir, f".tmp-{uuid.uuid4().hex}.parquet")
            pq.write_table(out_seg, tmp, compression="zstd")
            os.replace(tmp, os.path.join(part_dir, "postings.parquet"))
            metrics = {"part": part, "shard": shard, "bucket": bucket,
                       "n_terms": out_seg.num_rows,
                       "n_postings": int(pa.compute.sum(out_seg["df"]).as_py()
                                         or 0),
                       "bytes": os.path.getsize(
                           os.path.join(part_dir, "postings.parquet")),
                       "compacted": True}
            with open(os.path.join(part_dir, "_DONE"), "w") as f:
                json.dump(metrics, f)
            rows_out.append(metrics)
        return pa.table({k: [r[k] for r in rows_out]
                         for k in ("part", "shard", "bucket", "n_terms",
                                   "n_postings", "bytes")})


def compact_index(index_dir: str, out_dir: str) -> dict:
    """Rewrite ``index_dir`` without its tombstoned documents into
    ``out_dir`` (which may then replace the original).  Partition-parallel;
    statistics (docstats, termstats) are recomputed so BM25 over the
    compacted index equals a fresh build over the surviving corpus."""
    import ray
    from dataclasses import replace as _dcreplace
    from ..stages.postings import load_shard_dict
    from ..state.checkpoint import IndexConfig
    from .build import write_termstats
    man = ckpt.read_manifest(index_dir)
    cfg = IndexConfig(**{k: tuple(v) if isinstance(v, list) else v
                         for k, v in man["config"].items()})
    os.makedirs(out_dir, exist_ok=True)

    # 1. compacted docstore: filter each shard's rows; new dictionaries.
    # RESUME GUARD (same rule merge_indexes documents): an existing output
    # docstore is reused AS-IS — partitions committed before a crash were
    # encoded against its dictionaries, and rewriting it here (e.g. after
    # delete_docs added tombstones to the still-live source in between)
    # would shift local-docID positions under them, silently remapping
    # their postings to different documents.  Newly-added tombstones are
    # applied by the NEXT compaction into a fresh out_dir.
    reuse_docstore = bool(glob.glob(os.path.join(
        ckpt.docstore_dir(out_dir), "**", "*.parquet"), recursive=True))
    n_docs = 0
    total_tokens = 0
    dead_refs, dict_refs = {}, {}
    for s in range(cfg.n_doc_shards):
        dead = load_tombstones(index_dir, s)
        dead_refs[s] = ray.put(dead)
        sdir = ckpt.docstore_shard_dir(index_dir, s)
        out_sdir = ckpt.docstore_shard_dir(out_dir, s)
        if reuse_docstore:
            out_t = (pq.read_table(out_sdir, columns=["doc_len"])
                     if os.path.isdir(out_sdir) and any(
                         f.endswith(".parquet")
                         for f in os.listdir(out_sdir)) else None)
            if out_t is not None:
                n_docs += out_t.num_rows
                total_tokens += int(
                    pa.compute.sum(out_t["doc_len"]).as_py() or 0)
        elif os.path.isdir(sdir):
            os.makedirs(out_sdir, exist_ok=True)
            t = pq.read_table(sdir)
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(dead, ids)
            pos_ok = pos < dead.size
            is_dead = np.zeros(ids.size, dtype=bool)
            is_dead[pos_ok] = dead[pos[pos_ok]] == ids[pos_ok]
            t = t.filter(pa.array(~is_dead))
            pq.write_table(t, os.path.join(out_sdir, "docstore.parquet"),
                           compression="zstd")
            n_docs += t.num_rows
            total_tokens += int(pa.compute.sum(t["doc_len"]).as_py() or 0)
        dict_refs[("src", s)] = ray.put(
            load_shard_dict(ckpt.docstore_dir(index_dir), s))
        dict_refs[("out", s)] = ray.put(
            load_shard_dict(ckpt.docstore_dir(out_dir), s))
    ckpt.write_docstats(out_dir, n_docs=n_docs, total_tokens=total_tokens)

    # 2. partitions in parallel (resume: skip already-committed ones)
    pending = ckpt.pending_partitions(out_dir, cfg)
    if pending:
        parts = ray.data.from_items([{"part": int(p)} for p in pending],
                                    override_num_blocks=len(pending))
        worker = _CompactPartition(index_dir, out_dir, cfg.n_buckets,
                                   dead_refs, dict_refs)
        parts.map_batches(worker, batch_format="pyarrow",
                          batch_size=1).materialize()

    # 3. global stats + manifest; compacted index carries no tombstones
    write_termstats(out_dir)
    cfg = _dcreplace(cfg, extra=dict(cfg.extra, compacted_from=index_dir))
    ckpt.write_manifest(out_dir, cfg, ckpt.partition_metrics(out_dir, cfg))
    shutil.rmtree(os.path.join(out_dir, "tombstones"), ignore_errors=True)
    return ckpt.read_manifest(out_dir)


def ingest_documents(index_dir: str, source, *, keep_cols=None,
                     workdir: str | None = None,
                     exchange: str = "auto") -> dict:
    """Incremental ingestion: build a DELTA index over ``source`` with the
    live index's own config/partition grid, k-way merge with the delta
    LAST (so a re-crawled doc_id takes the new content — the merge's
    last-input-wins rule), then swap the merged index into place.

    Crash story: both the delta build and the merge are themselves
    resumable (per-partition ``_DONE`` commits), and the live index is
    only renamed away AFTER the merge fully commits — re-running
    ``ingest_documents`` after a crash either resumes the scratch dirs or,
    if the crash hit the two-rename window, leaves ``<index>.pre-ingest``
    on disk to recover from (directory swap is not atomic on POSIX).

    Scale note: merge cost is ∝ total index size, not delta size — the
    right cadence at 100 TB is batching deltas (build many cheap deltas,
    merge once), which this API supports by pointing ``merge_indexes`` at
    the accumulated list directly."""
    from ..state.checkpoint import IndexConfig
    from .build import build_index, build_reference_index
    from .merge import merge_indexes

    # auto-heal a crash inside a previous ingest's two-rename window: the
    # live dir is gone but its .pre-ingest snapshot (and possibly the fully
    # committed merged dir) survive — restore the snapshot and resume
    old = index_dir.rstrip("/") + ".pre-ingest"
    if not os.path.isdir(index_dir) and os.path.isdir(old):
        os.rename(old, index_dir)

    man = ckpt.read_manifest(index_dir)
    cfg = IndexConfig(**{k: tuple(v) if isinstance(v, list) else v
                         for k, v in man["config"].items()})
    # a fielded (reference) index records its field mappings in the
    # manifest; the delta must be built with the SAME fielded stage
    builder = (build_reference_index if cfg.extra.get("text_fields")
               else build_index)
    if keep_cols is None:
        # inherit the live index's docstore display columns — the merged
        # docstore concatenates both, so the delta must carry the same
        # extras (url/title/…) beyond the core (doc_id, doc_len, shard)
        frag = glob.glob(os.path.join(ckpt.docstore_dir(index_dir),
                                      "**", "*.parquet"), recursive=True)
        # 'pos' guards legacy positional indexes whose docstore fragments
        # carried the (all-null) postings position column
        core = {cfg.id_col, "doc_len", "shard", "pos"}
        keep_cols = tuple(
            c for c in pq.read_schema(frag[0]).names
            if c not in core) if frag else ()
    base = workdir or (index_dir.rstrip("/") + ".ingest")
    # stale-scratch guard: a crashed ingest leaves ``base`` holding a
    # fully/partly _DONE delta of ITS OWN source, and build_index's stage-1
    # resume tag covers config, not the source — without this marker a
    # later ingest of a DIFFERENT batch would silently resume (and merge)
    # the previous batch's delta instead of indexing the new one.
    src_id = source if isinstance(source, str) else repr(source)
    try:
        src_mtime = (os.path.getmtime(source)
                     if isinstance(source, str) and os.path.exists(source)
                     else 0)
    except OSError:
        src_mtime = 0
    src_marker = os.path.join(base, "_SOURCE.json")
    want_src = {"source": src_id, "mtime": src_mtime}
    if os.path.isdir(base):
        try:
            with open(src_marker) as f:
                have_src = json.load(f)
        except (OSError, ValueError):
            have_src = None
        if have_src != want_src:
            shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    with open(src_marker, "w") as f:
        json.dump(want_src, f)
    delta = os.path.join(base, "delta")
    merged = os.path.join(base, "merged")
    builder(source, delta, cfg, keep_cols=tuple(keep_cols),
            exchange=exchange)
    merge_indexes([index_dir, delta], merged)
    # (a stale .pre-ingest here means a previous run crashed after its
    # swap completed but before cleanup — the live dir is already the
    # merged one, so the snapshot is disposable)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(index_dir, old)
    os.rename(merged, index_dir)
    shutil.rmtree(old)
    shutil.rmtree(base, ignore_errors=True)
    return ckpt.read_manifest(index_dir)
