"""Multi-index (multi-segment) merge with docID remapping.

North-rule component: merge K independently-built indexes (e.g. delta builds
over successive crawl batches) into one, partition-parallel:

- each (shard, bucket) partition is merged in its own Ray task — a k-way
  merge of the K inputs' docID-sorted posting lists (stable timsort over
  concatenated runs), DOC-level last-input-wins on re-crawled doc_ids (an
  earlier input's postings for a doc a later input contains are dropped
  outright, so terms the new version no longer has don't survive as stale
  df), optional per-input docID offset remapping — then committed
  atomically with a ``_DONE`` marker (resumable like the build itself);
- docstores concatenate with last-input-wins per doc_id;
- docstats / termstats are recomputed from the merged artifacts.

All inputs must share the same partition grid (n_buckets, n_doc_shards) —
the grid is content-addressed (hash of term / doc_id), so equal grids mean
partition i of every input holds the same key space.  With remapping
offsets the doc-shard assignment would change; remapped merges therefore
re-shard rows by the REMAPPED doc_id before encoding.
"""

from __future__ import annotations

import glob
import os
from dataclasses import replace

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..stages.postings import merge_segment_tables
from ..state import checkpoint as ckpt
from ..state.checkpoint import IndexConfig


def _load_dict_task(docstore_dir: str, shard: int):
    """Remote body: one shard-dictionary load, result broadcast by ref."""
    from ..stages.postings import load_shard_dict
    return load_shard_dict(docstore_dir, shard)


class _MergePartition:
    """map_batches callable over a table of ``part`` ids: merges one
    partition per input row.

    Input segments in LOCAL docID space decode through their own index's
    shard dictionary; the merged output re-encodes against the MERGED
    docstore's shard dictionary (written before this stage runs), so the
    local↔global remap lives entirely inside the per-partition task."""

    def __init__(self, index_dirs: list[str], out_dir: str, n_buckets: int,
                 doc_id_offsets: list[int] | None,
                 dict_refs: dict | None = None, n_doc_shards: int = 0):
        self.index_dirs = index_dirs
        self.out_dir = out_dir
        self.n_buckets = n_buckets
        self.n_doc_shards = n_doc_shards
        self.offsets = doc_id_offsets
        self._flat_cache: dict = {}
        # (rank, shard) -> ObjectRef of that input's shard dictionary
        # (rank -1 = the merged output).  Loaded ONCE per (dir, shard) by
        # parallel tasks and broadcast via the object store — without this,
        # every partition task re-reads every input's shard dict
        # (K+1 dataset-discovery-bound parquet reads x n_partitions; 94% of
        # merge task time in the 1.6M-doc profile).  A task only fetches
        # the dicts of the ONE shard its partitions belong to, so per-task
        # memory stays O(corpus / n_doc_shards).
        self.dict_refs = dict_refs or {}
        self._drop_cache: dict[int, list] = {}

    def _dict_for(self, rank: int, shard: int):
        ref = self.dict_refs.get((rank, shard))
        if ref is not None:
            return ray.get(ref)
        from ..stages.postings import load_shard_dict
        d = self.out_dir if rank < 0 else self.index_dirs[rank]
        return load_shard_dict(ckpt.docstore_dir(d), shard)

    def _ids_for(self, rank: int, shard: int):
        """The shard's sorted global docIDs for precedence computation:
        the shard dictionary when the input is shard-partitioned, else
        derived from the LEGACY FLAT docstore (round-1/2 layout —
        load_shard_dict returns None for it, which is the right signal for
        segment decoding (global space) but not an id set)."""
        import numpy as np
        d = self._dict_for(rank, shard)
        if d is not None:
            return d
        root = ckpt.docstore_dir(
            self.out_dir if rank < 0 else self.index_dirs[rank])
        ids = self._flat_cache.get(rank)
        if ids is None:
            import glob as _g
            if _g.glob(os.path.join(root, "*.parquet")):
                ids = np.unique(
                    pq.read_table(root, columns=["doc_id"])["doc_id"]
                    .to_numpy(zero_copy_only=False).astype(np.int64))
            else:
                ids = np.empty(0, dtype=np.int64)
            self._flat_cache[rank] = ids
        if not self.n_doc_shards:
            return ids
        return ids[ids % self.n_doc_shards == shard]

    def _drops_for(self, shard: int) -> list:
        """Per input rank, the sorted docIDs this rank must DROP from its
        postings: docs a LATER input also contains (doc-level last-input-
        wins for re-crawls — see merge_segment_tables' drop_docs).  Built
        once per shard from the shard dictionaries (already broadcast)."""
        import numpy as np
        cached = self._drop_cache.get(shard)
        if cached is not None:
            return cached
        k = len(self.index_dirs)
        drops: list = [None] * k
        seen = None
        for r in range(k - 1, -1, -1):
            d = self._ids_for(r, shard)
            drops[r] = (np.intersect1d(d, seen) if seen is not None
                        else np.empty(0, dtype=np.int64))
            seen = d if seen is None else np.union1d(seen, d)
        self._drop_cache[shard] = drops
        return drops

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json
        import uuid as uuidlib
        out_rows = []
        for part in batch["part"].to_pylist():
            shard, bucket = ckpt.split_part(part, self.n_buckets)
            drop_by_rank = (self._drops_for(shard)
                            if len(self.index_dirs) > 1 else None)
            segs, offsets, in_dicts, drops = [], [], [], []
            for rank, d in enumerate(self.index_dirs):
                path = os.path.join(ckpt.partition_dir(d, shard, bucket),
                                    "postings.parquet")
                if os.path.exists(path):
                    segs.append(pq.read_table(path))
                    offsets.append(self.offsets[rank] if self.offsets else 0)
                    in_dicts.append(self._dict_for(rank, shard))
                    drops.append(drop_by_rank[rank]
                                 if drop_by_rank is not None else None)
            out_dict = self._dict_for(-1, shard)
            merged = merge_segment_tables(segs, offsets if any(offsets) else None,
                                          in_dicts=in_dicts, out_dict=out_dict,
                                          drop_docs=drops)
            part_dir = ckpt.partition_dir(self.out_dir, shard, bucket)
            os.makedirs(part_dir, exist_ok=True)
            tmp = os.path.join(part_dir, f".tmp-{uuidlib.uuid4().hex}.parquet")
            pq.write_table(merged, tmp, compression="zstd")
            final = os.path.join(part_dir, "postings.parquet")
            os.replace(tmp, final)
            metrics = {"part": part, "shard": shard, "bucket": bucket,
                       "n_terms": merged.num_rows,
                       "n_postings": int(pa.compute.sum(merged["df"]).as_py() or 0),
                       "bytes": os.path.getsize(final)}
            with open(os.path.join(part_dir, "_DONE"), "w") as f:
                json.dump(metrics, f)
            out_rows.append(metrics)
        return pa.table({k: [r[k] for r in out_rows]
                         for k in ("part", "shard", "bucket", "n_terms",
                                   "n_postings", "bytes")})


def merge_indexes(index_dirs: list[str], out_dir: str, *,
                  doc_id_offsets: list[int] | None = None) -> dict:
    """Merge K indexes into ``out_dir``; returns the merged manifest."""
    assert index_dirs, "need at least one input index"
    manifests = [ckpt.read_manifest(d) for d in index_dirs]
    cfg0 = manifests[0]["config"]
    for m in manifests[1:]:
        assert (m["config"]["n_buckets"] == cfg0["n_buckets"]
                and m["config"]["n_doc_shards"] == cfg0["n_doc_shards"]), \
            "all inputs must share the partition grid"
    assert doc_id_offsets is None or not any(doc_id_offsets), \
        "docID remapping across shard grids not supported at index level; " \
        "use merge_segment_tables directly for remapped single partitions"
    cfg = IndexConfig(**{k: tuple(v) if isinstance(v, list) else v
                         for k, v in cfg0.items()})
    os.makedirs(out_dir, exist_ok=True)

    # docstore FIRST: the partition merges below re-encode postings against
    # the merged docstore's shard dictionaries.  Concat with last-input-wins
    # per doc_id; output shard-partitioned (``shard=K/``) like the build's.
    # Idempotent tmp+swap; an existing output docstore (a resumed merge —
    # inputs are immutable) is reused as-is.
    store_dir = ckpt.docstore_dir(out_dir)
    if not os.path.isdir(store_dir):
        import numpy as np

        n_shards = cfg.n_doc_shards
        # dedup bucket count: co-locates every copy of a doc_id while
        # keeping each group a VECTORIZED batch of ~corpus/256 rows — a
        # per-doc_id groupby would make one Python group call per document
        # (measured 15× the whole merge's runtime at 1.6M docs)
        n_dedup = n_shards * max(1, 256 // n_shards)

        stores = []
        for rank, d in enumerate(index_dirs):
            s = ray.data.read_parquet(os.path.join(d, "docstore"))
            if "shard" in s.schema().names:
                s = s.drop_columns(["shard"])   # recomputed below

            def tag(t: pa.Table, r=rank) -> pa.Table:
                ids = t["doc_id"].to_numpy(zero_copy_only=False)
                return (t.append_column(
                    "rank", pa.array([r] * t.num_rows, type=pa.int32()))
                    .append_column("dkey", pa.array(
                        (ids % n_dedup).astype(np.int32))))

            stores.append(s.map_batches(tag, batch_format="pyarrow"))
        merged_store = stores[0].union(*stores[1:]) if len(stores) > 1 else stores[0]

        def keep_last(group: pa.Table) -> pa.Table:
            ids = group["doc_id"].to_numpy(zero_copy_only=False)
            rk = group["rank"].to_numpy(zero_copy_only=False)
            order = np.lexsort((rk, ids))       # per doc: highest rank last
            last = np.ones(order.size, dtype=bool)
            last[:-1] = ids[order][1:] != ids[order][:-1]
            rows = group.take(pa.array(order[last])) \
                .drop_columns(["rank", "dkey"])
            kept = ids[order][last]
            return rows.append_column(
                "shard", pa.array((kept % n_shards).astype(np.int32)))

        import shutil
        tmp_store = store_dir + ".tmp"
        shutil.rmtree(tmp_store, ignore_errors=True)
        merged_store.groupby("dkey").map_groups(
            keep_last, batch_format="pyarrow") \
            .write_parquet(tmp_store, partition_cols=["shard"])
        os.replace(tmp_store, store_dir)

    # tombstones carry forward: a deleted doc stays dead in the merged
    # index UNLESS a later input re-crawled it (same doc-level last-input-
    # wins rule as the postings) — without this, merging resurrects every
    # searchable-deleted document.  Idempotent (skip if already written).
    import numpy as np
    from ..stages.postings import load_shard_dict
    from .maintenance import load_tombstones
    flat_ids_cache: dict[int, np.ndarray] = {}

    def _input_shard_ids(r: int, s: int) -> np.ndarray:
        # shard dictionary, or (legacy flat docstore — load_shard_dict
        # returns None for it) the flat file's ids filtered to the shard
        d = load_shard_dict(ckpt.docstore_dir(index_dirs[r]), s)
        if d is not None:
            return d
        ids = flat_ids_cache.get(r)
        if ids is None:
            root = ckpt.docstore_dir(index_dirs[r])
            if glob.glob(os.path.join(root, "*.parquet")):
                ids = np.unique(
                    pq.read_table(root, columns=["doc_id"])["doc_id"]
                    .to_numpy(zero_copy_only=False).astype(np.int64))
            else:
                ids = np.empty(0, dtype=np.int64)
            flat_ids_cache[r] = ids
        return ids[ids % cfg.n_doc_shards == s]

    for s in range(cfg.n_doc_shards):
        out_ts = ckpt.tombstones_shard_dir(out_dir, s)
        if os.path.isdir(out_ts):
            continue                      # resumed merge
        parts, later = [], None
        for r in range(len(index_dirs) - 1, -1, -1):
            t = load_tombstones(index_dirs[r], s)
            if later is not None and t.size:
                t = np.setdiff1d(t, later)    # revived by a later re-crawl
            if t.size:
                parts.append(t)
            d = _input_shard_ids(r, s)
            later = d if later is None else np.union1d(later, d)
        if parts:
            dead = np.unique(np.concatenate(parts))
            os.makedirs(out_ts, exist_ok=True)
            pq.write_table(
                pa.table({"doc_id": pa.array(dead, type=pa.int64())}),
                os.path.join(out_ts, "del-carried.parquet"))

    pending = ckpt.pending_partitions(out_dir, cfg)
    if pending:
        # shard dictionaries: load each (dir, shard) ONCE in parallel tasks
        # and broadcast the refs (see _MergePartition.dict_refs)
        load = ray.remote(num_cpus=1)(_load_dict_task)
        dict_refs = {}
        for shard in range(cfg.n_doc_shards):
            for rank, d in enumerate(index_dirs):
                dict_refs[(rank, shard)] = load.remote(
                    ckpt.docstore_dir(d), shard)
            dict_refs[(-1, shard)] = load.remote(
                ckpt.docstore_dir(out_dir), shard)

        # one block per partition → one merge task per partition
        parts = ray.data.from_arrow(
            pa.table({"part": pa.array(pending, type=pa.int32())})) \
            .repartition(len(pending))
        worker = _MergePartition(index_dirs, out_dir, cfg.n_buckets,
                                 doc_id_offsets, dict_refs,
                                 n_doc_shards=cfg.n_doc_shards)
        parts.map_batches(worker, batch_format="pyarrow",
                          batch_size=1).materialize()

    lens = ray.data.read_parquet(store_dir, columns=["doc_len"])
    ckpt.write_docstats(out_dir, n_docs=lens.count(),
                        total_tokens=lens.sum("doc_len") or 0)
    from .build import write_termstats
    write_termstats(out_dir)
    ckpt.write_manifest(out_dir, cfg, ckpt.partition_metrics(out_dir, cfg))
    return ckpt.read_manifest(out_dir)