"""Similarity search over embedding columns (``list<float>``).

Two paths, both Ray-Data-first:

- **Brute-force top-k** (:class:`CosineScorer` + :func:`knn_topk`): the query
  matrix is broadcast once (``ray.put`` under the hood when passed in the
  ``map_batches`` closure as an object ref, or captured small); each batch
  computes a float64 matmul against its vectors and emits only its per-batch
  top-k partials, so the driver merge sees ``num_blocks × k`` rows, never the
  corpus.
- **LSH-bucketed near-dup** (:class:`HyperplaneLSH`): seeded random
  hyperplane signs → ``n_bits`` sign bucket per vector; a
  ``groupby(bucket)`` colocates near-duplicate candidates for exact cosine
  verification inside the group (the scale path — no all-pairs matmul).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _vectors_from_batch(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.ListArray) or isinstance(arr, pa.LargeListArray):
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        dim = int(widths[0]) if widths.size else 0
        if widths.size and not (widths == dim).all():
            raise ValueError("ragged embedding column")
        base = int(offsets[0]) if offsets.size else 0
        return flat[: len(arr) * dim].reshape(len(arr), dim) if base == 0 else \
            flat.reshape(-1)[offsets[0] - base:].reshape(len(arr), dim)
    raise TypeError(f"unsupported embedding column type {arr.type}")


class CosineScorer:
    """``map_batches`` callable: per-batch cosine vs a fixed query matrix,
    emitting only per-batch top-k partials ``(query_idx, vec_id, cos_sim)``.

    ``queries``: [q, dim] float64 (small; ship once per actor via actor-pool
    ``__init__``, the broadcast-small-side pattern)."""

    def __init__(self, queries: np.ndarray, *, k: int = 20,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        q = np.asarray(queries, dtype=np.float64)
        self.qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _vectors_from_batch(batch, self.vec_col)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if v.shape[0] == 0:
            return pa.table({"query_idx": pa.array([], type=pa.int32()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "cos_sim": pa.array([], type=pa.float64())})
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        sims = self.qn @ vn.T                     # [q, batch]
        k = min(self.k, sims.shape[1])
        # per-query partial top-k with deterministic (-sim, vec_id) order
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows = np.repeat(np.arange(sims.shape[0], dtype=np.int32), k)
        cols = part.reshape(-1)
        return pa.table({
            "query_idx": pa.array(rows, type=pa.int32()),
            "vec_id": pa.array(ids[cols], type=pa.int64()),
            "cos_sim": pa.array(sims[rows, cols], type=pa.float64()),
        })


def merge_topk(partials: pa.Table, k: int) -> pa.Table:
    """Merge per-batch partials → global top-k per query, deterministic
    (-cos_sim, vec_id) order."""
    qi = partials["query_idx"].to_numpy(zero_copy_only=False)
    vid = partials["vec_id"].to_numpy(zero_copy_only=False)
    sim = partials["cos_sim"].to_numpy(zero_copy_only=False)
    order = np.lexsort((vid, -sim, qi))
    qi, vid, sim = qi[order], vid[order], sim[order]
    # rank within query
    out_q, out_v, out_s, out_r = [], [], [], []
    for q in np.unique(qi):
        m = qi == q
        out_q.append(np.full(min(k, m.sum()), q, dtype=np.int32))
        out_v.append(vid[m][:k])
        out_s.append(sim[m][:k])
        out_r.append(np.arange(min(k, m.sum()), dtype=np.int32))
    return pa.table({
        "query_idx": pa.array(np.concatenate(out_q) if out_q else [], type=pa.int32()),
        "rank": pa.array(np.concatenate(out_r) if out_r else [], type=pa.int32()),
        "vec_id": pa.array(np.concatenate(out_v) if out_v else [], type=pa.int64()),
        "cos_sim": pa.array(np.concatenate(out_s) if out_s else [], type=pa.float64()),
    })


class HyperplaneLSH:
    """embeddings batch → ``(bucket, vec_id)`` sign-LSH bucket rows.

    ``n_bits`` seeded random hyperplanes; vectors in the same bucket are
    near-duplicate candidates.  ``n_tables`` independent tables lower the
    miss rate; each emits one row per vector.

    ``carry_vec=True`` replicates the embedding column onto each bucket row
    so the downstream ``groupby(table_id, bucket)`` DELIVERS the vectors with
    the candidates — the verifier needs no side-channel lookup of the
    embedding table (at scale, a driver-broadcast of all vectors is an OOM;
    shipping each vector ``n_tables`` times through the shuffle is the
    standard LSH trade)."""

    def __init__(self, dim: int, *, n_bits: int = 16, n_tables: int = 4,
                 seed: int = 42, vec_col: str = "embedding",
                 id_col: str = "vec_id", carry_vec: bool = False):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((n_tables, n_bits, dim))
        self.n_bits = n_bits
        self.n_tables = n_tables
        self.vec_col = vec_col
        self.id_col = id_col
        self.carry_vec = carry_vec

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _vectors_from_batch(batch, self.vec_col)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        if n == 0:
            cols = {"table_id": pa.array([], type=pa.int32()),
                    "bucket": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64())}
            if self.carry_vec:
                cols[self.vec_col] = pa.array([], type=batch[self.vec_col].type)
            return pa.table(cols)
        tables, buckets, vids = [], [], []
        pow2 = (1 << np.arange(self.n_bits, dtype=np.int64))
        for t in range(self.n_tables):
            signs = (v @ self.planes[t].T) > 0          # [n, n_bits]
            code = signs.astype(np.int64) @ pow2
            tables.append(np.full(n, t, dtype=np.int32))
            buckets.append(code)
            vids.append(ids)
        cols = {
            "table_id": pa.array(np.concatenate(tables), type=pa.int32()),
            "bucket": pa.array(np.concatenate(buckets), type=pa.int64()),
            "vec_id": pa.array(np.concatenate(vids), type=pa.int64()),
        }
        if self.carry_vec:
            idx = pa.array(np.tile(np.arange(n, dtype=np.int64), self.n_tables))
            vec = batch[self.vec_col]
            if isinstance(vec, pa.ChunkedArray):
                vec = vec.combine_chunks()
            cols[self.vec_col] = vec.take(idx)
        return pa.table(cols)
