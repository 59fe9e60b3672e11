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
        # flatten() already rebases sliced arrays, so flat holds exactly
        # this array's len(arr)*dim values
        return flat.reshape(len(arr), dim)
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
        # per-query partial top-k with deterministic (-sim, vec_id) order.
        # argpartition alone keeps boundary TIES by array position — which
        # vec_ids survive would then depend on block partitioning (and
        # duplicate embeddings are exactly what dedup corpora contain) —
        # so widen to every column tied with the k-th value and resolve
        # with an explicit (-sim, vec_id) lexsort before cutting to k
        out_rows, out_cols = [], []
        for qi_ in range(sims.shape[0]):
            s = sims[qi_]
            part = np.argpartition(-s, k - 1)[:k]
            cand = np.flatnonzero(s >= s[part].min())
            order = np.lexsort((ids[cand], -s[cand]))
            sel = cand[order[:k]]
            out_rows.append(np.full(sel.size, qi_, dtype=np.int32))
            out_cols.append(sel)
        rows = np.concatenate(out_rows)
        cols = np.concatenate(out_cols)
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


def plan_row_group_blocks(path: str, *, target_rows: int = 2048,
                          suffix: str = ".parquet") -> list[dict]:
    """Plan row-range blocks for the blocked all-pairs self-join by reading
    ONLY parquet footers (driver never touches vector data).

    Each block is ``{"file": f, "row_groups": [...]}`` covering ~``target_rows``
    rows; tasks later read exactly their two blocks via
    ``ParquetFile.read_row_groups`` (column-pruned), so no copy of the full
    matrix ever exists on any node."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(
            os.path.join(root, n)
            for root, _, names in os.walk(path)
            for n in names if n.endswith(suffix))
    else:
        files = [path]
    blocks: list[dict] = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        cur: list[int] = []
        cur_rows = 0
        for rg in range(md.num_row_groups):
            cur.append(rg)
            cur_rows += md.row_group(rg).num_rows
            if cur_rows >= target_rows:
                blocks.append({"file": f, "row_groups": cur})
                cur, cur_rows = [], 0
        if cur:
            blocks.append({"file": f, "row_groups": cur})
    return blocks


class BlockPairScorer:
    """``map_batches`` callable over ``(i, j)`` block-pair index rows: the
    EXACT cosine-threshold self-join, block-partitioned.

    The all-pairs similarity self-join is O(n²) in compute by definition;
    what must NOT be O(n²) — or even O(n) per task — is memory.  Each task
    reads just its two row-range blocks from parquet (column-pruned,
    footer-planned by :func:`plan_row_group_blocks`), normalizes, runs one
    float64 matmul, and emits only qualifying pairs, so peak memory is
    2 × block_rows × dim doubles + the block×block sim matrix, independent of
    corpus size.  n²/b² tasks schedule like any other Dataset stage.  This is
    the exactness baseline / LSH-verify path; at corpus scale use
    :class:`HyperplaneLSH` (candidates) or IVF for sub-quadratic work.

    A small per-actor LRU keeps the last few decoded blocks: pair tasks for a
    row of the upper triangle reuse the left block instead of re-reading it.
    """

    _LRU_CAP = 4

    def __init__(self, blocks: list[dict], *, threshold: float,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        self.blocks = blocks
        self.threshold = float(threshold)
        self.vec_col = vec_col
        self.id_col = id_col
        self._lru: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _load(self, bi: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self._lru.pop(bi, None)
        if hit is not None:
            self._lru[bi] = hit                       # refresh recency
            return hit
        import pyarrow.parquet as pq
        b = self.blocks[bi]
        t = pq.ParquetFile(b["file"]).read_row_groups(
            b["row_groups"], columns=[self.id_col, self.vec_col])
        ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = _vectors_from_batch(t, self.vec_col)
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        if len(self._lru) >= self._LRU_CAP:
            self._lru.pop(next(iter(self._lru)))
        self._lru[bi] = (ids, vn)
        return ids, vn

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        for i, j in zip(batch["i"].to_numpy(zero_copy_only=False),
                        batch["j"].to_numpy(zero_copy_only=False)):
            ids_a, va = self._load(int(i))
            ids_b, vb = self._load(int(j))
            sims = va @ vb.T
            if i == j:
                ra, cb = np.triu_indices(len(ids_a), k=1)
            else:
                ra, cb = np.nonzero(sims >= self.threshold)
            keep = sims[ra, cb] >= self.threshold
            ra, cb = ra[keep], cb[keep]
            a, b, s = ids_a[ra], ids_b[cb], sims[ra, cb]
            swap = a > b                              # canonical (low, high)
            a[swap], b[swap] = b[swap], a[swap]
            out_a.append(a)
            out_b.append(b)
            out_s.append(s)
        cat = (lambda xs, dt: np.concatenate(xs).astype(dt) if xs
               else np.array([], dtype=dt))
        return pa.table({
            "vec_a": pa.array(cat(out_a, np.int64)),
            "vec_b": pa.array(cat(out_b, np.int64)),
            "cos_sim": pa.array(cat(out_s, np.float64)),
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


class QuantizeEmbeddings:
    """embeddings batch → per-vector symmetric int8 quantization stats
    ``(vec_id, scale, q_sum, q_l1, max_err)`` — the standard ANN
    memory-compression step (float32 → int8 is 4× less index RAM).

    ``q_i = floor(x_i · 127 / max|x| + 0.5)`` — floor-based half-up
    rounding is evaluated identically by numpy and DuckDB doubles, so the
    SQL oracle is bit-exact (numpy's ``rint`` rounds half-to-even and
    DuckDB's ``round`` half-away; ``floor(+0.5)`` sidesteps both).
    Row-local and shuffle-free at any corpus size; a zero vector
    quantizes to all-zero with scale 0.
    """

    def __init__(self, *, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _vectors_from_batch(batch, self.vec_col)      # float64 copies
        mx = np.abs(v).max(axis=1) if v.shape[1] else \
            np.zeros(v.shape[0])
        safe = np.where(mx == 0, 1.0, mx)   # guard ONLY the zero vector
        q = np.floor(v * 127.0 / safe[:, None] + 0.5)
        q[mx == 0] = 0.0
        err = np.abs(q * mx[:, None] / 127.0 - v)
        err[mx == 0] = 0.0
        return pa.table({
            "vec_id": batch[self.id_col].cast(pa.int64()),
            "scale": pa.array(np.round(mx, 6), type=pa.float64()),
            "q_sum": pa.array(q.sum(axis=1).astype(np.int64),
                              type=pa.int64()),
            "q_l1": pa.array(np.abs(q).sum(axis=1).astype(np.int64),
                             type=pa.int64()),
            "max_err": pa.array(
                np.round(err.max(axis=1) if v.shape[1]
                         else np.zeros(v.shape[0]), 6),
                type=pa.float64()),
        })


def greedy_semantic_keep(vecs: np.ndarray, threshold: float) -> np.ndarray:
    """Within-cluster SemDeDup keep mask (Abbas et al. 2023, "SemDeDup:
    Data-efficient learning at web-scale through semantic deduplication"):
    row ``i`` is kept iff its cosine to every EARLIER kept row is
    ``< threshold``.  Rows must arrive L2-normalized and already in the
    canonical (ascending-id) order — the greedy survivor is then the
    lowest id of each semantic-duplicate set, independent of batching.
    Each step is one vectorized dot against the kept matrix, so a cluster
    of n rows with k survivors costs O(n·k·dim)."""
    n = len(vecs)
    keep = np.zeros(n, dtype=bool)
    kept: list[int] = []
    for i in range(n):
        if kept and float(np.max(vecs[kept] @ vecs[i])) >= threshold:
            continue
        keep[i] = True
        kept.append(i)
    return keep
