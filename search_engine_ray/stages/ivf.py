"""IVF (inverted-file) approximate nearest neighbour over embedding columns.

The coarse-quantizer scale path complementing :mod:`stages.similarity`'s
hyperplane LSH: k-means centroids partition the vector space; each vector is
assigned to its nearest centroid (one distributed vectorized pass); a query
probes only the ``nprobe`` nearest cells and reranks candidates exactly.

Ray-Data-first layout:

- **train**: centroids fit on a driver-side SAMPLE (seeded mini k-means —
  the sample, not the corpus, bounds memory);
- **assign**: ``map_batches`` matmul per batch → ``(cell, vec_id)`` +
  normalized vectors persisted per cell (``write_parquet`` partitioned by
  cell = the IVF posting lists);
- **search**: read only the probed cells' parquet (partition pruning),
  exact cosine rerank — candidates ≪ corpus.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def train_centroids(sample: np.ndarray, n_cells: int, *, n_iter: int = 10,
                    seed: int = 42) -> np.ndarray:
    """Seeded mini k-means on L2-normalized sample vectors (cosine cells)."""
    rng = np.random.RandomState(seed)
    x = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-30)
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(n_iter):
        sims = x @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-30)
    return cents


class AssignCells:
    """``map_batches`` callable: embeddings batch → ``(cell, vec_id,
    embedding)`` with the centroid matrix held per actor (broadcast-small
    pattern)."""

    def __init__(self, centroids: np.ndarray, *, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
        self.centroids = np.asarray(centroids, dtype=np.float64)
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .similarity import _vectors_from_batch
        v = _vectors_from_batch(batch, self.vec_col)
        if v.shape[0] == 0:
            return pa.table({"cell": pa.array([], type=pa.int32()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "embedding": batch[self.vec_col]})
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        cell = np.argmax(vn @ self.centroids.T, axis=1).astype(np.int32)
        return pa.table({"cell": pa.array(cell, type=pa.int32()),
                         "vec_id": batch[self.id_col].cast(pa.int64()),
                         "embedding": batch[self.vec_col]})


class IVFIndex:
    """Build-once / probe-many IVF index persisted as cell-partitioned
    parquet."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.centroids = np.load(os.path.join(index_dir, "centroids.npy"))

    @classmethod
    def build(cls, source_path: str, index_dir: str, *, n_cells: int = 16,
              sample_rows: int = 4096, seed: int = 42,
              vec_col: str = "embedding", id_col: str = "vec_id") -> "IVFIndex":
        import ray.data
        os.makedirs(index_dir, exist_ok=True)
        pf = pq.ParquetFile(source_path)
        sample_batches = []
        got = 0
        for b in pf.iter_batches(batch_size=1024, columns=[vec_col]):
            sample_batches.append(b)
            got += b.num_rows
            if got >= sample_rows:
                break
        from .similarity import _vectors_from_batch
        sample = _vectors_from_batch(
            pa.Table.from_batches(sample_batches), vec_col)
        cents = train_centroids(sample, n_cells, seed=seed)
        np.save(os.path.join(index_dir, "centroids.npy"), cents)

        cells_dir = os.path.join(index_dir, "cells")
        import shutil
        shutil.rmtree(cells_dir, ignore_errors=True)
        (ray.data.read_parquet(source_path, columns=[id_col, vec_col])
         .map_batches(AssignCells(cents, vec_col=vec_col, id_col=id_col),
                      batch_format="pyarrow")
         .write_parquet(cells_dir, partition_cols=["cell"]))
        return cls(index_dir)

    def search(self, queries: np.ndarray, k: int = 10, *,
               nprobe: int = 4) -> pa.Table:
        """→ ``(query_idx, rank, vec_id, cos_sim)``; probes only the
        ``nprobe`` nearest cells per query (partition-pruned reads)."""
        q = np.asarray(queries, dtype=np.float64)
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        cell_sims = qn @ self.centroids.T
        probe = np.argsort(-cell_sims, axis=1)[:, :nprobe]
        needed = sorted(set(probe.reshape(-1).tolist()))
        cells = {}
        from .similarity import _vectors_from_batch
        for c in needed:
            path = os.path.join(self.index_dir, "cells", f"cell={c}")
            if not os.path.isdir(path):
                continue
            t = pq.read_table(path, columns=["vec_id", "embedding"])
            v = _vectors_from_batch(t, "embedding")
            vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
            cells[c] = (t["vec_id"].to_numpy(zero_copy_only=False), vn)
        out_q, out_r, out_v, out_s = [], [], [], []
        for qi in range(qn.shape[0]):
            ids_parts, vec_parts = [], []
            for c in probe[qi]:
                if int(c) in cells:
                    ids_parts.append(cells[int(c)][0])
                    vec_parts.append(cells[int(c)][1])
            if not ids_parts:
                continue
            ids = np.concatenate(ids_parts)
            sims = np.concatenate(vec_parts) @ qn[qi]
            order = np.lexsort((ids, -sims))[:k]
            out_q.append(np.full(order.size, qi, dtype=np.int32))
            out_r.append(np.arange(order.size, dtype=np.int32))
            out_v.append(ids[order])
            out_s.append(sims[order])
        return pa.table({
            "query_idx": pa.array(np.concatenate(out_q) if out_q else [],
                                  type=pa.int32()),
            "rank": pa.array(np.concatenate(out_r) if out_r else [],
                             type=pa.int32()),
            "vec_id": pa.array(np.concatenate(out_v) if out_v else [],
                               type=pa.int64()),
            "cos_sim": pa.array(np.round(np.concatenate(out_s), 6)
                                if out_s else [], type=pa.float64()),
        })
