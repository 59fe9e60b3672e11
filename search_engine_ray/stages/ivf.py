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
- **search**: cell-pinned :class:`CellSearcher` actors (the
  ``SegmentSearcher`` pattern from ``pipelines/query.py``) each hold a
  disjoint subset of cells resident; a query ships only its normalized
  vector + probe list to every actor and gets back a per-actor top-k —
  k·n_actors rows per query reach the driver, never cell contents.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# Hard bound ENFORCED on one CellSearcher actor's resident vectors.
# ``_vectors_from_batch`` materializes float64, so 128M elements = 1 GB
# resident (plus a transient same-size copy during normalization — budget
# ~2 GB peak per actor).  Each actor owns corpus/n_searchers vectors;
# violations raise in __init__ with the n_searchers/n_cells remedy instead
# of OOMing mid-load (same pattern as the quantile and SemDeDup group
# caps).  ``SERX_IVF_MAX_FLOATS`` overrides for deployments with more
# per-actor headroom — IVFIndex.search constructs the actors internally,
# so the env var (read in the actor at load time; set it before
# ``ray.init`` so workers inherit it) is the operator's opt-out knob.
MAX_ACTOR_FLOATS = 128_000_000


def sample_vectors(source_path: str, vec_col: str, sample_rows: int,
                   seed: int = 42) -> np.ndarray:
    """Seeded UNBIASED sample of ``sample_rows`` vectors across the WHOLE
    parquet file: random row indices drawn over ``metadata.num_rows``, then
    only the row groups containing them are read (a head sample is biased
    when the file is clustered — e.g. already sorted by some key).  A
    DIRECTORY source samples each member file with ``sample_rows`` split
    proportionally to file row counts (footer reads only), so multi-file
    datasets stay unbiased too."""
    from .similarity import _vectors_from_batch
    if os.path.isdir(source_path):
        files = sorted(
            os.path.join(source_path, f) for f in os.listdir(source_path)
            if f.endswith(".parquet"))
        if not files:
            raise ValueError(f"no parquet files under {source_path}")
        counts = np.array([pq.ParquetFile(f).metadata.num_rows
                           for f in files], dtype=np.int64)
        total = int(counts.sum())
        if total == 0:
            return np.zeros((0, 0), dtype=np.float64)
        # proportional split, remainders to the largest files; ≥1 row per
        # nonempty file so tiny shards still contribute
        share = np.maximum((counts * sample_rows) // max(total, 1), 1)
        share = np.minimum(share, counts)
        parts = [sample_vectors(f, vec_col, int(s), seed=seed + i)
                 for i, (f, s) in enumerate(zip(files, share)) if s > 0]
        return np.concatenate([p for p in parts if p.size], axis=0)
    pf = pq.ParquetFile(source_path)
    total = pf.metadata.num_rows
    if total <= sample_rows:
        idx = np.arange(total, dtype=np.int64)
    else:
        rng = np.random.RandomState(seed)
        idx = np.sort(rng.choice(total, size=sample_rows, replace=False))
    rg_rows = np.array([pf.metadata.row_group(i).num_rows
                        for i in range(pf.metadata.num_row_groups)],
                       dtype=np.int64)
    rg_starts = np.concatenate([[0], np.cumsum(rg_rows)])
    parts = []
    for rg in np.unique(np.searchsorted(rg_starts, idx, side="right") - 1):
        local = idx[(idx >= rg_starts[rg]) & (idx < rg_starts[rg + 1])] \
            - rg_starts[rg]
        t = pf.read_row_group(int(rg), columns=[vec_col])
        parts.append(t.take(pa.array(local)))
    return _vectors_from_batch(pa.concat_tables(parts), vec_col)


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


class CellSearcher:
    """Cell-pinned resident searcher: owns cells with
    ``cell % n_searchers == shard`` and loads ONLY their partitions in
    ``__init__`` (once per actor) — O(corpus / n_searchers) memory each,
    mirroring ``SegmentSearcher``'s shard ownership.  Plain class, wrapped
    in ``ray.remote`` by :meth:`IVFIndex.search`."""

    def __init__(self, index_dir: str, shard: int, n_searchers: int,
                 max_actor_floats: int | None = None):
        from .similarity import _vectors_from_batch
        if max_actor_floats is None:
            max_actor_floats = int(os.environ.get("SERX_IVF_MAX_FLOATS",
                                                  MAX_ACTOR_FLOATS))
        cells_dir = os.path.join(index_dir, "cells")
        self.cells: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        loaded = 0
        for name in os.listdir(cells_dir):
            if not name.startswith("cell="):
                continue
            c = int(name.split("=", 1)[1])
            if c % n_searchers != shard:
                continue
            t = pq.read_table(os.path.join(cells_dir, name),
                              columns=["vec_id", "embedding"])
            v = _vectors_from_batch(t, "embedding")
            loaded += v.size
            if loaded > max_actor_floats:
                # the resident-actor counterpart of the SemDeDup cell cap:
                # fail with the sizing remedy instead of OOMing the actor
                raise ValueError(
                    f"CellSearcher shard {shard}/{n_searchers} exceeds "
                    f"max_actor_floats={max_actor_floats} "
                    f"(~{max_actor_floats * 8 / 2**30:.1f} GB resident "
                    f"float64, ~2x that peak during normalization) while "
                    f"loading cell {c}: each actor holds "
                    f"corpus/n_searchers vectors — raise n_searchers "
                    f"(more actors, fewer cells each) and/or n_cells at "
                    f"build time so cells spread thinner, or set "
                    f"SERX_IVF_MAX_FLOATS if the node has the headroom")
            vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True),
                                1e-30)
            self.cells[c] = (t["vec_id"].to_numpy(zero_copy_only=False), vn)

    def search(self, qn: np.ndarray, probe: np.ndarray, k: int
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Per-query exact cosine top-k over this actor's share of the
        probed cells → ``(vec_ids, sims, query_idx)`` partials (≤ k rows
        per query; the driver merges across actors)."""
        out_v, out_s, out_q = [], [], []
        for qi in range(qn.shape[0]):
            # score each owned cell IN PLACE and keep only its (-sim, id)
            # top-k; concatenating the cells' resident matrices per query
            # would copy up to the actor's whole float budget per call.
            # Per-cell cut + merge is exact: a global top-k row is in its
            # own cell's top-k under the same order
            cand_v, cand_s = [], []
            for c in probe[qi]:
                o = self.cells.get(int(c))
                if o is None:
                    continue
                ids_c, mat_c = o
                sims_c = mat_c @ qn[qi]
                if sims_c.size > k:
                    part = np.argpartition(-sims_c, k - 1)[:k]
                    keep = np.flatnonzero(sims_c >= sims_c[part].min())
                    sel = keep[np.lexsort((ids_c[keep], -sims_c[keep]))[:k]]
                else:
                    sel = np.arange(sims_c.size)
                cand_v.append(ids_c[sel])
                cand_s.append(sims_c[sel])
            if not cand_v:
                continue
            ids = np.concatenate(cand_v)
            sims = np.concatenate(cand_s)
            order = np.lexsort((ids, -sims))[:k]
            out_v.append(ids[order])
            out_s.append(sims[order])
            out_q.append(np.full(order.size, qi, dtype=np.int32))
        if not out_v:
            return (np.zeros(0, np.int64), np.zeros(0, np.float64),
                    np.zeros(0, np.int32))
        return (np.concatenate(out_v), np.concatenate(out_s),
                np.concatenate(out_q))


class IVFIndex:
    """Build-once / probe-many IVF index persisted as cell-partitioned
    parquet."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.centroids = np.load(os.path.join(index_dir, "centroids.npy"))
        self._pool = None

    @classmethod
    def build(cls, source_path: str, index_dir: str, *, n_cells: int = 16,
              sample_rows: int = 4096, seed: int = 42,
              vec_col: str = "embedding", id_col: str = "vec_id") -> "IVFIndex":
        import ray.data
        os.makedirs(index_dir, exist_ok=True)
        sample = sample_vectors(source_path, vec_col, sample_rows, seed=seed)
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

    def _searchers(self, n_searchers: int) -> list:
        """Lazily start (and cache) the cell-pinned searcher actor pool —
        resident state loads once per actor, not per query."""
        import ray
        if getattr(self, "_pool", None) is not None \
                and len(self._pool) == n_searchers:
            return self._pool
        remote = ray.remote(CellSearcher)
        self._pool = [remote.remote(self.index_dir, s, n_searchers)
                      for s in range(n_searchers)]
        return self._pool

    def search(self, queries: np.ndarray, k: int = 10, *,
               nprobe: int = 4, n_searchers: int = 4) -> pa.Table:
        """→ ``(query_idx, rank, vec_id, cos_sim)``; each query probes only
        its ``nprobe`` nearest cells, scored INSIDE the owning
        :class:`CellSearcher` actors — the driver ships the tiny normalized
        query matrix + probe lists and merges k·n_searchers rows per query
        (never cell contents; round-2's driver-side cell reads removed)."""
        import ray
        q = np.asarray(queries, dtype=np.float64)
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        cell_sims = qn @ self.centroids.T
        probe = np.argsort(-cell_sims, axis=1)[:, :nprobe].astype(np.int32)
        parts = ray.get([a.search.remote(qn, probe, k)
                         for a in self._searchers(n_searchers)])
        out_q, out_r, out_v, out_s = [], [], [], []
        for qi in range(qn.shape[0]):
            ids = np.concatenate([p[0][p[2] == qi] for p in parts])
            if ids.size == 0:
                continue
            sims = np.concatenate([p[1][p[2] == qi] for p in parts])
            # same comparator as a single global pass: merging per-actor
            # top-k under a total order is exact
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
