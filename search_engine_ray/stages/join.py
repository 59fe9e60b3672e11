"""Distributed hash equi-join expressed with Dataset primitives.

Ray Data (2.49) has no built-in join, and the reference engine's joins are
in-heap map probes (``SearchEngine.h:139-155`` query-term → postings,
``SourceEngine.h:22`` docid → path).  For relational pipelines this module
provides the two scale shapes:

- :func:`hash_join` — large ⋈ large: both sides are hash-bucketed on the
  key (one all-to-all exchange each), then each bucket is joined locally
  with Arrow's Acero hash join inside ``groupby(bucket).map_groups``.
  PARTITIONING ASSUMPTION: keys hash-uniform across ``n_buckets``; a hot
  key concentrates its bucket — salt it on the build side (duplicate the
  probe row per salt) exactly as the index build salts hot terms.
- :func:`broadcast_lookup` — large ⋈ tiny: the dim table is read ONCE,
  ``ray.put`` into the object store, and probed per batch inside
  ``map_batches`` — no shuffle of the big side at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _with_bucket(ds: "ray.data.Dataset", key: str, n_buckets: int,
                 side: int, all_cols: list[tuple[str, pa.DataType]],
                 ) -> "ray.data.Dataset":
    """Attach join-bucket + side marker and align to the union schema
    (missing columns become typed nulls) so the two sides can union."""
    def add(t: pa.Table) -> pa.Table:
        kv = t[key]
        if not pa.types.is_integer(kv.type):
            from ..functions.hashing import fnv1a64_array
            kv = pa.array(fnv1a64_array(kv).view(np.int64))
        bucket = pc.cast(
            pc.bit_wise_and(pc.cast(kv, pa.int64()),
                            np.int64(n_buckets - 1)), pa.int32())
        cols = {}
        for name, typ in all_cols:
            if name in t.column_names:
                cols[name] = t[name].cast(typ)
            else:
                cols[name] = pa.nulls(t.num_rows, type=typ)
        cols["__jb"] = bucket
        cols["__side"] = pa.nulls(t.num_rows, pa.int8()).fill_null(side)
        return pa.table(cols)
    return ds.map_batches(add, batch_format="pyarrow")


def hash_join(left: "ray.data.Dataset", right: "ray.data.Dataset", *,
              left_key: str, right_key: str, n_buckets: int = 64,
              join_type: str = "inner") -> "ray.data.Dataset":
    """Hash-partitioned equi-join.  ``n_buckets`` MUST be a power of two
    (bucket = key & (n_buckets-1)); size it so one bucket of the LARGER
    side fits a worker heap (~rows/n_buckets per group).  Column names must
    be disjoint apart from the keys (rename upstream)."""
    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of 2"
    ls = left.schema()
    rs = right.schema()
    left_cols = list(zip(ls.names, ls.types))
    right_cols = [(n, t) for n, t in zip(rs.names, rs.types)
                  if n != right_key]
    dup = {n for n, _ in left_cols} & {n for n, _ in right_cols}
    if dup:
        raise ValueError(f"column name collision across sides: {sorted(dup)}")
    all_cols = left_cols + right_cols

    lt = _with_bucket(left, left_key, n_buckets, 0, all_cols)
    rt = _with_bucket(
        right.rename_columns({right_key: left_key}) if right_key != left_key
        else right, left_key, n_buckets, 1, all_cols)

    left_names = [n for n, _ in left_cols]
    right_names = [left_key] + [n for n, _ in right_cols]

    def join_bucket(g: pa.Table) -> pa.Table:
        l = g.filter(pc.equal(g["__side"], 0)).select(left_names)
        r = g.filter(pc.equal(g["__side"], 1)).select(right_names)
        # local Acero hash join on this bucket's co-located rows
        return l.join(r, keys=left_key, join_type=join_type)

    return (lt.union(rt)
            .groupby("__jb")
            .map_groups(join_bucket, batch_format="pyarrow"))


def broadcast_lookup(ds: "ray.data.Dataset", dim: pa.Table, *, key: str,
                     dim_key: str) -> "ray.data.Dataset":
    """Attach a TINY dim table's columns to every row of ``ds``:
    ``ray.put`` the dim once, probe per batch via a sorted-key searchsorted
    (vectorized; no shuffle, no per-batch reshipping — each worker fetches
    the broadcast object from its node's store once)."""
    order = pc.sort_indices(dim[dim_key])
    dim_sorted = dim.take(order)
    dim_ref = ray.put(dim_sorted)
    val_cols = [c for c in dim.column_names if c != dim_key]
    val_types = {c: dim.schema.field(c).type for c in val_cols}

    def attach(t: pa.Table) -> pa.Table:
        d = ray.get(dim_ref)
        if d.num_rows == 0:                 # empty dim: all-null values
            out = t
            for c in val_cols:
                out = out.append_column(
                    c, pa.nulls(t.num_rows, type=val_types[c]))
            return out
        keys = d[dim_key].to_numpy()
        probe = t[key].to_numpy(zero_copy_only=False)
        valid = pc.is_valid(t[key]).to_numpy(zero_copy_only=False)
        # null probe keys must not reach searchsorted (NaN/None compare
        # undefined there) — route them to index 0 and mask the hit
        idx = np.searchsorted(keys, np.where(valid, probe, keys[0]))
        idx = np.clip(idx, 0, len(keys) - 1)
        hit = valid & (keys[idx] == np.where(valid, probe, keys[0]))
        out = t
        for c in val_cols:
            vals = d[c].take(pa.array(idx))
            if not bool(hit.all()):
                vals = pc.if_else(pa.array(hit), vals,
                                  pa.nulls(t.num_rows, type=vals.type))
            out = out.append_column(c, vals)
        return out
    return ds.map_batches(attach, batch_format="pyarrow")
