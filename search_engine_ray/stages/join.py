"""Distributed hash equi-join expressed with Dataset primitives.

Ray Data (2.49) has no built-in join, and the reference engine's joins are
in-heap map probes (``SearchEngine.h:139-155`` query-term → postings,
``SourceEngine.h:22`` docid → path).  For relational pipelines this module
provides the two scale shapes:

- :func:`hash_join` — large ⋈ large: both sides are hash-bucketed on the
  key (one all-to-all exchange each), then each bucket is joined locally
  with Arrow's Acero hash join.  The exchange itself has two modes, the
  same split (and the same rationale) as ``build_index``:

  * ``exchange="auto"`` (default): picks ``fs`` on a single node and
    ``groupby`` when >1 node is alive (:func:`resolve_exchange`).
  * ``exchange="fs"``: a filesystem external shuffle — map tasks
    spill per-bucket Arrow IPC fragments to node-local scratch in
    parallel, one join task per bucket reads them back.  On a single node
    Ray's sort-based ``groupby`` funnels every row through one plasma
    store ~3×; the page-cache-backed spill sidesteps that (measured 4×
    on the TPC-H-Q3 pipeline).  ASSUMES every worker sees the same
    filesystem (single node, or a shared/NFS scratch).
  * ``exchange="groupby"``: the idiomatic ``groupby(bucket).map_groups``
    sort-shuffle — the correct shape on a multi-node cluster, where every
    node contributes object-store bandwidth.

  PARTITIONING ASSUMPTION (both modes): keys hash-uniform across
  ``n_buckets``; a hot key concentrates its bucket — salt it on the build
  side (duplicate the probe row per salt) exactly as the index build
  salts hot terms.
- :func:`broadcast_lookup` — large ⋈ tiny: the dim table is read ONCE,
  ``ray.put`` into the object store, and probed per batch inside
  ``map_batches`` — no shuffle of the big side at all.
"""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _key_as_int64(t: pa.Table, key: str) -> np.ndarray:
    """Key column → int64 ndarray (FNV for non-integer keys).  Null keys
    map to 0 / hash("") — they land in a well-defined bucket and still
    never match inside the Acero join, which is the SQL semantic."""
    kv = t[key]
    if isinstance(kv, pa.ChunkedArray):
        kv = kv.combine_chunks()
    if pa.types.is_integer(kv.type):
        return (kv.cast(pa.int64()).fill_null(0)
                .to_numpy(zero_copy_only=False))
    from ..functions.hashing import fnv1a64_array
    return fnv1a64_array(kv).view(np.int64)


class _Salter:
    """Hot-key salting: a LEFT row with a hot key scatters across ``salt``
    sub-buckets (deterministic in-batch round-robin — retry-stable), and
    every RIGHT row with a hot key is REPLICATED into all ``salt``
    sub-buckets, so each left fragment still sees every matching right
    row exactly once.  Non-hot keys pay nothing (sub-bucket 0).  This is
    the join-side analogue of the index build's hot-term salting: it caps
    the largest bucket at ~|hot key rows|/salt instead of |hot key rows|."""

    def __init__(self, hot_keys, salt: int):
        assert salt >= 2, "salting needs salt >= 2"
        arr = pa.array(list(hot_keys))
        if pa.types.is_integer(arr.type):
            hot = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        else:
            from ..functions.hashing import fnv1a64_array
            hot = fnv1a64_array(arr).view(np.int64)
        self.hot = np.unique(hot)
        self.salt = int(salt)

    def left_buckets(self, k: np.ndarray, base: np.ndarray) -> np.ndarray:
        sub = np.where(np.isin(k, self.hot),
                       np.arange(len(k), dtype=np.int64) % self.salt, 0)
        return base * self.salt + sub

    def expand_right(self, t: pa.Table, k: np.ndarray, base: np.ndarray
                     ) -> tuple[pa.Table, np.ndarray]:
        b = base * self.salt
        ishot = np.isin(k, self.hot)
        if not ishot.any():
            return t, b
        idx = np.flatnonzero(ishot)
        tables, buckets = [t], [b]
        for j in range(1, self.salt):
            tables.append(t.take(pa.array(idx)))
            buckets.append(base[idx] * self.salt + j)
        return (pa.concat_tables(tables, promote_options="none"),
                np.concatenate(buckets))


def _bucketize(t: pa.Table, key: str, n_buckets: int, side: int,
               salter: "_Salter | None") -> tuple[pa.Table, np.ndarray]:
    """(table, per-row bucket ids) for one side, salting applied."""
    k = _key_as_int64(t, key)
    base = k & (n_buckets - 1)
    if salter is None:
        return t, base
    if side == 0:
        return t, salter.left_buckets(k, base)
    return salter.expand_right(t, k, base)


def _with_bucket(ds: "ray.data.Dataset", key: str, n_buckets: int,
                 side: int, all_cols: list[tuple[str, pa.DataType]],
                 salter: "_Salter | None" = None) -> "ray.data.Dataset":
    """Attach join-bucket + side marker and align to the union schema
    (missing columns become typed nulls) so the two sides can union."""
    def add(t: pa.Table) -> pa.Table:
        t, b = _bucketize(t, key, n_buckets, side, salter)
        cols = {}
        for name, typ in all_cols:
            if name in t.column_names:
                cols[name] = t[name].cast(typ)
            else:
                cols[name] = pa.nulls(t.num_rows, type=typ)
        cols["__jb"] = pa.array(b.astype(np.int32))
        cols["__side"] = pa.nulls(t.num_rows, pa.int8()).fill_null(side)
        return pa.table(cols)
    return ds.map_batches(add, batch_format="pyarrow")


def resolve_exchange(requested: str) -> str:
    """Resolve ``"auto"`` to the exchange that is CORRECT for the cluster
    the caller is actually on: ``"fs"`` on a single node (bypasses the one
    plasma store that serializes the sort shuffle there), ``"groupby"``
    when >1 node is alive (each node contributes an object store, and the
    fs exchange's node-shared-scratch assumption no longer holds by
    default).  Explicit values pass through, so an operator with shared
    NVMe/NFS scratch can still force ``"fs"`` on a cluster."""
    if requested != "auto":
        return requested
    try:
        import ray
        if not ray.is_initialized():
            # Perform the same auto-init the first Dataset execution would
            # trigger moments later (honors RAY_ADDRESS, so a multi-node
            # caller that hasn't init'd yet still resolves to its real
            # topology instead of silently getting the single-node 'fs'
            # answer).  The driver contract initializes Ray before calling
            # the library, so this fires only in standalone scripts.
            ray.init(ignore_reinit_error=True, include_dashboard=False)
        alive = sum(1 for n in ray.nodes() if n.get("Alive"))
    except Exception:
        import warnings
        warnings.warn(
            "resolve_exchange('auto'): cluster topology unavailable; "
            "assuming a single node and using the 'fs' exchange — on a "
            "multi-node cluster without node-shared scratch, pass "
            "exchange='groupby' explicitly", RuntimeWarning)
        alive = 1
    return "groupby" if alive > 1 else "fs"


def join_scratch_base() -> str:
    """Base directory holding per-join scratch dirs.  Shared with the
    orphan janitor (``pipelines.build.cleanup_orphan_scratch``) so the
    sweep root always matches where joins actually write — including the
    ``SERX_SCRATCH_DIR`` override and the tempfile fallback."""
    env = os.environ.get("SERX_SCRATCH_DIR", "").strip()
    if env and env.lower() != "none":
        return env
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        return "/dev/shm/serx_join"
    import tempfile
    return os.path.join(tempfile.gettempdir(), "serx_join")


def _join_scratch() -> str:
    """Per-join scratch root: node-local fast storage (``/dev/shm`` here,
    NVMe on a real node; ``SERX_SCRATCH_DIR`` overrides), keyed by a fresh
    nonce so concurrent joins never collide."""
    return os.path.join(join_scratch_base(), uuid.uuid4().hex)


class _SideSpiller:
    """Map side of the fs exchange: split each batch by join bucket and
    append one Arrow IPC fragment per bucket.  Fragment names derive from
    a content hash of the batch's key column (same idempotence scheme as
    the index build's ``FragmentSpiller``): a retried task overwrites its
    own fragments, distinct blocks never collide.  Only a tiny metrics
    row returns through the object store."""

    def __init__(self, scratch: str, side: int, key: str, n_buckets: int,
                 salter: "_Salter | None" = None):
        self.dir = os.path.join(scratch, f"side{side}")
        self.side = side
        self.key = key
        self.n_buckets = n_buckets
        self.salter = salter

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"rows": pa.array([0], type=pa.int64())})
        import zlib
        # publish the side's TRUE batch schema once (first writer wins):
        # Dataset.schema() can report a stale, un-projected schema for a
        # lazy projection over a materialized dataset (observed on Ray
        # 2.49 under low parallelism), so the reduce side must not trust it
        spath = os.path.join(self.dir, "_schema.arrow")
        if not os.path.exists(spath):
            os.makedirs(self.dir, exist_ok=True)
            tmp = f"{spath}.{os.getpid()}.tmp"
            with open(tmp, "wb") as f:
                f.write(t.schema.serialize())
            os.replace(tmp, spath)
        k = _key_as_int64(t, self.key)
        content = zlib.crc32(np.ascontiguousarray(k).tobytes())
        tag = f"{k[0] & 0xFFFFFFFFFFFF:012x}-{content:08x}-{len(k)}"
        t, b = _bucketize(t, self.key, self.n_buckets, self.side,
                          self.salter)
        b = b.astype(np.int64)
        order = np.argsort(b, kind="stable")
        t = t.take(pa.array(order))
        b = b[order]
        starts = np.flatnonzero(np.r_[True, np.diff(b) != 0])
        ends = np.append(starts[1:], len(b))
        for s, e in zip(starts, ends):
            d = os.path.join(self.dir, f"b{int(b[s]):05d}")
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, f".tmp-{tag}.arrow")
            with pa.OSFile(tmp, "wb") as f, \
                    pa.ipc.new_stream(f, t.schema) as w:
                w.write_table(t.slice(s, e - s))
            os.replace(tmp, os.path.join(d, f"frag-{tag}.arrow"))
        return pa.table({"rows": pa.array([t.num_rows], type=pa.int64())})


def _read_fragments(dir_: str, schema: pa.Schema) -> pa.Table:
    if not os.path.isdir(dir_):
        return schema.empty_table()
    tabs = []
    for name in sorted(os.listdir(dir_)):
        if name.startswith("frag-"):
            with pa.OSFile(os.path.join(dir_, name), "rb") as f:
                tabs.append(pa.ipc.open_stream(f).read_all())
    if not tabs:
        return schema.empty_table()
    return pa.concat_tables(tabs, promote_options="none")


def _check_collisions(ls: pa.Schema, rs: pa.Schema, right_key: str) -> None:
    dup = (set(ls.names) & set(rs.names)) - {right_key}
    if dup:
        raise ValueError(f"column name collision across sides: {sorted(dup)}")


def hash_join(left: "ray.data.Dataset", right: "ray.data.Dataset", *,
              left_key: str, right_key: str, n_buckets: int = 64,
              join_type: str = "inner", exchange: str | None = None,
              hot_keys=None, salt: int = 8,
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None) -> "ray.data.Dataset":
    """Hash-partitioned equi-join.  ``n_buckets`` MUST be a power of two
    (bucket = key & (n_buckets-1)); size it so one bucket of the LARGER
    side fits a worker heap (~rows/n_buckets per group).  Column names must
    be disjoint apart from the keys (rename upstream).  ``exchange`` picks
    the shuffle implementation (module docstring); default is
    ``SERX_JOIN_EXCHANGE`` or ``"auto"`` (fs on a single node, groupby on
    a multi-node cluster — ``resolve_exchange``).

    ``hot_keys``: known skewed key values (from a sample or a prior
    heavy-hitter sketch — see ``stages.sketch.MisraGries``).  Each hot
    key's LEFT rows spread over ``salt`` sub-buckets and its RIGHT rows
    replicate into all of them (``_Salter``), capping the largest join
    task at ~1/salt of the hot key's rows; results are identical."""
    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of 2"
    if exchange is None:
        exchange = os.environ.get("SERX_JOIN_EXCHANGE", "auto")
    exchange = resolve_exchange(exchange)
    salter = _Salter(hot_keys, salt) if hot_keys is not None else None
    # explicit schema hints skip Dataset.schema(fetch_if_missing=True),
    # which EXECUTES part of a lazy lineage to infer the schema — two
    # avoidable mini-executions per join when both sides are lazy
    # (VERDICT r4 item 6); the fs spillers still record the observed
    # schema, so a wrong hint surfaces as a loud mismatch downstream
    ls = left_schema if left_schema is not None \
        else left.schema(fetch_if_missing=True)
    rs = right_schema if right_schema is not None \
        else right.schema(fetch_if_missing=True)
    ls = pa.schema(list(zip(ls.names, ls.types)))
    rs = pa.schema(list(zip(rs.names, rs.types)))
    _check_collisions(ls, rs, right_key)
    if exchange == "fs":
        return _hash_join_fs(left, right, left_key, right_key, n_buckets,
                             join_type, ls, rs, salter)
    return _hash_join_groupby(left, right, left_key, right_key, n_buckets,
                              join_type, ls, rs, salter)


def _hash_join_fs(left, right, left_key, right_key, n_buckets, join_type,
                  ls: pa.Schema, rs: pa.Schema,
                  salter: "_Salter | None" = None) -> "ray.data.Dataset":
    scratch = _join_scratch()
    n_groups = n_buckets * (salter.salt if salter else 1)
    try:
        spill = (left.map_batches(
            _SideSpiller(scratch, 0, left_key, n_buckets, salter),
            batch_format="pyarrow")
            .union(right.map_batches(
                _SideSpiller(scratch, 1, right_key, n_buckets, salter),
                batch_format="pyarrow")))
        spill.materialize()                       # barrier: both sides spilled

        # prefer the schemas the spillers actually observed (see
        # _SideSpiller: Dataset.schema() can be stale for lazy projections)
        def _spilled_schema(side: int, fallback: pa.Schema) -> pa.Schema:
            p = os.path.join(scratch, f"side{side}", "_schema.arrow")
            if os.path.exists(p):
                with open(p, "rb") as f:
                    return pa.ipc.read_schema(pa.BufferReader(f.read()))
            return fallback
        ls = _spilled_schema(0, ls)
        rs = _spilled_schema(1, rs)

        # authoritative output schema: Acero on empty inputs
        expected = ls.empty_table().join(
            rs.empty_table(), keys=left_key, right_keys=right_key,
            join_type=join_type).schema

        def join_bucket(bt: pa.Table) -> pa.Table:
            b = int(bt["b"][0].as_py())
            l = _read_fragments(
                os.path.join(scratch, "side0", f"b{b:05d}"), ls)
            r = _read_fragments(
                os.path.join(scratch, "side1", f"b{b:05d}"), rs)
            out = l.join(r, keys=left_key, right_keys=right_key,
                         join_type=join_type)
            return out.select(expected.names).cast(expected)

        parts = ray.data.from_items([{"b": i} for i in range(n_groups)])
        return parts.map_batches(join_bucket, batch_size=1,
                                 batch_format="pyarrow").materialize()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


class PreparedJoinSide:
    """Spilled LEFT side of an fs hash join, reusable across the rounds of
    an iterative algorithm (PageRank, label propagation): the constant big
    side is bucketed ONCE instead of re-spilled per iteration, and because
    the scratch outlives the call, the per-round join result can stay LAZY
    (``hash_join``'s fs path must materialize before its finally-cleanup)
    — together that removes one full spill of the big side AND one
    materialization round-trip per iteration.  Same shared-scratch
    assumption as ``exchange="fs"`` (single node / node-shared scratch);
    use :func:`hash_join` with ``exchange="groupby"`` on multi-node.

    Call :meth:`close` when done (or use as a context manager); each
    :meth:`join` deletes the previous round's right-side spill.
    """

    def __init__(self, ds: "ray.data.Dataset", *, key: str,
                 n_buckets: int = 64, schema: pa.Schema | None = None):
        assert n_buckets & (n_buckets - 1) == 0, \
            "n_buckets must be a power of 2"
        self.key = key
        self.n_buckets = n_buckets
        self.scratch = _join_scratch()
        self._round = 0
        sch = schema if schema is not None \
            else ds.schema(fetch_if_missing=True)
        sch = pa.schema(list(zip(sch.names, sch.types)))
        ds.map_batches(_SideSpiller(self.scratch, 0, key, n_buckets),
                       batch_format="pyarrow").materialize()
        self.schema = self._observed(0, sch)

    def _observed(self, side, fallback: pa.Schema) -> pa.Schema:
        p = os.path.join(self.scratch, f"side{side}", "_schema.arrow")
        if os.path.exists(p):
            with open(p, "rb") as f:
                return pa.ipc.read_schema(pa.BufferReader(f.read()))
        return fallback

    def join(self, right: "ray.data.Dataset", *, right_key: str,
             join_type: str = "inner",
             right_schema: pa.Schema | None = None) -> "ray.data.Dataset":
        rs = right_schema if right_schema is not None \
            else right.schema(fetch_if_missing=True)
        rs = pa.schema(list(zip(rs.names, rs.types)))
        _check_collisions(self.schema, rs, right_key)
        prev, self._round = self._round, self._round + 1
        if prev:
            shutil.rmtree(os.path.join(self.scratch, f"side1_r{prev:03d}"),
                          ignore_errors=True)
        tag = f"1_r{self._round:03d}"
        # pre-create the round dir: its absence later then unambiguously
        # means it was DELETED (a stale round's lazy result re-executed
        # after a newer join() reclaimed it) and must raise, not silently
        # join against an empty right side
        os.makedirs(os.path.join(self.scratch, f"side{tag}"), exist_ok=True)
        right.map_batches(
            _SideSpiller(self.scratch, tag, right_key, self.n_buckets),
            batch_format="pyarrow").materialize()
        rs = self._observed(tag, rs)
        ls, left_key = self.schema, self.key
        expected = ls.empty_table().join(
            rs.empty_table(), keys=left_key, right_keys=right_key,
            join_type=join_type).schema
        scratch = self.scratch

        def join_bucket(bt: pa.Table) -> pa.Table:
            b = int(bt["b"][0].as_py())
            if not os.path.isdir(os.path.join(scratch, f"side{tag}")):
                raise RuntimeError(
                    f"PreparedJoinSide round {tag} spill is gone — its "
                    f"lazy join result was (re-)executed after a newer "
                    f"join() reclaimed the round dir; materialize or "
                    f"fully consume each round's result before starting "
                    f"the next")
            l = _read_fragments(
                os.path.join(scratch, "side0", f"b{b:05d}"), ls)
            r = _read_fragments(
                os.path.join(scratch, f"side{tag}", f"b{b:05d}"), rs)
            out = l.join(r, keys=left_key, right_keys=right_key,
                         join_type=join_type)
            return out.select(expected.names).cast(expected)

        parts = ray.data.from_items([{"b": i}
                                     for i in range(self.n_buckets)])
        return parts.map_batches(join_bucket, batch_size=1,
                                 batch_format="pyarrow")

    def close(self) -> None:
        shutil.rmtree(self.scratch, ignore_errors=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _hash_join_groupby(left, right, left_key, right_key, n_buckets,
                       join_type, ls: pa.Schema, rs: pa.Schema,
                       salter: "_Salter | None" = None
                       ) -> "ray.data.Dataset":
    left_cols = list(zip(ls.names, ls.types))
    right_cols = [(n, t) for n, t in zip(rs.names, rs.types)
                  if n != right_key]
    all_cols = left_cols + right_cols

    lt = _with_bucket(left, left_key, n_buckets, 0, all_cols, salter)
    rt = _with_bucket(
        right.rename_columns({right_key: left_key}) if right_key != left_key
        else right, left_key, n_buckets, 1, all_cols, salter)

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


def per_key_head_k(pairs: "ray.data.Dataset", key: str, order_col: str,
                   k: int) -> "ray.data.Dataset":
    """Keeper set for the per-key-cap curation step (C4/Dolma "at most K
    pages per domain"): the ``k`` lowest-``order_col`` rows of every
    ``key`` group, returned as a keys-only dataset of ``[order_col]`` to
    semi-join back against the corpus (``hash_join(join_type='left
    semi')`` — never broadcast or collected; at web scale the keeper set
    is a corpus-scale fraction).

    Skew-immune by construction: a MAP-SIDE COMBINE keeps each batch's
    local lowest-k per key before the shuffle (global lowest-k ⊆ union of
    per-batch lowest-k), so the rank group of even a mega-key holds
    ≤ k × n_upstream_blocks skinny rows.  Shared by
    ``pipelines.queries.q_source_capped_sample`` and the curation
    pipeline's domain cap (``pipelines.curate``)."""

    def local_head_k(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[
            (key, "ascending"), (order_col, "ascending")])
        t = t.take(order)
        vals = t[key].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, vals[1:] != vals[:-1]])
        ends = np.append(starts[1:], len(vals))
        rank = np.arange(len(vals)) - np.repeat(starts, ends - starts)
        return t.filter(pa.array(rank < k))

    def head_k(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g[order_col])
        return g.take(order[:k]).select([order_col])

    return (pairs
            .map_batches(local_head_k, batch_format="pyarrow")
            .groupby(key)
            .map_groups(head_k, batch_format="pyarrow"))
