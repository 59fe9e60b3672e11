"""Mergeable quantile sketch (t-digest) — the unbounded-group scale path.

``q_event_value_quantiles`` (pipelines/queries.py) is EXACT but materializes
one group's values in one worker (bound enforced at
``QUANTILE_MAX_GROUP_ROWS``).  This module is the path past that bound: a
deterministic merging t-digest (Dunning & Ertl, "Computing extremely
accurate quantiles using t-digests", arXiv:1902.04023 — public algorithm)
whose partials build per batch inside ``map_batches`` and merge per group,
so NO stage ever holds more than ``O(delta)`` centroids per group: constant
memory per group regardless of group size.

Determinism: construction sorts centroids canonically (lexsort by
``(weight, mean)``) and clusters by the k1 scale-function index in one
vectorized pass — no data-order-dependent greedy accumulation — so a merge
of the same multiset of partials yields the same digest in any merge order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_TWO_PI = 2.0 * np.pi


def _compress(means: np.ndarray, weights: np.ndarray, delta: int
              ) -> tuple[np.ndarray, np.ndarray]:
    """One vectorized t-digest compression: canonical sort, cluster by
    ``floor(k1(q_mid))`` (k1 = (δ/2π)·asin(2q−1): clusters shrink toward
    the tails, where quantile accuracy matters), weighted-mean per
    cluster."""
    if means.size == 0:
        return means, weights
    order = np.lexsort((weights, means))
    m, w = means[order], weights[order]
    total = w.sum()
    qmid = (np.cumsum(w) - 0.5 * w) / total
    k = (delta / _TWO_PI) * np.arcsin(np.clip(2.0 * qmid - 1.0, -1.0, 1.0))
    cluster = np.floor(k).astype(np.int64)
    b = np.flatnonzero(np.r_[True, cluster[1:] != cluster[:-1]])
    new_w = np.add.reduceat(w, b)
    new_m = np.add.reduceat(w * m, b) / new_w
    return new_m, new_w


class TDigest:
    """Centroid-list t-digest over float64 values; ``delta`` bounds the
    centroid count (≈ δ/2), hence per-group memory."""

    __slots__ = ("delta", "means", "weights", "vmin", "vmax")

    def __init__(self, delta: int = 128):
        self.delta = delta
        self.means = np.zeros(0, dtype=np.float64)
        self.weights = np.zeros(0, dtype=np.float64)
        self.vmin = np.inf
        self.vmax = -np.inf

    @classmethod
    def of(cls, values: np.ndarray, delta: int = 128) -> "TDigest":
        d = cls(delta)
        d.add(values)
        return d

    def add(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self.means, self.weights = _compress(
            np.concatenate([self.means, v]),
            np.concatenate([self.weights, np.ones(v.size)]), self.delta)
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self.means, self.weights = _compress(
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]), self.delta)
        return self

    @classmethod
    def merge_all(cls, digests: list["TDigest"], delta: int = 128
                  ) -> "TDigest":
        """Order-independent merge: ONE compression over the concatenation
        of every partial's centroids (canonical sort inside), so the result
        doesn't depend on which worker's partial arrives first."""
        d = cls(delta)
        if not digests:
            return d
        d.vmin = min(x.vmin for x in digests)
        d.vmax = max(x.vmax for x in digests)
        d.means, d.weights = _compress(
            np.concatenate([x.means for x in digests]),
            np.concatenate([x.weights for x in digests]), delta)
        return d

    def quantile(self, q) -> np.ndarray:
        """Interpolated quantile estimate(s), clamped to the observed
        [min, max]."""
        q = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.means.size == 0:
            return np.full(q.shape, np.nan)
        cum = np.cumsum(self.weights)
        mid = cum - 0.5 * self.weights
        est = np.interp(q * cum[-1], mid, self.means)
        return np.clip(est, self.vmin, self.vmax)

    @property
    def count(self) -> float:
        return float(self.weights.sum())

    # ---- arrow row (de)serialization for shuffling partials ----

    def to_lists(self) -> tuple[list[float], list[float]]:
        return ([self.vmin, self.vmax] + self.means.tolist(),
                self.weights.tolist())

    @classmethod
    def from_lists(cls, means: list[float], weights: list[float],
                   delta: int = 128) -> "TDigest":
        d = cls(delta)
        d.vmin, d.vmax = means[0], means[1]
        d.means = np.asarray(means[2:], dtype=np.float64)
        d.weights = np.asarray(weights, dtype=np.float64)
        return d


class PartialDigests:
    """``map_batches`` callable: ``(key, value)`` batch → one serialized
    partial digest PER KEY PER BATCH (map-side combine).  The downstream
    ``groupby(key)`` shuffles O(δ) centroids per key per batch instead of
    raw values — the same partial-aggregation shape the count/sum paths
    use."""

    def __init__(self, *, key_col: str, value_col: str, delta: int = 128):
        self.key_col = key_col
        self.value_col = value_col
        self.delta = delta

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        vals = batch[self.value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        order = np.argsort(keys, kind="stable")
        keys, vals = keys[order], vals[order]
        bounds = (np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
                  if keys.size else np.zeros(0, dtype=np.int64))
        out_k, out_m, out_w = [], [], []
        for i, s in enumerate(bounds):
            e = bounds[i + 1] if i + 1 < bounds.size else keys.size
            m, w = TDigest.of(vals[s:e], self.delta).to_lists()
            out_k.append(keys[s])
            out_m.append(m)
            out_w.append(w)
        return pa.table({
            self.key_col: pa.array(out_k, type=batch[self.key_col].type),
            "td_means": pa.array(out_m, type=pa.list_(pa.float64())),
            "td_weights": pa.array(out_w, type=pa.list_(pa.float64())),
        })


def merge_digests_in_group(group: pa.Table, *, key_col: str,
                           quantiles: dict[str, float],
                           delta: int = 128) -> pa.Table:
    """``groupby(key).map_groups`` callable over partial-digest rows →
    one row per key with the requested quantile columns.  Holds O(rows·δ)
    centroids transiently — rows here are PARTIALS (one per batch), not
    values, so the group never sees the raw data."""
    parts = [TDigest.from_lists(m, w, delta)
             for m, w in zip(group["td_means"].to_pylist(),
                             group["td_weights"].to_pylist())]
    d = TDigest.merge_all(parts, delta)
    cols = {key_col: group[key_col].slice(0, 1)}
    for name, q in quantiles.items():
        cols[name] = pa.array([round(float(d.quantile(q)[0]), 6)],
                              type=pa.float64())
    return pa.table(cols)


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (Flajolet et al. 2007; public algorithm)
# ---------------------------------------------------------------------------

def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain) — turns raw int keys
    into well-mixed uint64s for register/rank extraction."""
    err = np.seterr(over="ignore")
    try:
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))
    finally:
        np.seterr(**err)


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized bit length of uint64 values (no float round-trip — exact
    past 2^53 where log2 is not)."""
    bl = np.zeros(w.shape, dtype=np.int64)
    w = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        big = w >= (np.uint64(1) << s)
        bl[big] += shift
        w[big] >>= s
    bl[w > 0] += 1
    return bl


class HyperLogLog:
    """Fixed 2^p uint8 register array; add is one vectorized
    ``np.maximum.at``, merge is elementwise max (order-independent by
    construction).  Standard error ≈ 1.04/√(2^p): p=12 → ~1.6 %."""

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = registers if registers is not None \
            else np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        if h.size == 0:
            return self
        h = _splitmix64(h)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) >> np.uint64(self.p)
        rank = ((64 - self.p) - _bit_length_u64(rest) + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)       # linear counting regime
        return float(est)


class PartialHLL:
    """``map_batches`` callable: ``(key, value)`` batch → one serialized HLL
    register row per key per batch; the groupby shuffles 2^p bytes per key
    per batch instead of raw values.  ``value_hash`` pre-hashes the value
    column (int64 passthrough or FNV for strings)."""

    def __init__(self, *, key_col: str, value_col: str, p: int = 12):
        self.key_col = key_col
        self.value_col = value_col
        self.p = p

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import fnv1a64_array
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        col = batch[self.value_col]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            vals = fnv1a64_array(col).astype(np.uint64)
        else:
            vals = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(keys, kind="stable")
        keys, vals = keys[order], vals[order]
        bounds = (np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
                  if keys.size else np.zeros(0, dtype=np.int64))
        out_k, out_r = [], []
        for i, s in enumerate(bounds):
            e = bounds[i + 1] if i + 1 < bounds.size else keys.size
            out_k.append(keys[s])
            out_r.append(HyperLogLog(self.p).add_hashes(vals[s:e])
                         .registers.tobytes())
        return pa.table({
            self.key_col: pa.array(out_k, type=batch[self.key_col].type),
            "hll": pa.array(out_r, type=pa.binary()),
        })


def merge_hll_in_group(group: pa.Table, *, key_col: str,
                       p: int = 12, out_col: str = "approx_distinct"
                       ) -> pa.Table:
    """``groupby(key).map_groups`` over partial-HLL rows → one estimate per
    key (register max over partials; any merge order gives the same
    registers)."""
    h = HyperLogLog(p)
    for blob in group["hll"].to_pylist():
        h.merge(HyperLogLog(p, np.frombuffer(blob, dtype=np.uint8).copy()))
    return pa.table({key_col: group[key_col].slice(0, 1),
                     out_col: pa.array([int(round(h.estimate()))],
                                       type=pa.int64())})


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (Misra & Gries 1982; mergeable summaries per
# Agarwal et al. 2013 — both public algorithms)
# ---------------------------------------------------------------------------

def _mg_compact(items: np.ndarray, counts: np.ndarray, capacity: int
                ) -> tuple[np.ndarray, np.ndarray]:
    """Sum duplicate items, then apply the Misra-Gries decrement: subtract
    the (capacity+1)-th largest count and drop non-positive counters.
    Canonical item sort → order-independent merges."""
    order = np.argsort(items, kind="stable")
    items, counts = items[order], counts[order]
    b = np.flatnonzero(np.r_[True, items[1:] != items[:-1]])
    items = items[b]
    counts = np.add.reduceat(counts, b)
    if items.size > capacity:
        kth = np.partition(counts, items.size - capacity - 1)[
            items.size - capacity - 1]
        keep = counts > kth
        items, counts = items[keep], counts[keep] - kth
    return items, counts


class MisraGries:
    """Heavy-hitter summary over int64 items: counts are LOWER bounds with
    error ≤ n/capacity; items with true frequency > n/capacity are
    guaranteed present (the ε-heavy hitters)."""

    __slots__ = ("capacity", "items", "counts", "n")

    def __init__(self, capacity: int = 256):
        self.capacity = capacity
        self.items = np.zeros(0, dtype=np.int64)
        self.counts = np.zeros(0, dtype=np.int64)
        self.n = 0

    def add(self, items: np.ndarray) -> "MisraGries":
        if items.size == 0:
            return self
        self.n += int(items.size)
        u, c = np.unique(items.astype(np.int64), return_counts=True)
        self.items, self.counts = _mg_compact(
            np.concatenate([self.items, u]),
            np.concatenate([self.counts, c]), self.capacity)
        return self

    @classmethod
    def merge_all(cls, parts: list["MisraGries"], capacity: int = 256
                  ) -> "MisraGries":
        """ONE compaction over every partial's counters — merge order can't
        matter because there is no pairwise merge chain."""
        m = cls(capacity)
        if not parts:
            return m
        m.n = sum(p.n for p in parts)
        m.items, m.counts = _mg_compact(
            np.concatenate([p.items for p in parts]),
            np.concatenate([p.counts for p in parts]), capacity)
        return m

    def top_k(self, k: int) -> tuple[np.ndarray, np.ndarray]:
        order = np.lexsort((self.items, -self.counts))[:k]
        return self.items[order], self.counts[order]


class PartialMG:
    """``map_batches`` callable over ``(item, weight)`` rows (e.g. postings
    ``(term, tf)``) → ONE partial-summary row per batch: surviving counter
    ``(hash, count)`` pairs plus the item strings they decode to (≤
    ``capacity`` entries, so the carried strings are bounded).  Weighted
    Misra-Gries: a counter absorbs the row's full weight; the compaction
    decrement keeps the ≤ n/capacity error bound."""

    def __init__(self, *, item_col: str, weight_col: str | None = None,
                 capacity: int = 256):
        self.item_col = item_col
        self.weight_col = weight_col
        self.capacity = capacity

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import fnv1a64_array
        if batch.num_rows == 0:
            # zero-row block (empty fragment / emptied-by-filter): one
            # empty partial row keeps the schema (downstream combine
            # handles zero-length counter lists)
            return pa.table({
                "g": pa.array([0], type=pa.int32()),
                "mg_hash": pa.array([[]], type=pa.list_(pa.int64())),
                "mg_count": pa.array([[]], type=pa.list_(pa.int64())),
                "mg_item": pa.array([[]], type=pa.list_(pa.string())),
                "mg_n": pa.array([0], type=pa.int64()),
            })
        items = batch[self.item_col]
        h = fnv1a64_array(items).astype(np.int64)
        w = (batch[self.weight_col].to_numpy(zero_copy_only=False)
             .astype(np.int64) if self.weight_col is not None
             else np.ones(batch.num_rows, dtype=np.int64))
        order = np.argsort(h, kind="stable")
        hs, ws = h[order], w[order]
        b = (np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
             if hs.size else np.zeros(0, dtype=np.int64))
        uh = hs[b]
        uc = np.add.reduceat(ws, b)
        first_row = order[b]                  # a representative row per hash
        kh, kc = _mg_compact(uh, uc, self.capacity)
        # decode surviving hashes back to item strings via the batch rows
        pos = first_row[np.searchsorted(uh, kh)]
        terms = items.take(pa.array(pos))
        return pa.table({
            "g": pa.array([0], type=pa.int32()),
            "mg_hash": pa.array([kh.tolist()], type=pa.list_(pa.int64())),
            "mg_count": pa.array([kc.tolist()], type=pa.list_(pa.int64())),
            "mg_item": pa.array([terms.to_pylist()],
                                type=pa.list_(pa.string())),
            "mg_n": pa.array([int(w.sum())], type=pa.int64()),
        })


def combine_mg_rows(batch: pa.Table, *, capacity: int = 256) -> pa.Table:
    """Intermediate combiner over partial-summary rows (``map_batches`` with
    a row-count batch size): merges up to ``batch_size`` partials into one —
    the tree level that keeps the FINAL single-group merge's input bounded
    at web scale (partials per corpus / batch_size, each ≤ capacity
    entries)."""
    if batch.num_rows <= 1:
        return batch
    hs = np.concatenate([np.asarray(x, dtype=np.int64)
                         for x in batch["mg_hash"].to_pylist()])
    cs = np.concatenate([np.asarray(x, dtype=np.int64)
                         for x in batch["mg_count"].to_pylist()])
    names: dict[int, str] = {}
    for row_h, row_t in zip(batch["mg_hash"].to_pylist(),
                            batch["mg_item"].to_pylist()):
        names.update(zip(row_h, row_t))
    kh, kc = _mg_compact(hs, cs, capacity)
    return pa.table({
        "g": pa.array([0], type=pa.int32()),
        "mg_hash": pa.array([kh.tolist()], type=pa.list_(pa.int64())),
        "mg_count": pa.array([kc.tolist()], type=pa.list_(pa.int64())),
        "mg_item": pa.array([[names[h] for h in kh.tolist()]],
                            type=pa.list_(pa.string())),
        "mg_n": pa.array([int(batch["mg_n"].to_numpy().sum())],
                         type=pa.int64()),
    })


def mg_topk_in_group(group: pa.Table, *, k: int, capacity: int = 256
                     ) -> pa.Table:
    """Final ``groupby('g').map_groups``: one compaction over all (already
    tree-combined) partials, then deterministic top-k by
    ``(-count, item)`` → ``(item, est_count, err_bound)``.  ``est_count``
    is a LOWER bound; the true count is within ``err_bound`` above it."""
    merged = combine_mg_rows(group, capacity=capacity)
    hs = np.asarray(merged["mg_hash"][0].as_py(), dtype=np.int64)
    cs = np.asarray(merged["mg_count"][0].as_py(), dtype=np.int64)
    ts = np.asarray(merged["mg_item"][0].as_py(), dtype=object)
    n = int(merged["mg_n"][0].as_py())
    order = np.lexsort((ts, -cs))[:k]
    return pa.table({
        "item": pa.array(ts[order].tolist(), type=pa.string()),
        "est_count": pa.array(cs[order], type=pa.int64()),
        "err_bound": pa.array([n // (capacity + 1)] * order.size,
                              type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005, public algorithm)
# ---------------------------------------------------------------------------

_CM_SEEDS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x27D4EB2F165667C5],
                     dtype=np.uint64)


class CountMin:
    """Mergeable point-frequency sketch over 64-bit item hashes: a
    ``d × width`` int64 counter matrix; ``estimate`` = min over the d rows
    (an UPPER bound on the true count; overestimate ≤ e·n/width with
    probability ≥ 1 − e^−d).  Merging = element-wise sum, so partials
    built per batch combine in any order to the same matrix — integer
    sums are exactly batching- and order-invariant."""

    __slots__ = ("width", "depth", "table", "n")

    def __init__(self, width: int = 2048, depth: int = 4,
                 table: np.ndarray | None = None, n: int = 0):
        self.width = width
        self.depth = depth
        self.table = (table if table is not None
                      else np.zeros((depth, width), dtype=np.int64))
        self.n = n

    def _cols(self, h: np.ndarray) -> np.ndarray:
        """(depth, n_items) column indices via splitmix of seed-xored
        hashes."""
        h = np.ascontiguousarray(h).view(np.uint64)
        return np.stack([
            _splitmix64(h ^ _CM_SEEDS[r]) % np.uint64(self.width)
            for r in range(self.depth)])

    def add(self, h: np.ndarray, weights: np.ndarray) -> "CountMin":
        if h.size == 0:
            return self
        w = np.asarray(weights, dtype=np.int64)
        cols = self._cols(h)
        for r in range(self.depth):
            np.add.at(self.table[r], cols[r], w)
        self.n += int(w.sum())
        return self

    def merge(self, other: "CountMin") -> "CountMin":
        self.table += other.table
        self.n += other.n
        return self

    def estimate(self, h: np.ndarray) -> np.ndarray:
        cols = self._cols(h)
        ests = np.stack([self.table[r][cols[r]] for r in range(self.depth)])
        return ests.min(axis=0)


class PartialCM:
    """``map_batches`` callable over ``(item, weight)`` rows → ONE partial
    count-min row per batch (the flattened d×width matrix).  Like the MG
    partials, the exchange moves only fixed-size summary rows — never an
    item-keyed shuffle."""

    def __init__(self, *, item_col: str, weight_col: str | None = None,
                 width: int = 2048, depth: int = 4):
        self.item_col = item_col
        self.weight_col = weight_col
        self.width = width
        self.depth = depth

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import fnv1a64_array
        cm = CountMin(self.width, self.depth)
        h = fnv1a64_array(batch[self.item_col])
        w = (batch[self.weight_col].to_numpy(zero_copy_only=False)
             .astype(np.int64) if self.weight_col is not None
             else np.ones(batch.num_rows, dtype=np.int64))
        cm.add(h, w)
        return pa.table({
            "g": pa.array([0], type=pa.int32()),
            "cm_table": pa.array([cm.table.ravel().tolist()],
                                 type=pa.list_(pa.int64())),
            "cm_n": pa.array([cm.n], type=pa.int64()),
        })


def combine_cm_rows(batch: pa.Table, *, width: int = 2048,
                    depth: int = 4) -> pa.Table:
    """Tree-combine level: element-wise sum of up to batch_size partial
    matrices into one row."""
    if batch.num_rows <= 1:
        return batch
    acc = np.zeros(depth * width, dtype=np.int64)
    for row in batch["cm_table"].to_pylist():
        acc += np.asarray(row, dtype=np.int64)
    return pa.table({
        "g": pa.array([0], type=pa.int32()),
        "cm_table": pa.array([acc.tolist()], type=pa.list_(pa.int64())),
        "cm_n": pa.array([int(batch["cm_n"].to_numpy().sum())],
                         type=pa.int64()),
    })


def cm_estimate_in_group(group: pa.Table, *, terms: list[str],
                         width: int = 2048, depth: int = 4) -> pa.Table:
    """Final single-group merge + point estimates for the probe terms →
    ``(term, est_count, n_total)`` (est is an upper bound on truth)."""
    from ..functions.hashing import fnv1a64_array
    merged = combine_cm_rows(group, width=width, depth=depth)
    table = np.asarray(merged["cm_table"][0].as_py(),
                       dtype=np.int64).reshape(depth, width)
    cm = CountMin(width, depth, table=table,
                  n=int(merged["cm_n"][0].as_py()))
    h = fnv1a64_array(pa.array(terms, type=pa.string()))
    est = cm.estimate(h)
    return pa.table({"term": pa.array(terms, type=pa.string()),
                     "est_count": pa.array(est, type=pa.int64()),
                     "n_total": pa.array([cm.n] * len(terms),
                                         type=pa.int64())})
