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
        bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
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
