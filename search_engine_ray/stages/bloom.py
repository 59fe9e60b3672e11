"""Bloom filter (Bloom 1970, public algorithm): mergeable membership
prefilter for incremental corpus dedup.

Scale story (the reason this exists next to the exact
``dedup_incremental``): the exact variant shuffles BOTH sides' 16-byte
content hashes — at 100 TB the corpus side of that shuffle dominates every
recurring ingest even though the corpus itself never changes.  The bloom
shape removes it:

1. ONE streaming pass over the corpus builds fixed-size filter partials
   (one ``m/8``-byte bitmap row per batch, OR-mergeable in any order —
   bitwise OR is exactly batching/order invariant), tree-combined to a
   single filter that is broadcast via ``ray.put``.  In production the
   filter is built once and persisted beside the corpus; each nightly
   ingest just loads it.
2. The NEW batch (small by definition — it's an increment) groups by
   content hash (a shuffle of the small side only) and probes the filter:
   bloom-NEGATIVE groups are definitely-new → kept with no further work.
3. Only bloom-POSITIVE groups (true duplicates + the tiny false-positive
   tail, ~(nk/m)^k of the batch) are verified exactly against a second
   corpus streaming pass with the candidate hashes broadcast — so the
   final output is EXACT (same rows as the exact variant, same SQL
   oracle), while no corpus row ever enters a shuffle.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

_BLOOM_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
     0x27D4EB2F165667C5, 0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53,
     0x2545F4914F6CDD1D, 0xD6E8FEB86659FD93], dtype=np.uint64)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


class Bloom:
    """m-bit filter (m a multiple of 64), k probe positions per item
    derived by splitmix-mixing the item's 64-bit content hash with k
    fixed seeds.  ``bits`` is a uint64 word array; merge = bitwise OR."""

    __slots__ = ("m_bits", "k", "bits")

    def __init__(self, m_bits: int = 1 << 20, k: int = 6,
                 bits: np.ndarray | None = None):
        assert m_bits % 64 == 0 and k <= len(_BLOOM_SEEDS)
        self.m_bits = m_bits
        self.k = k
        self.bits = (bits if bits is not None
                     else np.zeros(m_bits // 64, dtype=np.uint64))

    def _positions(self, h: np.ndarray) -> np.ndarray:
        """(k, n) bit positions."""
        h = np.ascontiguousarray(h).view(np.uint64)
        return np.stack([
            _splitmix64(h ^ _BLOOM_SEEDS[i]) % np.uint64(self.m_bits)
            for i in range(self.k)])

    def add(self, h: np.ndarray) -> "Bloom":
        if h.size == 0:
            return self
        pos = self._positions(h).ravel()
        words, off = pos >> np.uint64(6), pos & np.uint64(63)
        np.bitwise_or.at(self.bits, words.astype(np.int64),
                         np.uint64(1) << off)
        return self

    def contains(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership: True = maybe present, False = definitely
        absent."""
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(h)
        words, off = pos >> np.uint64(6), pos & np.uint64(63)
        hit = (self.bits[words.astype(np.int64)]
               >> off) & np.uint64(1)
        return (hit == 1).all(axis=0)

    def merge(self, other: "Bloom") -> "Bloom":
        self.bits |= other.bits
        return self


class PartialBloom:
    """``map_batches`` callable over hash rows ``(h1,)`` (int64 content
    hashes) → ONE fixed-size partial-filter row per batch (the packed
    bitmap as a binary cell)."""

    def __init__(self, *, hash_col: str = "h1", m_bits: int = 1 << 20,
                 k: int = 6):
        self.hash_col = hash_col
        self.m_bits = m_bits
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = Bloom(self.m_bits, self.k)
        b.add(batch[self.hash_col].to_numpy(zero_copy_only=False))
        return pa.table({
            "g": pa.array([0], type=pa.int32()),
            "bloom_bits": pa.array([b.bits.tobytes()], type=pa.binary()),
        })


def combine_bloom_rows(batch: pa.Table, *, m_bits: int = 1 << 20
                       ) -> pa.Table:
    """Tree-combine level: OR up to batch_size partial bitmaps into one."""
    if batch.num_rows <= 1:
        return batch
    acc = np.zeros(m_bits // 64, dtype=np.uint64)
    for cell in batch["bloom_bits"]:
        acc |= np.frombuffer(cell.as_py(), dtype=np.uint64)
    return pa.table({
        "g": pa.array([0], type=pa.int32()),
        "bloom_bits": pa.array([acc.tobytes()], type=pa.binary()),
    })


def build_bloom(hash_ds: "ray.data.Dataset", *, hash_col: str = "h1",
                m_bits: int = 1 << 20, k: int = 6) -> Bloom:
    """Corpus hash rows → one merged :class:`Bloom`.  The driver collects
    only tree-combined FIXED-SIZE bitmap rows (a handful of ``m/8``-byte
    cells), never corpus rows."""
    rows = (hash_ds
            .map_batches(PartialBloom(hash_col=hash_col, m_bits=m_bits,
                                      k=k),
                         batch_format="pyarrow", batch_size=8192)
            .map_batches(functools.partial(combine_bloom_rows,
                                           m_bits=m_bits),
                         batch_format="pyarrow", batch_size=64)
            .take_all())
    out = Bloom(m_bits, k)
    for r in rows:
        out.bits |= np.frombuffer(r["bloom_bits"], dtype=np.uint64)
    return out
