"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Large-scale training-data dedup expressed Ray-Data-first:

- **exact**: ``groupby(text-key)`` with min-docID keeper — one shuffle keyed
  by content hash (the scale path groups by a 64-bit content hash so the
  shuffle never moves document text).
- **MinHash+LSH**: stateless ``map_batches`` computes word-shingle minhash
  signatures and emits one row per LSH band; a ``groupby(band, bucket)``
  shuffle colocates collision candidates; candidate pairs are verified with
  exact shingle Jaccard over only the candidate docs (candidates ≪ corpus).
- **SimHash**: 64-bit tf-weighted simhash per doc; candidate generation via
  the standard 4×16-bit chunk tables (any pair within Hamming distance ≤3
  shares at least one exact chunk), verified by full Hamming distance.

All signature math is numpy over the batch's token stream; nothing loops
over rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import fnv1a64_array
from .tokenize import split_and_normalize

_MERSENNE61 = np.uint64((1 << 61) - 1)


def _minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_mults(k: int) -> np.ndarray:
    """``k`` distinct odd 64-bit mix multipliers.  The first five are the
    original fixed constants (existing shingle hashes / goldens depend on
    them); beyond five, constants come from a splitmix64-style scramble of
    the position — any ``k`` works instead of the former hard IndexError
    at ``k > 5``."""
    fixed = [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
             0x165667B19E3779F9, 0x27D4EB2F165667C5,
             0x85EBCA77C2B2AE63]
    if k <= len(fixed):
        return np.array(fixed[:k], dtype=np.uint64)
    out = np.empty(k, dtype=np.uint64)
    out[:len(fixed)] = fixed
    for j in range(len(fixed), k):
        z = (np.uint64(j) * np.uint64(0x9E3779B97F4A7C15)) \
            + np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        out[j] = (z ^ (z >> np.uint64(31))) | np.uint64(1)   # odd
    return out


def shingle_hashes(row_idx: np.ndarray, term_hashes: np.ndarray,
                   n_rows: int, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Word k-shingles per doc → (shingle_row_idx, shingle_hash uint64).

    A shingle hash combines k consecutive token hashes with distinct odd
    multipliers; shingles never cross doc boundaries.  Docs with fewer than
    k tokens contribute their whole-doc token sequence as one shingle.
    """
    n_tok = len(term_hashes)
    if n_tok == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint64)
    err = np.seterr(over="ignore")
    try:
        mults = _shingle_mults(k)
        # windows fully inside one doc: window [i, i+k) valid iff row_idx[i] == row_idx[i+k-1]
        if n_tok >= k:
            valid = row_idx[: n_tok - k + 1] == row_idx[k - 1:]
            acc = np.zeros(n_tok - k + 1, dtype=np.uint64)
            for j in range(k):
                acc ^= term_hashes[j: n_tok - k + 1 + j] * mults[j]
            win_rows = row_idx[: n_tok - k + 1][valid]
            win_hashes = acc[valid]
        else:
            win_rows = np.zeros(0, dtype=np.int64)
            win_hashes = np.zeros(0, dtype=np.uint64)
        # short docs (len < k): one shingle = mixed hash of all tokens
        counts = np.bincount(row_idx, minlength=n_rows)
        short = np.flatnonzero((counts > 0) & (counts < k))
        if short.size:
            starts = np.zeros(n_rows, dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            sh = np.zeros(short.size, dtype=np.uint64)
            for j in range(k - 1):
                sel = counts[short] > j
                sh[sel] ^= term_hashes[starts[short[sel]] + j] * mults[j]
            win_rows = np.concatenate([win_rows, short])
            win_hashes = np.concatenate([win_hashes, sh])
        return win_rows.astype(np.int64), win_hashes
    finally:
        np.seterr(**err)


class MinHashLSH:
    """documents batch → one row per (doc, band): ``(band, bucket, doc_id)``.

    ``num_perm`` minhash permutations split into ``bands`` bands of
    ``num_perm // bands`` rows; ``bucket`` is the hash of the band's slice of
    the signature.  Downstream: ``groupby(['band','bucket'])`` colocates LSH
    collision candidates.

    ``carry_shingles=True`` replicates each doc's SORTED UNIQUE shingle-hash
    set (``shingles: list<int64>``) onto its band rows, so the downstream
    group DELIVERS everything the exact-Jaccard verifier needs — no
    driver-side collection of candidate texts (the round-2 scale gap).
    Shipping the shingle set ``bands``× through the shuffle is the standard
    LSH locality trade, the same one ``HyperplaneLSH(carry_vec=True)``
    makes for embeddings (stages/similarity.py).
    """

    def __init__(self, *, text_col: str = "text", id_col: str = "doc_id",
                 num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                 seed: int = 42, carry_shingles: bool = False):
        assert num_perm % bands == 0
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.carry_shingles = carry_shingles
        self.a, self.b = _minhash_params(num_perm, seed)

    def signatures(self, batch: pa.Table, *, return_shingles: bool = False):
        """→ (doc_ids kept, signature matrix [n_kept, num_perm]) for docs
        with at least one token; with ``return_shingles`` also the per-doc
        sorted-unique shingle sets as ``(values uint64, offsets int64)``
        aligned with the kept docs."""
        n = batch.num_rows
        row_idx, terms = split_and_normalize(batch[self.text_col])
        th = fnv1a64_array(terms)
        s_rows, s_hashes = shingle_hashes(row_idx, th, n, self.shingle_k)
        doc_ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if s_rows.size == 0:
            empty = (np.zeros(0, dtype=np.int64),
                     np.zeros((0, self.num_perm), np.uint64))
            if return_shingles:
                return empty + ((np.zeros(0, np.uint64),
                                 np.zeros(1, np.int64)),)
            return empty
        order = np.argsort(s_rows, kind="stable")
        s_rows, s_hashes = s_rows[order], s_hashes[order]
        boundaries = np.flatnonzero(np.r_[True, np.diff(s_rows) != 0])
        kept_rows = s_rows[boundaries]
        err = np.seterr(over="ignore")
        try:
            x = (s_hashes & _MERSENNE61)
            sig = np.empty((kept_rows.size, self.num_perm), dtype=np.uint64)
            for p in range(self.num_perm):
                hp = (self.a[p] * x + self.b[p]) & _MERSENNE61
                sig[:, p] = np.minimum.reduceat(hp, boundaries)
        finally:
            np.seterr(**err)
        if not return_shingles:
            return doc_ids[kept_rows], sig
        # per-doc SET of shingle hashes, sorted: lexsort + consecutive dedup
        o2 = np.lexsort((s_hashes, s_rows))
        r2, h2 = s_rows[o2], s_hashes[o2]
        keep = np.r_[True, (r2[1:] != r2[:-1]) | (h2[1:] != h2[:-1])]
        r2, h2 = r2[keep], h2[keep]
        counts = np.bincount(r2, minlength=n)[kept_rows]
        offsets = np.zeros(kept_rows.size + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        return doc_ids[kept_rows], sig, (h2, offsets)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.carry_shingles:
            ids, sig, (sh_vals, sh_off) = self.signatures(
                batch, return_shingles=True)
        else:
            ids, sig = self.signatures(batch)
        if ids.size == 0:
            cols = {"band": pa.array([], type=pa.int32()),
                    "bucket": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64())}
            if self.carry_shingles:
                cols["shingles"] = pa.array([], type=pa.list_(pa.int64()))
            return pa.table(cols)
        err = np.seterr(over="ignore")
        try:
            # hash each band's slice: mix the r values with FNV-ish fold
            buckets = np.empty((ids.size, self.bands), dtype=np.uint64)
            for band in range(self.bands):
                sl = sig[:, band * self.rows_per_band:(band + 1) * self.rows_per_band]
                h = np.full(ids.size, np.uint64(0xCBF29CE484222325))
                for r in range(self.rows_per_band):
                    h = (h ^ sl[:, r]) * np.uint64(0x100000001B3)
                buckets[:, band] = h
        finally:
            np.seterr(**err)
        cols = {
            "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32),
                                     ids.size), type=pa.int32()),
            "bucket": pa.array((buckets.reshape(-1).astype(np.int64)
                                & 0x7FFFFFFFFFFFFFFF), type=pa.int64()),
            "doc_id": pa.array(np.repeat(ids, self.bands), type=pa.int64()),
        }
        if self.carry_shingles:
            sets = pa.ListArray.from_arrays(
                pa.array(sh_off, type=pa.int32()),
                pa.array(sh_vals.view(np.int64), type=pa.int64()))
            rep = pa.array(np.repeat(np.arange(ids.size, dtype=np.int64),
                                     self.bands))
            cols["shingles"] = sets.take(rep)
        return pa.table(cols)


def candidate_pairs_from_group(group: pa.Table,
                               max_group: int = 2048) -> pa.Table:
    """``groupby(['band','bucket']).map_groups`` callable: docs sharing an
    LSH bucket → unique candidate pairs ``(doc_a, doc_b)``, ``doc_a < doc_b``.

    ``max_group`` caps pathological buckets (all-identical spam at web
    scale): oversized groups emit pairs only against the smallest docID
    (star expansion) instead of the quadratic all-pairs.
    """
    ids = np.unique(group["doc_id"].to_numpy(zero_copy_only=False))
    if ids.size < 2:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64())})
    if ids.size > max_group:
        a = np.full(ids.size - 1, ids[0])
        b = ids[1:]
    else:
        iu = np.triu_indices(ids.size, k=1)
        a, b = ids[iu[0]], ids[iu[1]]
    return pa.table({"doc_a": pa.array(a, type=pa.int64()),
                     "doc_b": pa.array(b, type=pa.int64())})


def verify_jaccard_in_group(group: pa.Table, *, threshold: float = 0.5,
                            max_group: int = 2048) -> pa.Table:
    """``groupby(['band','bucket']).map_groups`` callable over
    shingle-carrying band rows (``MinHashLSH(carry_shingles=True)``):
    candidate pairs AND their exact shingle-set Jaccard, entirely inside the
    group — the distributed replacement for driver-side text collection.

    Pair policy matches :func:`candidate_pairs_from_group` exactly (unique
    docs, all pairs up to ``max_group``, star expansion beyond), so the
    surviving pair set is identical to the round-2 collect-then-verify
    pipeline.  Pairs below ``threshold`` are dropped HERE, so only true
    near-duplicates flow back to the driver."""
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                      "doc_b": pa.array([], type=pa.int64()),
                      "jaccard": pa.array([], type=pa.float64())})
    if ids.size < 2:
        return empty
    order = np.argsort(ids, kind="stable")
    first = np.ones(ids.size, dtype=bool)
    first[1:] = ids[order][1:] != ids[order][:-1]
    sel = order[first]                      # first row of each unique doc
    uids = ids[sel]
    if uids.size < 2:
        return empty
    sh = group["shingles"].combine_chunks() \
        if isinstance(group["shingles"], pa.ChunkedArray) else group["shingles"]
    # the carried sets ride as Arrow int64 but were built SORTED IN UINT64
    # order (they are uint64 hashes) — reinterpret so the sorted-merge
    # intersection below sees a monotone array (as int64, hashes ≥ 2^63
    # wrap negative and break monotonicity)
    flat = sh.flatten().to_numpy(zero_copy_only=False).view(np.uint64)
    offs = sh.offsets.to_numpy(zero_copy_only=False)
    offs = offs - offs[0]       # rebase: sliced arrays keep raw offsets

    def sset(i: int) -> np.ndarray:
        return flat[offs[sel[i]]:offs[sel[i] + 1]]

    if uids.size > max_group:               # pathological bucket: star
        a_idx = np.zeros(uids.size - 1, dtype=np.int64)
        b_idx = np.arange(1, uids.size)
    else:
        iu = np.triu_indices(uids.size, k=1)
        a_idx, b_idx = iu[0], iu[1]
    jac = np.zeros(a_idx.size, dtype=np.float64)
    for p in range(a_idx.size):
        sa, sb = sset(int(a_idx[p])), sset(int(b_idx[p]))
        union = sa.size + sb.size
        if union:
            # the carried shingle sets are SORTED UNIQUE (signatures()
            # emits them that way), so intersect by searching the smaller
            # into the larger — intersect1d would re-sort both sets for
            # every pair, which a full max_group bucket (~2M pairs) pays
            # dearly for
            if sb.size < sa.size:
                sa, sb = sb, sa
            pos = np.searchsorted(sb, sa)
            ok = pos < sb.size
            inter = int(np.count_nonzero(sb[pos[ok]] == sa[ok]))
            jac[p] = inter / (union - inter)
    keep = jac >= threshold
    if not keep.any():
        return empty
    return pa.table({"doc_a": pa.array(uids[a_idx[keep]], type=pa.int64()),
                     "doc_b": pa.array(uids[b_idx[keep]], type=pa.int64()),
                     "jaccard": pa.array(jac[keep], type=pa.float64())})


def exact_jaccard(texts_by_id: dict[int, str], pairs: np.ndarray,
                  k: int = 3) -> np.ndarray:
    """Exact shingle-set Jaccard for candidate verification (driver-side;
    candidate docs ≪ corpus)."""
    shingles: dict[int, set] = {}
    for doc_id, text in texts_by_id.items():
        row_idx, terms = split_and_normalize(pa.array([text]))
        th = fnv1a64_array(terms)
        _r, sh = shingle_hashes(row_idx, th, 1, k)
        shingles[doc_id] = set(sh.tolist())
    out = np.zeros(len(pairs), dtype=np.float64)
    for i, (a, b) in enumerate(pairs):
        sa, sb = shingles.get(int(a), set()), shingles.get(int(b), set())
        union = len(sa | sb)
        out[i] = (len(sa & sb) / union) if union else 0.0
    return out


class SimHash:
    """documents batch → ``(doc_id, simhash, chunk0..chunk3)``.

    64-bit tf-weighted simhash; the four 16-bit chunks are the standard
    candidate keys: any pair with Hamming distance ≤3 agrees exactly on at
    least one chunk (pigeonhole), so a ``groupby(chunk_i)`` per table finds
    all such pairs.
    """

    def __init__(self, *, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        row_idx, terms = split_and_normalize(batch[self.text_col])
        th = fnv1a64_array(terms)
        acc = np.zeros((n, 64), dtype=np.int64)
        if len(th):
            for bit in range(64):
                contrib = (((th >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2 - 1)
                acc[:, bit] = np.bincount(row_idx, weights=contrib, minlength=n)
        bits = (acc > 0).astype(np.uint64)
        sh = np.zeros(n, dtype=np.uint64)
        # 63 bits only, so the stored int64 simhash and the chunk keys are
        # consistent (no sign-mask divergence on bit 63)
        for bit in range(63):
            sh |= bits[:, bit] << np.uint64(bit)
        cols = {
            "doc_id": batch[self.id_col].cast(pa.int64()),
            "simhash": pa.array((sh.astype(np.int64) & 0x7FFFFFFFFFFFFFFF),
                                type=pa.int64()),
        }
        for c in range(4):
            cols[f"chunk{c}"] = pa.array(
                ((sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int32),
                type=pa.int32())
        return pa.table(cols)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.astype(np.uint64)) ^ (b.astype(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    while True:
        nz = x != 0
        if not nz.any():
            break
        cnt[nz] += 1
        x = x & (x - np.uint64(1))
    return cnt
