"""Delta + varint posting-list codecs, numpy-vectorized.

Posting lists are stored docID-sorted; docIDs are delta-encoded (first value
absolute) then LEB128-varint packed; term frequencies are varint packed
directly.  This is the north-rule "posting-list compression" component
(the reference keeps postings as in-memory hash maps with no compression —
``/root/reference/SourceEngine.h:23``).

The encoders loop over BYTE POSITIONS (≤10 for 64-bit), never over values, so
a million-entry posting list costs ~10 numpy passes.
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # ceil(64 / 7)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints → packed bytes."""
    return varint_encode_with_sizes(values)[0]


def varint_encode_with_sizes(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode; also return per-value encoded byte counts.

    The sizes array lets a caller that encoded a whole bucket's postings in
    ONE vectorized pass slice the packed buffer back into per-term posting
    lists (see ``stages/postings.py``).
    """
    vals = np.asarray(values, dtype=np.uint64)
    if vals.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    if int(vals.max()) < 128:
        # all-1-byte fast path (the common case for tf columns and dense
        # local-docID deltas): the encoding IS the byte cast
        return (vals.astype(np.uint8).tobytes(),
                np.ones(vals.shape, dtype=np.int64))
    # bytes needed per value: smallest k with value < 128**k
    nbytes = np.ones(vals.shape, dtype=np.int64)
    threshold = np.uint64(128)
    for _ in range(_MAX_VARINT_BYTES - 1):
        mask = vals >= threshold
        if not mask.any():
            break
        nbytes[mask] += 1
        if threshold >= np.uint64(1) << np.uint64(57):
            # next threshold would overflow uint64; values >= 2**57*... handled
            break
        threshold = threshold << np.uint64(7)
    starts = np.cumsum(nbytes) - nbytes
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    # k = 0 writes EVERY value (nbytes >= 1 always) — index by starts
    # directly instead of materializing an all-true mask's indices
    out[starts] = ((vals & np.uint64(0x7F)).astype(np.uint8)
                   | ((nbytes > 1).astype(np.uint8) << 7))
    for k in range(1, int(nbytes.max())):
        mask = nbytes > k
        chunk = (vals[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[starts[mask] + k] = chunk.astype(np.uint8) | cont
    return out.tobytes(), nbytes


def varint_decode(data: bytes | np.ndarray) -> np.ndarray:
    """Inverse of :func:`varint_encode` → uint64 array.

    Accepts a CONCATENATION of independently encoded streams too (the
    boundary between values is self-delimiting), which lets a caller decode
    a whole segment's posting lists in one vectorized pass.
    """
    return varint_decode_with_ends(data)[0]


def varint_decode_with_ends(data: bytes | np.ndarray
                            ) -> tuple[np.ndarray, np.ndarray]:
    """:func:`varint_decode` that also returns each value's terminal byte
    position (callers slicing a concatenated stream by byte offsets map
    them to value indices with one searchsorted — no second buffer scan)."""
    buf = (data if isinstance(data, np.ndarray)
           else np.frombuffer(data, dtype=np.uint8))
    if buf.size == 0:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    ends = np.flatnonzero(buf < 128)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    # 1-byte values (the posting-list majority: dense local-docID deltas and
    # small tfs) decode as a single gather; multi-byte stragglers are
    # grouped by encoded length — lengths are ≤10, so a bincount histogram
    # (NOT an np.unique sort of the whole array) picks the classes, and each
    # class decodes as one contiguous (m, L) gather + shift-reduce.
    vals = buf[ends].astype(np.uint64)
    multi = np.flatnonzero(lengths > 1)
    if multi.size:
        mlen = lengths[multi]
        shifts = np.uint64(7) * np.arange(_MAX_VARINT_BYTES, dtype=np.uint64)
        counts = np.bincount(mlen, minlength=_MAX_VARINT_BYTES + 1)
        for L in range(2, len(counts)):
            if not counts[L]:
                continue
            sel = multi[mlen == L]
            idx = starts[sel][:, None] + np.arange(L)
            b = (buf[idx] & np.uint8(0x7F)).astype(np.uint64)
            b <<= shifts[:L]
            vals[sel] = np.bitwise_or.reduce(b, axis=1)
    return vals, ends


def delta_encode(sorted_values: np.ndarray) -> bytes:
    """Varint-pack deltas of an ascending uint64 array (first value absolute)."""
    vals = np.asarray(sorted_values, dtype=np.uint64)
    if vals.size == 0:
        return b""
    deltas = np.empty_like(vals)
    deltas[0] = vals[0]
    np.subtract(vals[1:], vals[:-1], out=deltas[1:])
    return varint_encode(deltas)


def delta_decode(data: bytes) -> np.ndarray:
    """Inverse of :func:`delta_encode` → ascending uint64 array."""
    deltas = varint_decode(data)
    if deltas.size == 0:
        return deltas
    return np.cumsum(deltas, dtype=np.uint64)
