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
    for k in range(int(nbytes.max())):
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
    buf = (data if isinstance(data, np.ndarray)
           else np.frombuffer(data, dtype=np.uint8))
    if buf.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_end = buf < 128
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    multi = np.flatnonzero(lengths > 1)
    # fast path — nearly every value fits one byte.  This is the
    # POSTING-LIST hot case (head-term docID deltas and tfs are tiny; only
    # the absolute first docID and rare large gaps go multi-byte): one
    # vectorized gather for the 1-byte majority + a scalar loop over the
    # handful of stragglers cuts a cold 400k-entry decode ~5×.
    if multi.size * 16 < ends.size:
        vals = buf[ends].astype(np.uint64)
        for i in multi:
            v = 0
            for k in range(int(lengths[i]) - 1, -1, -1):
                v = (v << 7) | int(buf[starts[i] + k] & 0x7F)
            vals[i] = v
        return vals
    # generic path, grouped by encoded length: posting docID deltas over a
    # hashed 64-bit id space are almost all the SAME width (e.g. 7 bytes),
    # so one contiguous (m, L) gather + shift-reduce per length class beats
    # a per-byte-position masked loop ~4× on segment-load-sized inputs.
    vals = np.zeros(ends.size, dtype=np.uint64)
    shifts = np.uint64(7) * np.arange(_MAX_VARINT_BYTES, dtype=np.uint64)
    for L in np.unique(lengths):
        sel = np.flatnonzero(lengths == L)
        idx = starts[sel][:, None] + np.arange(int(L))
        b = (buf[idx] & np.uint8(0x7F)).astype(np.uint64)
        b <<= shifts[: int(L)]
        vals[sel] = np.bitwise_or.reduce(b, axis=1)
    return vals


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
