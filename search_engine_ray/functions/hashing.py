"""Vectorized 64-bit FNV-1a over Arrow string arrays.

The reference identifies docs and terms by ``std::hash`` values
(``/root/reference/KaggleFinanceSourceEngine.cpp:131-152``).  We keep the
same "stable 64-bit identity" structure but with a seed-free, documented
algorithm (FNV-1a) so hashes are reproducible across processes and Python
versions — required for checkpoint/resume and for routing query terms to the
segment partition that owns them.

FNV is sequential per string, so we vectorize ACROSS strings: one numpy pass
per byte position (bounded by the longest string in the batch), each pass
updating every string that still has a byte at that position.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


# second-hash constants for 128-bit content identity: a DIFFERENT multiplier
# (odd 64-bit) makes the byte polynomial independent of the FNV one — two
# same-length strings colliding under one multiplier don't collide under the
# other (with the same prime, h(offset2) − h(offset1) is content-independent).
_ALT_OFFSET = np.uint64(0x9AE16A3B2F90404F)
_ALT_PRIME = np.uint64(0x9E3779B97F4A7C15)


def fnv1a64_array(strings: pa.Array | pa.ChunkedArray,
                  *, offset: np.uint64 = _FNV_OFFSET,
                  prime: np.uint64 = _FNV_PRIME) -> np.ndarray:
    """FNV-1a-style hash of each UTF-8 string in an Arrow array → uint64
    ndarray.  Default constants are standard FNV-1a; pass ``offset=_ALT_OFFSET,
    prime=_ALT_PRIME`` for an independent second hash (128-bit identity)."""
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    arr = strings
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    n = len(arr)
    out = np.full(n, offset, dtype=np.uint64)
    if n == 0:
        return out
    # Arrow string layout: int32 offsets + contiguous data buffer.
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                            count=n + 1, offset=arr.offset * 4)
    databuf = arr.buffers()[2]
    data = (np.frombuffer(databuf, dtype=np.uint8) if databuf is not None
            else np.zeros(0, dtype=np.uint8))
    starts = offsets[:-1].astype(np.int64)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    max_len = int(lengths.max()) if n else 0
    err = np.seterr(over="ignore")  # uint64 wraparound is the algorithm
    try:
        active = np.arange(n)
        for pos in range(max_len):
            active = active[lengths[active] > pos]
            if active.size == 0:
                break
            byte = data[starts[active] + pos].astype(np.uint64)
            out[active] = (out[active] ^ byte) * prime
    finally:
        np.seterr(**err)
    return out


def fnv1a64_scalar(data: bytes, *, offset: int = int(_FNV_OFFSET),
                   prime: int = int(_FNV_PRIME)) -> int:
    """Scalar twin of :func:`fnv1a64_array` (same parameterization), for
    hashing single lookup keys against vectorized-hashed columns."""
    h = offset
    for b in data:
        h ^= b
        h = (h * prime) & 0xFFFFFFFFFFFFFFFF
    return h


def key_hash128_scalar(key: str) -> tuple[int, int]:
    """128-bit (h1, h2) of a lookup key as SIGNED int64 pair, matching
    :func:`content_hash128` / the searcher's vectorized key hashing."""
    data = key.encode("utf-8")
    h1 = fnv1a64_scalar(data)
    h2 = fnv1a64_scalar(data, offset=int(_ALT_OFFSET), prime=int(_ALT_PRIME))
    return h1, h2


def content_hash128(strings: pa.Array | pa.ChunkedArray
                    ) -> tuple[np.ndarray, np.ndarray]:
    """128-bit content identity as two independent 64-bit hashes (int64
    views).  Grouping by ``(h1, h2)`` is the scale path for exact dedup: the
    shuffle carries 16 bytes per doc instead of the document text, and a
    collision requires BOTH polynomials to collide (~2^-128 per pair)."""
    h1 = fnv1a64_array(strings)
    h2 = fnv1a64_array(strings, offset=_ALT_OFFSET, prime=_ALT_PRIME)
    return h1.view(np.int64), h2.view(np.int64)


def hash_strings_to_bucket(strings: pa.Array | pa.ChunkedArray,
                           n_buckets: int) -> np.ndarray:
    """Term → partition bucket, the rebuild's analogue of the reference's
    ``word % filling_thread_count_`` shard routing (``.cpp:296``)."""
    return (fnv1a64_array(strings) % np.uint64(n_buckets)).astype(np.int32)


def doc_ids_from_urls(urls: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """docID = int63 hash of url (reference hashes ``uuid``, ``.cpp:131-133``)."""
    return (fnv1a64_array(urls) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


def _self_test() -> None:
    sample = ["", "a", "hello", "x" * 300, "naïve"]
    got = fnv1a64_array(pa.array(sample))
    want = [fnv1a64_scalar(s.encode("utf-8")) for s in sample]
    assert [int(g) for g in got] == want, (got, want)
