"""Minimal stdlib PNG codec (zlib + numpy): the image analogue of the
PCM-WAV audio path — a REAL container format the multimodal stages can
decode without PIL, so ``backend="auto"`` has a live image branch in
codec-less environments.

Scope (deliberate): 8-bit depth, color types 0 (gray), 2 (RGB), 4
(gray+alpha), 6 (RGBA), no interlace, no palette — the subset every PNG
encoder in a data pipeline actually emits.  All five scanline filters
(None/Sub/Up/Average/Paeth, PNG spec §9) are implemented on both sides;
the public-domain algorithm definitions come from the W3C PNG spec.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}          # channels -> color type
_CHANNELS = {v: k for k, v in _COLOR_TYPE.items()}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (a=left, b=up,
    c=up-left; all int16+)."""
    p = a + b - c
    pa_, pb, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc_), a,
                   np.where(pb <= pc_, b, c))
    return out


def _filter_row(ftype: int, raw: np.ndarray, prev: np.ndarray,
                bpp: int) -> np.ndarray:
    """Apply filter ``ftype`` to one RAW scanline (uint8) given the RAW
    previous scanline — filters are defined on unfiltered bytes, so the
    encoder needs no reconstruction loop."""
    r = raw.astype(np.int16)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prev.astype(np.int16)
    upleft = np.zeros_like(r)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - up
    elif ftype == 3:
        out = r - ((left + up) // 2)
    elif ftype == 4:
        out = r - _paeth(left, up, upleft)
    else:
        raise ValueError(f"bad filter {ftype}")
    return (out % 256).astype(np.uint8)


def encode_png(arr: np.ndarray, *, filter_type: int | str = 0) -> bytes:
    """uint8 ``(h, w)`` or ``(h, w, c)`` with c in {1, 2, 3, 4} → PNG bytes.
    ``filter_type``: 0–4 for one filter everywhere, or ``"mixed"`` to cycle
    through all five (exercises every decoder branch)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    bpp = c
    prev = np.zeros(w * c, dtype=np.uint8)
    lines = []
    for y in range(h):
        raw = a[y].reshape(-1)
        ft = (y % 5) if filter_type == "mixed" else int(filter_type)
        lines.append(bytes([ft]) + _filter_row(ft, raw, prev, bpp).tobytes())
        prev = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    return (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _chunk(b"IEND", b""))


def decode_png(blob: bytes) -> np.ndarray:
    """PNG bytes → uint8 ``(h, w, c)``.  Supports the scope in the module
    docstring; raises ValueError outside it."""
    if blob[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    ctype = None
    idat = []
    while pos + 8 <= len(blob):
        (length,), tag = struct.unpack(">I", blob[pos:pos + 4]), \
            blob[pos + 4:pos + 8]
        payload = blob[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", payload)
            if depth != 8 or interlace or ctype not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={ctype}, "
                    f"interlace={interlace}) — this stdlib codec handles "
                    "8-bit gray/RGB/gray+alpha/RGBA, non-interlaced")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG")
    c = _CHANNELS[ctype]
    stride = w * c
    data = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if data.size != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    data = data.reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ft = int(data[y, 0])
        f = data[y, 1:].astype(np.int16)
        if ft == 0:
            rec = f
        elif ft == 2:
            rec = (f + prev) % 256
        elif ft in (1, 3, 4):
            # left-dependent filters reconstruct pixel-group-sequentially
            rec = np.zeros(stride, dtype=np.int16)
            for x in range(0, stride, c):
                left = rec[x - c:x] if x else np.zeros(c, dtype=np.int16)
                up = prev[x:x + c]
                upleft = (prev[x - c:x] if x
                          else np.zeros(c, dtype=np.int16))
                seg = f[x:x + c]
                if ft == 1:
                    rec[x:x + c] = (seg + left) % 256
                elif ft == 3:
                    rec[x:x + c] = (seg + (left + up) // 2) % 256
                else:
                    rec[x:x + c] = (seg + _paeth(left, up, upleft)) % 256
        else:
            raise ValueError(f"bad filter {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w, c)
