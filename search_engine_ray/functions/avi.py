"""Minimal stdlib AVI codec (struct + numpy): uncompressed RGB24 ("DIB ")
video in a RIFF container — the video analogue of the PCM-WAV and
stdlib-PNG real paths, so ``backend="auto"`` frame sampling has a live
branch without PyAV.

Scope: 24-bit uncompressed frames (BITMAPINFOHEADER ``biCompression=0``),
``00db``/``00dc`` movi chunks, no index required.  Layout per the public
RIFF/AVI specification: frame scanlines bottom-up, BGR byte order, rows
padded to 4 bytes.
"""

from __future__ import annotations

import struct

import numpy as np


def _row_stride(w: int) -> int:
    return ((w * 3) + 3) & ~3


def _frame_to_dib(frame: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 → bottom-up padded BGR rows."""
    h, w, _ = frame.shape
    stride = _row_stride(w)
    out = np.zeros((h, stride), dtype=np.uint8)
    out[:, : w * 3] = frame[::-1, :, ::-1].reshape(h, w * 3)
    return out.tobytes()


def _dib_to_frame(data: bytes, w: int, h: int) -> np.ndarray:
    stride = _row_stride(w)
    rows = np.frombuffer(data[: stride * h], dtype=np.uint8) \
        .reshape(h, stride)[:, : w * 3]
    return rows.reshape(h, w, 3)[::-1, :, ::-1].copy()


def _list(four: bytes, payload: bytes) -> bytes:
    body = four + payload
    return b"LIST" + struct.pack("<I", len(body)) + body


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def encode_avi(frames, *, fps: int = 10) -> bytes:
    """List of (h, w, 3) RGB uint8 arrays (equal shapes) → AVI bytes."""
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w, c = frames[0].shape
    if c != 3 or any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("all frames must be equal-shape (h, w, 3)")
    size_image = _row_stride(w) * h
    avih = struct.pack("<14I", 1_000_000 // fps, size_image * fps, 0, 0x10,
                       len(frames), 0, 1, size_image, w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIII4H", b"vids", b"DIB ", 0, 0, 0, 0,
                       1, fps, 0, len(frames), size_image, 0xFFFFFFFF, 0,
                       0, 0, w, h)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, size_image,
                       0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi = _list(b"movi", b"".join(
        _chunk(b"00db", _frame_to_dib(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(blob: bytes):
    """AVI bytes → yields (h, w, 3) RGB uint8 frames in stream order."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    w = h = None
    bitcount = compression = None

    def walk(start: int, end: int):
        nonlocal w, h, bitcount, compression
        pos = start
        while pos + 8 <= end:
            tag = blob[pos:pos + 4]
            (length,) = struct.unpack("<I", blob[pos + 4:pos + 8])
            payload_start = pos + 8
            if tag == b"LIST":
                yield from walk(payload_start + 4, payload_start + length)
            elif tag == b"strf" and length >= 24:
                (_sz, w_, h_, _planes, bitcount, compression, _szimg) = \
                    struct.unpack("<IiiHHII",
                                  blob[payload_start:payload_start + 24])
                w, h = int(w_), abs(int(h_))
            elif tag[2:4] in (b"db", b"dc") and tag[:2].isdigit():
                yield blob[payload_start:payload_start + length]
            pos = payload_start + length + (length & 1)

    for data in walk(12, 12 + struct.unpack("<I", blob[4:8])[0] - 4):
        if w is None:
            raise ValueError("frame chunk before strf header")
        if bitcount != 24 or compression != 0:
            raise ValueError(
                f"unsupported AVI (bitcount={bitcount}, "
                f"compression={compression}) — this stdlib codec handles "
                "24-bit uncompressed DIB frames")
        yield _dib_to_frame(data, w, h)
