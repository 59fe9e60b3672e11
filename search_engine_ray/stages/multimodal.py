"""Multimodal (image / audio / video) operators over opaque binary columns.

Pattern for 100 TB media pipelines: the payload is an opaque ``binary``
column with typed metadata columns beside it; decode / resize / feature
extraction / frame sampling are **actor-pool** ``map_batches`` stages
(codec state initialised once per actor in ``__init__``), run with SMALL
``batch_size`` so batch × concurrency fits the worker heap.

Codec backends (``backend=`` on every stage):

- ``"fake"`` (default, used by tests/benches) operates on the
  deterministic FAKE container formats below — the Ray-side plumbing
  (schemas, actor signatures, batch sizing, output layout) is real and
  tested either way.
- ``"real"`` decodes actual containers — PIL for images, soundfile (or the
  stdlib ``wave`` module for PCM WAV) for audio, PyAV for video — and
  raises ``NotImplementedError`` when the library is missing.
- ``"auto"`` resolves to ``"real"`` when the library imports, else
  ``"fake"``.  Resolution happens in ``__init__``, i.e. ON THE WORKER for
  actor-pool deployments, so a heterogeneous cluster picks the right
  kernel per node.

FAKE container formats (little-endian):

- image  ``FIMG``: magic(4) | uint16 w | uint16 h | uint8 channels | pixels
  (w*h*channels uint8, row-major)
- audio  ``FAUD``: magic(4) | uint32 sample_rate | int16 samples[]
- video  ``FVID``: magic(4) | uint16 n_frames | n_frames × (uint32 len,
  FIMG blob)
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------------------
# synthetic payload generators (deterministic; tests and benches)
# ---------------------------------------------------------------------------

def make_fake_image(w: int, h: int, channels: int = 3, seed: int = 0) -> bytes:
    rng = np.random.Generator(np.random.Philox(
        key=[seed, (w << 32) | (h << 16) | channels]))
    pixels = rng.integers(0, 256, size=w * h * channels, dtype=np.uint8)
    return b"FIMG" + struct.pack("<HHB", w, h, channels) + pixels.tobytes()


def make_fake_audio(n_samples: int, sample_rate: int = 16000,
                    seed: int = 0) -> bytes:
    rng = np.random.Generator(np.random.Philox(key=[seed, n_samples]))
    samples = rng.integers(-2000, 2000, size=n_samples, dtype=np.int16)
    return b"FAUD" + struct.pack("<I", sample_rate) + samples.tobytes()


def make_fake_video(n_frames: int, w: int = 16, h: int = 12,
                    seed: int = 0) -> bytes:
    out = [b"FVID", struct.pack("<H", n_frames)]
    for i in range(n_frames):
        f = make_fake_image(w, h, 3, seed=seed * 1000 + i)
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def _decode_fake_image(blob: bytes) -> np.ndarray:
    assert blob[:4] == b"FIMG", "not a FIMG payload"
    w, h, c = struct.unpack("<HHB", blob[4:9])
    return np.frombuffer(blob[9:9 + w * h * c], dtype=np.uint8).reshape(h, w, c)


def _image_lib():
    try:
        from PIL import Image
        return Image
    except ImportError:
        # stdlib PNG codec (zlib + numpy, functions/png.py) — a real
        # container format, always on; mirrors the wave fallback for audio
        from ..functions import png
        return png


def _audio_lib():
    try:
        import soundfile
        return soundfile
    except ImportError:
        # PCM WAV decodes with the stdlib — a real container, always on
        import wave
        return wave


def _video_lib():
    try:
        import av
        return av
    except ImportError:
        # stdlib AVI codec (RIFF, uncompressed RGB24 DIB frames,
        # functions/avi.py) — a real container format, always on
        from ..functions import avi
        return avi


def _resolve_backend(backend: str, lib, lib_name: str) -> str:
    """``auto`` → real when the codec library imports, else fake; ``real``
    raises when it doesn't.  Called from stage ``__init__``, which runs on
    the WORKER for actor-pool ``map_batches`` deployments."""
    if backend == "fake":
        return "fake"
    if backend == "auto":
        return "real" if lib is not None else "fake"
    if backend == "real":
        if lib is None:
            raise NotImplementedError(
                f"backend='real' needs {lib_name}, which is not available "
                f"in this environment; the Ray plumbing is identical — "
                f"use backend='auto' to fall back to the fake codec")
        return "real"
    raise ValueError(f"unknown backend {backend!r}")


# ---------------------------------------------------------------------------
# actor-pool stages
# ---------------------------------------------------------------------------

class DecodeImageStats:
    """images batch ``(id, image:binary)`` → ``(id, width, height, channels,
    mean_pixel)``.  Deploy as ``map_batches(DecodeImageStats(), concurrency=N,
    batch_size=64)`` — media batches stay small (SURVEY memory-aware rule)."""

    def __init__(self, *, backend: str = "fake", image_col: str = "image",
                 id_col: str = "doc_id"):
        self._pil = _image_lib()
        self.backend = _resolve_backend(backend, self._pil, "PIL")
        self.image_col = image_col
        self.id_col = id_col

    def _decode(self, blob: bytes) -> np.ndarray:
        # synthetic FIMG payloads route to the fake codec even under
        # `auto`→real (same rule as the FAUD audio path)
        if self.backend == "fake" or blob[:4] == b"FIMG":
            return _decode_fake_image(blob)
        if hasattr(self._pil, "decode_png"):       # stdlib PNG fallback
            return self._pil.decode_png(blob)
        import io
        px = np.asarray(self._pil.open(io.BytesIO(blob)))
        return px[:, :, None] if px.ndim == 2 else px

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, chans, means = [], [], [], []
        for blob in batch[self.image_col].to_pylist():
            px = self._decode(blob)
            h, w, c = px.shape
            widths.append(w); heights.append(h); chans.append(c)
            means.append(float(px.mean()))
        return pa.table({
            "doc_id": batch[self.id_col].cast(pa.int64()),
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "channels": pa.array(chans, type=pa.int32()),
            "mean_pixel": pa.array(np.round(means, 6), type=pa.float64()),
        })


class ResizeImage:
    """images batch → same schema with the payload resized to
    ``(out_w, out_h)`` (fake kernel: nearest-neighbour index sampling —
    deterministic, shape-correct)."""

    def __init__(self, out_w: int, out_h: int, *, backend: str = "fake",
                 image_col: str = "image", id_col: str = "doc_id"):
        self._pil = _image_lib()
        self.backend = _resolve_backend(backend, self._pil, "PIL")
        self.out_w, self.out_h = out_w, out_h
        self.image_col = image_col
        self.id_col = id_col

    def _resize(self, blob: bytes) -> bytes:
        if self.backend == "real":
            import io
            img = self._pil.open(io.BytesIO(blob))
            img = img.resize((self.out_w, self.out_h),
                             self._pil.Resampling.NEAREST)
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            return buf.getvalue()
        px = _decode_fake_image(blob)
        h, w, c = px.shape
        yi = (np.arange(self.out_h) * h // self.out_h)
        xi = (np.arange(self.out_w) * w // self.out_w)
        res = px[yi][:, xi]
        return (b"FIMG" + struct.pack("<HHB", self.out_w, self.out_h, c)
                + res.tobytes())

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self._resize(blob)
               for blob in batch[self.image_col].to_pylist()]
        return pa.table({
            "doc_id": batch[self.id_col].cast(pa.int64()),
            "image": pa.array(out, type=pa.binary()),
        })


class AudioFeatures:
    """audio batch ``(id, audio:binary)`` → ``(id, sample_rate, duration_s,
    rms)``."""

    def __init__(self, *, backend: str = "fake", audio_col: str = "audio",
                 id_col: str = "doc_id"):
        self._lib = _audio_lib()
        self.backend = _resolve_backend(backend, self._lib,
                                        "soundfile or stdlib wave")
        self.audio_col = audio_col
        self.id_col = id_col

    def _decode(self, blob: bytes) -> tuple[int, np.ndarray]:
        # Per-blob sniff: stdlib `wave` always imports, so `auto` resolves
        # to `real` even on synthetic corpora — route FAUD payloads to the
        # fake codec here so auto degrades per blob like the image/video
        # stages degrade per library.
        if self.backend == "fake" or blob[:4] == b"FAUD":
            assert blob[:4] == b"FAUD"
            (sr,) = struct.unpack("<I", blob[4:8])
            return sr, np.frombuffer(blob[8:], dtype=np.int16) \
                .astype(np.float64)
        import io
        if self._lib.__name__ == "soundfile":
            # int16 keeps raw PCM amplitude (float dtypes normalize to ±1),
            # matching the stdlib-wave path
            data, sr = self._lib.read(io.BytesIO(blob), dtype="int16")
            data = data.astype(np.float64)
            return sr, data.mean(axis=1) if data.ndim == 2 else data
        with self._lib.open(io.BytesIO(blob), "rb") as w:  # stdlib wave
            sr = w.getframerate()
            width = w.getsampwidth()
            frames = w.readframes(w.getnframes())
            if width == 2:
                raw = np.frombuffer(frames, dtype="<i2").astype(np.float64)
            elif width == 1:  # 8-bit WAV is unsigned; rescale to int16 range
                raw = (np.frombuffer(frames, dtype=np.uint8)
                       .astype(np.float64) - 128.0) * 256.0
            else:
                raise NotImplementedError(
                    f"{width * 8}-bit PCM WAV needs soundfile; stdlib-wave "
                    f"backend handles 8/16-bit only")
            if w.getnchannels() > 1:
                raw = raw.reshape(-1, w.getnchannels()).mean(axis=1)
            return sr, raw

    def __call__(self, batch: pa.Table) -> pa.Table:
        srs, durs, rms = [], [], []
        for blob in batch[self.audio_col].to_pylist():
            sr, samples = self._decode(blob)
            srs.append(sr)
            durs.append(len(samples) / sr if sr else 0.0)
            rms.append(float(np.sqrt(np.mean(samples ** 2))) if samples.size else 0.0)
        return pa.table({
            "doc_id": batch[self.id_col].cast(pa.int64()),
            "sample_rate": pa.array(srs, type=pa.int32()),
            "duration_s": pa.array(np.round(durs, 6), type=pa.float64()),
            "rms": pa.array(np.round(rms, 6), type=pa.float64()),
        })


class SampleVideoFrames:
    """video batch ``(id, video:binary)`` → one row per sampled frame
    ``(id, frame_idx, frame:binary)`` — every ``stride``-th frame, the
    flat-map layout downstream image stages consume directly."""

    def __init__(self, stride: int = 2, *, backend: str = "fake",
                 video_col: str = "video", id_col: str = "doc_id"):
        self._av = _video_lib()
        self.backend = _resolve_backend(backend, self._av, "PyAV (av)")
        self.stride = stride
        self.video_col = video_col
        self.id_col = id_col

    def _frames(self, blob: bytes):
        """Yield (frame_idx, frame_bytes) for every stride-th frame.
        Sampled frames are emitted as PNG bytes on the real paths, so the
        downstream image stages decode them with the same stdlib codec."""
        if self.backend == "fake" or blob[:4] == b"FVID":
            assert blob[:4] == b"FVID", "fake backend needs FVID payloads"
            (n_frames,) = struct.unpack("<H", blob[4:6])
            off = 6
            for i in range(n_frames):
                (flen,) = struct.unpack("<I", blob[off:off + 4])
                off += 4
                if i % self.stride == 0:
                    yield i, blob[off:off + flen]
                off += flen
            return
        if hasattr(self._av, "decode_avi"):        # stdlib AVI fallback
            from ..functions.png import encode_png
            for i, arr in enumerate(self._av.decode_avi(blob)):
                if i % self.stride == 0:
                    yield i, encode_png(arr)
            return
        import io
        with self._av.open(io.BytesIO(blob)) as container:
            for i, frame in enumerate(container.decode(video=0)):
                if i % self.stride == 0:
                    buf = io.BytesIO()
                    frame.to_image().save(buf, format="PNG")
                    yield i, buf.getvalue()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, idx_out, frames_out = [], [], []
        ids = batch[self.id_col].to_pylist()
        for row, blob in enumerate(batch[self.video_col].to_pylist()):
            for i, frame in self._frames(blob):
                ids_out.append(ids[row])
                idx_out.append(i)
                frames_out.append(frame)
        return pa.table({
            "doc_id": pa.array(ids_out, type=pa.int64()),
            "frame_idx": pa.array(idx_out, type=pa.int32()),
            "frame": pa.array(frames_out, type=pa.binary()),
        })
