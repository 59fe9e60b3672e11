"""Multimodal stages: fake-container decode/resize/sample + backend gating."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.stages.multimodal import (AudioFeatures,
                                                 DecodeImageStats,
                                                 ResizeImage,
                                                 SampleVideoFrames,
                                                 make_fake_audio,
                                                 make_fake_image,
                                                 make_fake_video,
                                                 _decode_fake_image)


def _tbl(col, blobs):
    return pa.table({"doc_id": pa.array(range(len(blobs)), type=pa.int64()),
                     col: pa.array(blobs, type=pa.binary())})


def test_image_stats():
    t = _tbl("image", [make_fake_image(8, 6), make_fake_image(4, 4, 1)])
    out = DecodeImageStats()(t).to_pylist()
    assert (out[0]["width"], out[0]["height"], out[0]["channels"]) == (8, 6, 3)
    assert (out[1]["width"], out[1]["height"], out[1]["channels"]) == (4, 4, 1)
    assert 0.0 <= out[0]["mean_pixel"] <= 255.0


def test_image_determinism():
    assert make_fake_image(8, 6, seed=1) == make_fake_image(8, 6, seed=1)
    assert make_fake_image(8, 6, seed=1) != make_fake_image(8, 6, seed=2)


def test_resize():
    t = _tbl("image", [make_fake_image(16, 12)])
    out = ResizeImage(4, 3)(t)
    px = _decode_fake_image(out["image"][0].as_py())
    assert px.shape == (3, 4, 3)
    # nearest-neighbour: resized pixels are a subset of the original's
    orig = _decode_fake_image(make_fake_image(16, 12))
    assert px[0, 0, 0] == orig[0, 0, 0]


def test_audio_features():
    t = _tbl("audio", [make_fake_audio(16000, sample_rate=16000)])
    out = AudioFeatures()(t).to_pylist()[0]
    assert out["sample_rate"] == 16000
    assert out["duration_s"] == pytest.approx(1.0)
    assert out["rms"] > 0


def test_video_frame_sampling():
    t = _tbl("video", [make_fake_video(7, w=8, h=6)])
    out = SampleVideoFrames(stride=3)(t)
    assert out["frame_idx"].to_pylist() == [0, 3, 6]
    for blob in out["frame"].to_pylist():
        assert _decode_fake_image(blob).shape == (6, 8, 3)


def test_real_backend_stubbed():
    with pytest.raises(NotImplementedError):
        DecodeImageStats(backend="pil")
    with pytest.raises(NotImplementedError):
        AudioFeatures(backend="torchaudio")
    with pytest.raises(NotImplementedError):
        SampleVideoFrames(backend="ffmpeg")


def test_distributed_media_pipeline(ray_session):
    """Actor-pool plumbing: synth media → decode stats via map_batches."""
    import ray.data
    from search_engine_ray.pipelines.queries import q_media_frame_stats
    out = q_media_frame_stats(None)  # sf_dir unused: media is synthesized
    rows = out.take_all()
    assert len(rows) == 64
    # stride-2 sampling of 3..7-frame videos → 2..4 frames per video
    assert all(2 <= r["n_frames"] <= 4 for r in rows)
    assert all(0.0 <= r["avg_frame_mean"] <= 255.0 for r in rows)
