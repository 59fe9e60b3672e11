"""Stdlib AVI codec + the real video frame-sampling path it unlocks."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.functions.avi import decode_avi, encode_avi
from search_engine_ray.functions.png import decode_png


@pytest.mark.parametrize("shape", [(6, 9), (17, 4), (1, 1)])
def test_avi_roundtrip(shape):
    h, w = shape
    rng = np.random.default_rng(h * 100 + w)
    frames = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
              for _ in range(5)]
    blob = encode_avi(frames, fps=7)
    back = list(decode_avi(blob))
    assert len(back) == 5
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)


def test_avi_rejects_out_of_scope():
    with pytest.raises(ValueError):
        list(decode_avi(b"RIFFxxxxWAVE"))
    with pytest.raises(ValueError):
        list(decode_avi(b"junk"))


def test_video_stage_real_path_samples_avi_frames(ray_session):
    """backend='auto' with a REAL AVI payload samples frames through the
    stdlib codec, emitting PNG frame bytes the image stage then decodes —
    the full real-path composition, no PyAV/PIL."""
    import ray.data
    from search_engine_ray.stages.multimodal import (DecodeImageStats,
                                                     SampleVideoFrames,
                                                     make_fake_video)
    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
              for _ in range(6)]
    blobs = [encode_avi(frames, fps=5), make_fake_video(3, 4, 4, seed=2)]
    tbl = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                    "video": pa.array(blobs, type=pa.binary())})
    sampled = (ray.data.from_arrow(tbl)
               .map_batches(SampleVideoFrames(stride=2, backend="auto"),
                            batch_format="pyarrow", batch_size=2,
                            concurrency=1)
               .to_pandas().sort_values(["doc_id", "frame_idx"]))
    assert list(sampled[sampled.doc_id == 0]["frame_idx"]) == [0, 2, 4]
    assert list(sampled[sampled.doc_id == 1]["frame_idx"]) == [0, 2]
    # the real-path frames round-trip exactly through PNG
    png0 = sampled[sampled.doc_id == 0].iloc[0]["frame"]
    assert np.array_equal(decode_png(png0), frames[0])
    # and the downstream image stage consumes them via its own real path
    frames_tbl = pa.Table.from_pandas(
        sampled[sampled.doc_id == 0][["doc_id", "frame"]]
        .rename(columns={"frame": "image"}), preserve_index=False)
    stats = (ray.data.from_arrow(frames_tbl)
             .map_batches(DecodeImageStats(backend="auto"),
                          batch_format="pyarrow", concurrency=1)
             .to_pandas())
    assert set(stats["width"]) == {6} and set(stats["height"]) == {8}


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    import hypothesis.extra.numpy as hnp

    @settings(max_examples=25, deadline=None)
    @given(st.lists(
        hnp.arrays(np.uint8, st.just((5, 7, 3))), min_size=1, max_size=6))
    def test_avi_roundtrip_fuzz(frames):
        from search_engine_ray.functions.avi import decode_avi, encode_avi
        back = list(decode_avi(encode_avi(frames)))
        assert len(back) == len(frames)
        for a, b in zip(frames, back):
            assert np.array_equal(a, b)
except ImportError:      # pragma: no cover
    pass
