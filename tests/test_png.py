"""Stdlib PNG codec + the multimodal image REAL path it unlocks."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.functions.png import (PNG_SIGNATURE, decode_png,
                                             encode_png)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4, "mixed"])
def test_roundtrip_all_filters_and_channels(channels, filter_type):
    rng = np.random.default_rng(channels * 10 + hash(str(filter_type)) % 7)
    img = rng.integers(0, 256, size=(23, 17, channels), dtype=np.uint8) \
        if channels > 1 else \
        rng.integers(0, 256, size=(23, 17), dtype=np.uint8)
    blob = encode_png(img, filter_type=filter_type)
    assert blob[:8] == PNG_SIGNATURE
    back = decode_png(blob)
    want = img[:, :, None] if img.ndim == 2 else img
    assert np.array_equal(back, want)


def test_decode_rejects_out_of_scope():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    blob = bytearray(encode_png(img))
    blob[24] = 16                        # bit depth 16 in IHDR
    with pytest.raises(ValueError):
        decode_png(bytes(blob))


def test_image_stage_real_path_decodes_png(ray_session):
    """backend='auto' with REAL PNG payloads exercises the real decode
    branch in this PIL-less container; FIMG payloads in the same batch
    still route to the fake codec."""
    import ray.data
    from search_engine_ray.stages.multimodal import (DecodeImageStats,
                                                     make_fake_image)
    rng = np.random.default_rng(5)
    pngs = [encode_png(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8),
                       filter_type="mixed")
            for h, w in ((8, 12), (16, 5), (3, 3))]
    blobs = pngs + [make_fake_image(6, 4, 3, seed=1)]
    tbl = pa.table({"doc_id": pa.array(range(len(blobs)), type=pa.int64()),
                    "image": pa.array(blobs, type=pa.binary())})
    out = (ray.data.from_arrow(tbl)
           .map_batches(DecodeImageStats(backend="auto"),
                        batch_format="pyarrow", batch_size=2,
                        concurrency=1)
           .to_pandas().sort_values("doc_id"))
    assert list(out["width"]) == [12, 5, 3, 6]
    assert list(out["height"]) == [8, 16, 3, 4]
    assert list(out["channels"]) == [3, 3, 3, 3]
    # mean matches the source arrays exactly
    for i, blob in enumerate(pngs):
        px = decode_png(blob)
        assert out["mean_pixel"].iloc[i] == pytest.approx(
            round(float(px.mean()), 6))


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    import hypothesis.extra.numpy as hnp

    @settings(max_examples=40, deadline=None)
    @given(
        arr=hnp.arrays(np.uint8,
                       st.tuples(st.integers(1, 12), st.integers(1, 12),
                                 st.sampled_from([1, 2, 3, 4]))),
        ft=st.sampled_from([0, 1, 2, 3, 4, "mixed"]))
    def test_png_roundtrip_fuzz(arr, ft):
        from search_engine_ray.functions.png import decode_png, encode_png
        assert np.array_equal(decode_png(encode_png(arr, filter_type=ft)),
                              arr)
except ImportError:      # pragma: no cover - hypothesis is baked in here
    pass
