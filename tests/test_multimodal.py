"""Multimodal actor-pool stage: schema/plumbing real, decode stubbed."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from aws_medallion_datalake_ray.stages.multimodal import (
    MediaFeaturizer,
    featurize_media,
    make_media_table,
)


def test_featurize_pipeline_schema_and_determinism():
    media = make_media_table(60, seed=1)
    out1 = featurize_media(ray.data.from_arrow(media), batch_size=16).to_pandas()
    out2 = featurize_media(ray.data.from_arrow(media), batch_size=16).to_pandas()
    assert set(out1.columns) == {"media_id", "kind", "payload_bytes", "n_frames", "feature"}
    assert len(out1) == 60
    assert all(len(f) == 32 for f in out1["feature"])
    a = out1.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    assert all(np.allclose(x, y) for x, y in zip(a["feature"], b["feature"]))


def test_video_frame_sampling():
    f = MediaFeaturizer(frame_stride=4)
    media = make_media_table(40, seed=2)
    out = f(media)
    kinds = out["kind"].to_pylist()
    frames = out["n_frames"].to_pylist()
    for k, n in zip(kinds, frames):
        if k == "video":
            assert n == 4  # 16 fake frames / stride 4
        elif k in ("image", "raw-rgb8", "png"):
            assert n == 1
        else:
            assert n == 0


def test_raw_rgb8_decodes_exact_pixels():
    """raw tensor formats decode for REAL: the payload bytes ARE the array."""
    f = MediaFeaturizer()
    px = np.arange(10 * 6 * 3, dtype=np.uint8).reshape(10, 6, 3)
    dec = f._decode(px.tobytes(), "raw-rgb8", 6, 10)
    assert np.array_equal(dec, px)
    with pytest.raises(ValueError):
        f._decode(px.tobytes(), "raw-rgb8", 7, 10)  # metadata mismatch

    samples = np.array([-32768, -1, 0, 1, 32767], dtype="<i2")
    assert np.array_equal(f._decode(samples.tobytes(), "pcm16", 0, 0), samples)


def test_resize_shape():
    f = MediaFeaturizer(target_size=(8, 8))
    img = np.arange(30 * 50, dtype=np.uint8).reshape(30, 50)
    assert f._resize(img).shape == (8, 8)


def test_unknown_kind_raises():
    f = MediaFeaturizer()
    with pytest.raises(NotImplementedError):
        f._decode_stub(b"xx", "hologram", 8, 8)
