"""Multimodal stage plumbing tests (decode stub, features, frame sampling).

The decode step is a deterministic fake (no codec libs in this container);
what's under test is the Ray-side contract: schemas, actor-pool stages,
fan-out layout, determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rensa_ray.stages.multimodal import (
    FrameSampleStage,
    ImageDecodeStage,
    ImageFeatureStage,
    decode_and_featurize,
)


def _media_table(n=10):
    return pa.table({
        "url": pa.array([f"https://m.test/{i}" for i in range(n)]),
        "payload": pa.array([bytes([i]) * (100 + i) for i in range(n)],
                            pa.binary()),
    })


def test_ppm_codec_roundtrip_and_resize():
    from rensa_ray.stages.multimodal import decode_ppm, encode_ppm, resize_nearest

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # header variants: comments + arbitrary whitespace
    body = np.ascontiguousarray(img).tobytes()
    weird = b"P6 # c\n# full line comment\n 17\t13\n# again\n255\n" + body
    assert np.array_equal(decode_ppm(weird), img)
    # resize: 2x2 block image downsampled to exact pixels
    quad = np.zeros((4, 4, 3), np.uint8)
    quad[:2, 2:] = 50
    quad[2:, :2] = 100
    quad[2:, 2:] = 200
    small = resize_nearest(quad, 2, 2)
    assert small[0, 0, 0] == 0 and small[0, 1, 0] == 50
    assert small[1, 0, 0] == 100 and small[1, 1, 0] == 200
    up = resize_nearest(small, 4, 4)
    assert np.array_equal(up, quad)


def test_decode_stage_real_ppm_payloads():
    from rensa_ray.stages.multimodal import encode_ppm

    rng = np.random.default_rng(6)
    imgs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for h, w in [(8, 8), (16, 12), (5, 9)]]
    tbl = pa.table({
        "url": pa.array([f"u{i}" for i in range(3)]),
        "payload": pa.array([encode_ppm(im) for im in imgs], pa.binary()),
    })
    out = ImageDecodeStage(target_hw=(8, 8))(tbl)
    m = out["image"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False).reshape(3, -1)
    # the already-8x8 image decodes byte-identically (no resample)
    assert np.array_equal(m[0], imgs[0].reshape(-1))
    assert out["height"].to_pylist() == [8, 8, 8]


def test_decode_stage_schema_and_determinism():
    stage = ImageDecodeStage()
    out = stage(_media_table())
    assert out.column_names == ["url", "image", "height", "width", "channels"]
    assert out["image"].type.list_size == 8 * 8 * 3
    out2 = ImageDecodeStage()(_media_table())
    assert out.equals(out2)
    # distinct payloads → distinct fake images
    m = out["image"].combine_chunks().flatten().to_numpy().reshape(10, -1)
    assert len({bytes(r) for r in m}) == 10


def test_feature_stage_histogram():
    decoded = ImageDecodeStage()(_media_table())
    feats = ImageFeatureStage()(decoded)
    assert feats.column_names == ["url", "feature"]
    f = feats["feature"].combine_chunks().flatten().to_numpy().reshape(10, -1)
    assert f.shape == (10, 16)
    np.testing.assert_allclose(f.sum(axis=1), 1.0, rtol=1e-6)


def test_frame_sample_fanout():
    out = FrameSampleStage(num_frames=4)(_media_table(3))
    assert out.num_rows == 12
    assert out.column_names == ["url", "frame_id", "frame"]
    assert out["frame_id"].to_pylist() == [0, 1, 2, 3] * 3


def test_decode_and_featurize_pipeline(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_media_table(20))
    out = decode_and_featurize(ds, batch_size=8, concurrency=2).to_pandas()
    assert len(out) == 20
    assert set(out.columns) == {"url", "feature"}
    assert all(len(v) == 16 for v in out["feature"])
