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


# ------------------------------------------------------ audio (real codec)

def _sine(freq=440.0, rate=8000, seconds=0.5):
    t = np.arange(int(rate * seconds)) / rate
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_wav_roundtrip_16bit():
    from rensa_ray.stages.multimodal import decode_wav, encode_wav

    x = _sine()
    payload = encode_wav(x, 8000)
    y, rate = decode_wav(payload)
    assert rate == 8000 and y.shape == (len(x), 1)
    # |x|/32768 scale mismatch (32767 vs 32768) + 0.5 LSB rounding
    np.testing.assert_allclose(y[:, 0], x, atol=1.6 / 32768)


def test_wav_formats_and_chunk_walk():
    from rensa_ray.stages.multimodal import decode_wav

    def wav_bytes(fmt_code, bits, data, ch=1, rate=4000, extra_chunk=True):
        fmt = (np.uint16(fmt_code).tobytes() + np.uint16(ch).tobytes()
               + np.uint32(rate).tobytes()
               + np.uint32(rate * ch * bits // 8).tobytes()
               + np.uint16(ch * bits // 8).tobytes()
               + np.uint16(bits).tobytes())
        body = b"WAVE"
        if extra_chunk:  # unknown odd-sized chunk must be skipped (+pad)
            body += b"LIST" + np.uint32(3).tobytes() + b"abc\x00"
        body += b"fmt " + np.uint32(len(fmt)).tobytes() + fmt
        body += b"data" + np.uint32(len(data)).tobytes() + data
        return b"RIFF" + np.uint32(len(body)).tobytes() + body

    # u8: 128 is zero, 255 ~ +1
    y, r = decode_wav(wav_bytes(1, 8, bytes([128, 255, 0])))
    np.testing.assert_allclose(y[:, 0], [0.0, 127 / 128, -1.0], atol=1e-6)
    # s32
    d = np.array([0, 2**31 - 1, -(2**31)], "<i4").tobytes()
    y, _ = decode_wav(wav_bytes(1, 32, d))
    np.testing.assert_allclose(y[:, 0], [0.0, 1.0, -1.0], atol=1e-6)
    # f32
    d = np.array([0.25, -0.5], "<f4").tobytes()
    y, _ = decode_wav(wav_bytes(3, 32, d))
    np.testing.assert_allclose(y[:, 0], [0.25, -0.5])
    # stereo s16 keeps channel layout
    d = np.array([1000, -1000, 2000, -2000], "<i2").tobytes()
    y, _ = decode_wav(wav_bytes(1, 16, d, ch=2))
    assert y.shape == (2, 2)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_wav(b"nope")
    with _pytest.raises(ValueError):
        decode_wav(wav_bytes(1, 24, b"\x00" * 6))  # 24-bit unsupported
    with _pytest.raises(ValueError):
        # rate 0 must be a ValueError here, NOT a ZeroDivisionError later in
        # resample_linear outside the stage's fallback
        decode_wav(wav_bytes(1, 16, b"\x00\x00", rate=0))


def test_resample_linear_preserves_tone():
    from rensa_ray.stages.multimodal import resample_linear

    x = _sine(freq=100, rate=8000, seconds=1.0)
    y = resample_linear(x, 8000, 4000)
    assert len(y) == 4000
    # zero-crossing count (~2*freq per second) is rate-invariant
    zc = lambda a: int((np.diff(np.signbit(a)) != 0).sum())
    assert abs(zc(y) - zc(x)) <= 2


def test_audio_decode_stage_mixed_payloads(ray_session):
    import ray.data as rd

    from rensa_ray.stages.multimodal import AudioDecodeStage, encode_wav

    wav_a = encode_wav(_sine(freq=440, rate=8000, seconds=2.0), 8000)  # long
    wav_b = encode_wav(_sine(freq=200, rate=2000, seconds=0.25), 2000)  # short
    t = pa.table({"url": ["a", "b", "junk"],
                  "payload": pa.array([wav_a, wav_b, b"not audio"],
                                      pa.binary())})
    out = (rd.from_arrow(t)
           .map_batches(AudioDecodeStage,
                        fn_constructor_kwargs={"target_rate": 4000,
                                               "target_seconds": 1.0},
                        batch_format="pyarrow", batch_size=8, concurrency=1)
           .to_pandas().set_index("url"))
    assert out.loc["a", "is_real_decode"] and out.loc["b", "is_real_decode"]
    assert not out.loc["junk", "is_real_decode"]
    assert out.loc["a", "orig_rate"] == 8000 and out.loc["b", "orig_rate"] == 2000
    a = np.array(out.loc["a", "audio"])  # truncated to 1s at 4kHz
    b = np.array(out.loc["b", "audio"])
    assert len(a) == 4000 and len(b) == 4000
    assert (b[1005:] == 0).all()  # 0.25s clip → 1000 samples at 4kHz + pad
    assert (np.abs(a) > 0).any()


def test_audio_feature_stage_dsp(ray_session):
    import ray.data as rd

    from rensa_ray.stages.multimodal import (
        AudioDecodeStage,
        AudioFeatureStage,
        encode_wav,
    )

    wav = encode_wav(_sine(freq=440, rate=4000, seconds=1.0), 4000)
    dc = encode_wav(np.full(4000, 0.5, np.float32), 4000)
    t = pa.table({"url": ["tone", "dc"],
                  "payload": pa.array([wav, dc], pa.binary())})
    ds = rd.from_arrow(t).map_batches(
        AudioDecodeStage,
        fn_constructor_kwargs={"target_rate": 4000, "target_seconds": 1.0},
        batch_format="pyarrow", concurrency=1)
    out = (ds.map_batches(AudioFeatureStage,
                          fn_constructor_kwargs={"rate": 4000},
                          batch_format="pyarrow", concurrency=1)
           .to_pandas().set_index("url"))
    tone = np.array(out.loc["tone", "audio_feature"])
    flat = np.array(out.loc["dc", "audio_feature"])
    assert tone.shape == (8,)
    # mean ZCR of a 440 Hz tone at 4 kHz ~ 2*440/4000 = 0.22
    assert abs(tone[1] - 0.22) < 0.03
    # spectral centroid near the tone frequency; DC signal near 0 Hz
    assert 350 < tone[2] < 550
    assert flat[1] == 0.0 and flat[2] < 50


def test_bmp_roundtrip_and_layout():
    from rensa_ray.stages.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 7, 3), np.uint8)  # odd width → row padding
    assert (decode_bmp(encode_bmp(img)) == img).all()
    # 32-bit BGRA variant with top-down rows
    h, w = 2, 3
    px = rng.integers(0, 256, (h, w, 4), np.uint8)
    raster = px.tobytes()
    hdr = (b"BM" + np.uint32(54 + len(raster)).tobytes() + b"\x00" * 4
           + np.uint32(54).tobytes() + np.uint32(40).tobytes()
           + np.int32(w).tobytes() + np.int32(-h).tobytes()
           + np.uint16(1).tobytes() + np.uint16(32).tobytes()
           + np.uint32(0).tobytes() + np.uint32(len(raster)).tobytes()
           + b"\x00" * 16)
    out = decode_bmp(hdr + raster)
    assert (out == px[:, :, 2::-1]).all()  # BGRA → RGB, rows kept top-down
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_bmp(b"BMbad")


def test_image_stage_decodes_bmp(ray_session):
    import ray.data as rd

    from rensa_ray.stages.multimodal import ImageDecodeStage, encode_bmp

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (8, 8, 3), np.uint8)
    t = pa.table({"url": ["bmp"],
                  "payload": pa.array([encode_bmp(img)], pa.binary())})
    out = (rd.from_arrow(t)
           .map_batches(ImageDecodeStage, batch_format="pyarrow",
                        concurrency=1)
           .to_pandas())
    got = np.array(out.loc[0, "image"]).reshape(8, 8, 3)
    assert (got == img).all()


def test_wav_roundtrip_property():
    """Property: any float32 signal in [-1, 1] survives 16-bit WAV encode →
    decode within quantization error, at any rate/shape."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rensa_ray.stages.multimodal import decode_wav, encode_wav

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.floats(min_value=-1.0, max_value=1.0, width=32),
                    min_size=1, max_size=300),
           st.sampled_from([1000, 8000, 44100]))
    def _roundtrip(vals, rate):
        x = np.array(vals, np.float32)
        y, r = decode_wav(encode_wav(x, rate))
        assert r == rate and y.shape == (len(x), 1)
        np.testing.assert_allclose(y[:, 0], x, atol=1.6 / 32768)

    _roundtrip()


class _StubImage:
    """Minimal PIL.Image.Image stand-in: context manager + convert + array."""

    def __init__(self, arr):
        self._arr = arr

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def convert(self, mode):
        if mode == "L":
            return _StubImage(self._arr.mean(axis=2).astype(np.uint8))
        return _StubImage(self._arr)

    def __array__(self, dtype=None, copy=None):
        a = self._arr if dtype is None else self._arr.astype(dtype)
        return np.array(a) if copy else a


class _StubPILModule:
    """PIL.Image module stand-in: decodes b'STUB' + H + W + raw RGB bytes."""

    @staticmethod
    def open(bio):
        data = bio.read()
        if not data.startswith(b"STUB"):
            raise OSError("cannot identify image file")
        h, w = data[4], data[5]
        raster = np.frombuffer(data, np.uint8, count=h * w * 3, offset=6)
        return _StubImage(raster.reshape(h, w, 3).copy())


def test_image_decode_pil_wiring_with_stub_codec(monkeypatch):
    """The optional-PIL path: a codec module returned by
    load_pil_image_module() must be loaded ONCE in __init__, used for
    non-PPM/BMP payloads, resized to target_hw, and undecodable payloads
    must still fall through to decode_fn/_fake.  Exercised with an injected
    stub so the wiring is tested even where Pillow is absent."""
    from rensa_ray.stages import multimodal as mm

    monkeypatch.setattr(mm, "load_pil_image_module", lambda: _StubPILModule)
    stage = mm.ImageDecodeStage(target_hw=(8, 8))
    assert stage.pil is _StubPILModule

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    payload = b"STUB" + bytes([4, 4]) + img.tobytes()
    got = stage.decode(payload)
    assert got.shape == (8, 8, 3)
    # nearest-neighbor upsample of a 4x4 by 2x: each source pixel twice
    assert np.array_equal(got[::2, ::2], img)

    junk = b"\x89PNG not really a png"
    fake = stage.decode(junk)
    from rensa_ray.stages.multimodal import _fake_decode
    assert np.array_equal(fake, _fake_decode(junk, 3))  # fell back

    # PPM payloads never consult the codec module
    from rensa_ray.stages.multimodal import encode_ppm
    ppm = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    assert np.array_equal(stage.decode(encode_ppm(ppm)), ppm)

    off = mm.ImageDecodeStage(use_pil=False)
    assert off.pil is None


def test_image_decode_pil_real_codec():
    """Real-Pillow lane: skipped where Pillow is absent (this container);
    in richer environments it proves compressed payloads really decode."""
    import io

    import pytest

    PIL_Image = pytest.importorskip("PIL.Image")

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    buf = io.BytesIO()
    PIL_Image.fromarray(img).save(buf, format="PNG")  # lossless
    stage = ImageDecodeStage(target_hw=(8, 8))
    assert stage.pil is not None
    assert np.array_equal(stage.decode(buf.getvalue()), img)


def test_image_decode_malformed_and_channel_adaptation():
    """Corrupt/zero-dim PPM payloads route to the fallback instead of
    killing the batch; P6/BMP decodes adapt to channels=1/4 so mixed
    real+fallback batches keep ONE tensor shape."""
    from rensa_ray.stages.multimodal import (
        ImageDecodeStage,
        _fake_decode,
        encode_ppm,
    )

    st = ImageDecodeStage(use_pil=False)
    for bad in (b"P6", b"P6\n0 0\n255\n", b"P6\nxx yy\n255\n"):
        assert np.array_equal(st.decode(bad), _fake_decode(bad, 3))

    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    st1 = ImageDecodeStage(channels=1, use_pil=False)
    assert st1.decode(encode_ppm(img)).shape == (8, 8, 1)
    st4 = ImageDecodeStage(channels=4, use_pil=False)
    d4 = st4.decode(encode_ppm(img))
    assert d4.shape == (8, 8, 4) and (d4[:, :, 3] == 255).all()
    # mixed real-PPM + fallback batch stacks cleanly at the SAME width
    b = pa.table({"url": ["a", "b"],
                  "payload": pa.array([encode_ppm(img), b"junk"], pa.binary())})
    assert st1(b)["image"].combine_chunks().type.list_size == 64


def test_encode_wav_accepts_lists_and_big_rates_survive():
    from rensa_ray.stages.multimodal import AudioDecodeStage, decode_wav, encode_wav

    x, r = decode_wav(encode_wav([0.1, 0.2, 0.3], 8000))
    assert x.shape == (3, 1) and r == 8000
    # fmt rates are u32: the stage's orig_rate column must not wrap
    stage = AudioDecodeStage()
    big = encode_wav(np.zeros(16, np.float32), 3_000_000_000)
    out = stage(pa.table({"url": ["u"], "payload": pa.array([big], pa.binary())}))
    assert out["orig_rate"].to_pylist() == [3_000_000_000]


def test_audio_feature_short_clip_no_nan():
    from rensa_ray.stages.multimodal import AudioFeatureStage

    fs = AudioFeatureStage(frame=8192)  # frame longer than the clip
    ab = pa.table({"url": ["u"], "audio": pa.FixedSizeListArray.from_arrays(
        pa.array(np.sin(np.arange(4000) * 0.1).astype(np.float32)), 4000)})
    feats = fs(ab)["audio_feature"].combine_chunks().flatten().to_numpy()
    assert np.isfinite(feats).all()


def test_generate_corpus_small_sizes_exact_count():
    from rensa_ray.sources.corpus import generate_corpus

    for n in (5, 10, 25):
        corpus, _truth = generate_corpus(n, 3)
        assert len(corpus) == n
