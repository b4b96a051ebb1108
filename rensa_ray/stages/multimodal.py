"""Multimodal column stages — image/audio/video as opaque binary + metadata.

Two REAL codecs implemented in pure numpy (both formats are header + raw
samples, so no codec library is needed):

- PPM (P6) images — decode/encode/nearest-resize (``ImageDecodeStage``);
- RIFF/WAVE audio — full chunk-walking PCM parse (u8/s16/s32/f32, any
  channel count), mono downmix, linear resample, fixed-length clips
  (``AudioDecodeStage``), plus real DSP features (RMS/ZCR/spectral
  centroid/rolloff via batched rFFT) in ``AudioFeatureStage``.

Compressed images (JPEG/PNG/GIF/WebP/...) decode through an OPTIONAL,
import-guarded PIL path in ``ImageDecodeStage``: when Pillow is installed
the stage really decodes them (per-actor import, once, in ``__init__``);
when it isn't — as in this container — payloads route to the ``decode_fn``
hook, default a deterministic fake keeping the Ray-side plumbing (schema
contract, actor-pool stage shape, batch sizing, output layout) real and
tested.  MP3/video likewise remain ``decode_fn`` hooks (torchaudio/ffmpeg
in production).  The PIL wiring itself is tested in both modes:
skip-if-absent with real Pillow, and against an injected stub codec where
Pillow is missing (tests/test_multimodal.py).

Design notes for 100 TB media corpora:

- payloads stay in one ``binary`` column; per-batch row counts must be small
  (``batch_size`` 32–256) so batch × concurrency fits worker heaps;
- decoders are per-actor state (``__init__`` loads the codec/model once);
- outputs are fixed-size feature vectors / resized tensors as
  ``fixed_size_list`` columns — columnar, shuffle-friendly;
- pass-through of key/metadata columns keeps lineage without a join.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def load_pil_image_module():
    """Optional Pillow import, guarded: returns ``PIL.Image`` or None.

    Module-level so tests can monkeypatch it with a stub codec; called once
    per actor from ``ImageDecodeStage.__init__`` (never per batch)."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


def _fake_decode(payload: bytes, channels: int = 3) -> np.ndarray:
    """Deterministic stand-in decoder: bytes → (8, 8, channels) uint8 'image'.

    Derived from sha256 of the payload so tests get stable tensors without
    any codec dependency.  Replace via ``decode_fn`` in production."""
    need = 8 * 8 * channels
    out = bytearray()
    h = hashlib.sha256(payload).digest()
    while len(out) < need:
        out.extend(h)
        h = hashlib.sha256(h).digest()
    return np.frombuffer(bytes(out[:need]), dtype=np.uint8).reshape(8, 8, channels)


def decode_ppm(payload: bytes) -> np.ndarray:
    """Pure-numpy binary-PPM (P6, maxval ≤ 255) decode → (H, W, 3) uint8.

    Full format support: comments, arbitrary whitespace between header
    tokens, single whitespace byte before the raster (netpbm spec).
    """
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment to end of line
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte separates header and raster
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = h * w * 3
    raster = np.frombuffer(payload, np.uint8, count=need, offset=pos)
    return raster.reshape(h, w, 3)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Pure-numpy uncompressed 24/32-bit BMP decode → (H, W, 3) uint8 RGB.

    Handles the standard BITMAPINFOHEADER layout: bottom-up (or top-down,
    negative height) rows, BGR(A) byte order, rows padded to 4 bytes.
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    raster = np.frombuffer(payload, np.uint8, count=stride * h,
                           offset=data_off).reshape(h, stride)
    px = raster[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    if not top_down:
        px = px[::-1]
    return px[:, :, 2::-1].copy()  # BGR(A) → RGB, drop alpha


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → uncompressed 24-bit bottom-up BMP bytes."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("BMP encoder wants RGB")
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, flip
    raster = rows.tobytes()
    header = (b"BM" + np.uint32(54 + len(raster)).tobytes() + b"\x00" * 4
              + np.uint32(54).tobytes()
              + np.uint32(40).tobytes()
              + np.int32(w).tobytes() + np.int32(h).tobytes()
              + np.uint16(1).tobytes() + np.uint16(24).tobytes()
              + np.uint32(0).tobytes() + np.uint32(len(raster)).tobytes()
              + b"\x00" * 16)
    return header + raster


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM (P6) bytes."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("PPM is RGB")
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, np.uint8).tobytes()


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, fully vectorized (pixel-center sampling)."""
    h, w = img.shape[:2]
    rows = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64),
                      h - 1)
    cols = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64),
                      w - 1)
    return img[rows[:, None], cols[None, :]]


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Pure-numpy RIFF/WAVE decode → ((n, channels) float32 in [-1, 1], rate).

    Real parsing, no codec library: walks RIFF chunks, reads the ``fmt ``
    block (PCM u8 / s16 / s32 and IEEE float32), slices the ``data`` chunk
    straight into numpy.  Unknown chunks are skipped per spec (word-aligned).
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if channels < 1:
        raise ValueError("invalid channel count")
    if rate <= 0:
        # a zero rate would later ZeroDivisionError in resample_linear
        # OUTSIDE the stage's ValueError fallback, killing the whole batch
        raise ValueError("invalid sample rate")
    if audio_format == 3 and bits == 32:
        x = np.frombuffer(data, "<f4").astype(np.float32)
    elif audio_format == 1 and bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    elif audio_format == 1 and bits == 32:
        x = np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
    elif audio_format == 1 and bits == 8:
        x = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV encoding fmt={audio_format} bits={bits}")
    n = len(x) // channels
    return x[: n * channels].reshape(n, channels), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n,) or (n, channels) float32 in [-1, 1] → 16-bit PCM WAV bytes."""
    arr = np.asarray(samples, np.float32)   # accept plain lists too
    x = np.atleast_2d(arr)
    if x.shape[0] == 1 and arr.ndim == 1:
        x = x.T
    n, ch = x.shape
    pcm = np.rint(np.clip(x * 32767.0, -32768, 32767)).astype("<i2").tobytes()
    fmt = (np.uint16(1).tobytes() + np.uint16(ch).tobytes()
           + np.uint32(rate).tobytes() + np.uint32(rate * ch * 2).tobytes()
           + np.uint16(ch * 2).tobytes() + np.uint16(16).tobytes())
    chunks = b"WAVE" + b"fmt " + np.uint32(len(fmt)).tobytes() + fmt \
        + b"data" + np.uint32(len(pcm)).tobytes() + pcm
    return b"RIFF" + np.uint32(len(chunks)).tobytes() + chunks


def resample_linear(x: np.ndarray, rate_in: int, rate_out: int) -> np.ndarray:
    """Vectorized linear-interpolation resample of a mono float array."""
    if rate_in == rate_out or len(x) == 0:
        return np.asarray(x, np.float32)
    n_out = max(1, int(round(len(x) * rate_out / rate_in)))
    pos = np.arange(n_out, dtype=np.float64) * (len(x) - 1) / max(n_out - 1, 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, len(x) - 1)
    frac = (pos - lo).astype(np.float32)
    return (x[lo] * (1.0 - frac) + x[hi] * frac).astype(np.float32)


class AudioDecodeStage:
    """map_batches actor: (key, payload binary) → fixed-length mono clips.

    RIFF/WAVE payloads are REALLY decoded (pure-numpy PCM parse), downmixed
    to mono, resampled to ``target_rate`` and truncated/zero-padded to
    ``target_seconds`` — a ``fixed_size_list<float32>`` column ready for
    batched model inference.  Non-WAV payloads go through ``decode_fn``
    (default: a deterministic fake) exactly like the image stage's codec
    hook.  Metadata columns: orig_rate, orig_samples, is_real_decode.
    """

    def __init__(self, key_col: str = "url", payload_col: str = "payload",
                 target_rate: int = 4000, target_seconds: float = 1.0,
                 decode_fn=None):
        self.key_col = key_col
        self.payload_col = payload_col
        self.target_rate = target_rate
        self.n_out = int(target_rate * target_seconds)
        self.decode_fn = decode_fn

    def _fake(self, payload: bytes) -> tuple[np.ndarray, int]:
        raw = _fake_decode(payload, 1).reshape(-1).astype(np.float32)
        x = (np.resize(raw, self.n_out) - 128.0) / 128.0
        return x.reshape(-1, 1), self.target_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = np.zeros((len(batch), self.n_out), np.float32)
        rates = np.zeros(len(batch), np.int64)  # fmt rates are u32: int32 wraps
        lens = np.zeros(len(batch), np.int64)
        real = np.zeros(len(batch), bool)
        for i, p in enumerate(batch[self.payload_col].to_pylist()):
            p = b"" if p is None else p
            try:
                x, rate = decode_wav(p)
                real[i] = True
            except ValueError:
                x, rate = (self.decode_fn(p) if self.decode_fn is not None
                           else self._fake(p))
            rates[i], lens[i] = rate, x.shape[0]
            mono = x.mean(axis=1)
            mono = resample_linear(mono, rate, self.target_rate)
            n = min(len(mono), self.n_out)
            out[i, :n] = mono[:n]
        return pa.table({
            self.key_col: batch[self.key_col],
            "audio": pa.FixedSizeListArray.from_arrays(
                pa.array(out.reshape(-1), pa.float32()), self.n_out),
            "orig_rate": pa.array(rates),
            "orig_samples": pa.array(lens),
            "is_real_decode": pa.array(real),
        })


class AudioFeatureStage:
    """map_batches actor: decoded clip column → DSP feature vectors.

    Real, fully vectorized signal features over fixed frames (no per-row
    Python beyond the batch reshape): RMS energy, zero-crossing rate,
    spectral centroid and 85% rolloff (both from one batched rFFT), pooled
    mean+std over frames → a ``fixed_size_list<float32>[8]`` column.  Swap
    in batched model embeddings via ``feature_fn`` — same contract.
    """

    def __init__(self, audio_col: str = "audio", key_col: str = "url",
                 frame: int = 512, rate: int = 4000, feature_fn=None):
        self.audio_col = audio_col
        self.key_col = key_col
        self.frame = frame
        self.rate = rate
        self.feature_fn = feature_fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.audio_col].combine_chunks()
        size = col.type.list_size
        x = col.flatten().to_numpy(zero_copy_only=False).reshape(-1, size)
        if self.feature_fn is not None:
            feats = np.asarray(self.feature_fn(x), np.float32)
        else:
            # clips shorter than the frame analyze as ONE short frame
            # (frame > clip would give nf=0 and all-NaN mean/std features)
            frame = min(self.frame, size)
            nf = size // frame
            fr = x[:, : nf * frame].reshape(len(x), nf, frame)
            rms = np.sqrt((fr ** 2).mean(axis=2) + 1e-12)
            zcr = (np.diff(np.signbit(fr), axis=2) != 0).mean(axis=2)
            spec = np.abs(np.fft.rfft(fr, axis=2))
            power = spec.sum(axis=2) + 1e-12
            freqs = np.fft.rfftfreq(frame, d=1.0 / self.rate)
            centroid = (spec * freqs).sum(axis=2) / power
            cum = np.cumsum(spec, axis=2)
            roll_idx = (cum >= 0.85 * power[..., None]).argmax(axis=2)
            rolloff = freqs[roll_idx]
            per_frame = np.stack([rms, zcr, centroid, rolloff], axis=2)
            feats = np.concatenate(
                [per_frame.mean(axis=1), per_frame.std(axis=1)],
                axis=1).astype(np.float32)
        return pa.table({
            self.key_col: batch[self.key_col],
            "audio_feature": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()), feats.shape[1]),
        })


class ImageDecodeStage:
    """map_batches actor: (key, payload binary) → (key, image fixed_size_list).

    ``P6`` payloads are REALLY decoded (pure-numpy PPM) and resized to
    ``target_hw`` with nearest-neighbor sampling; other payloads go through
    ``decode_fn`` (default: the deterministic fake, see module docstring).
    Output column ``image`` is a flattened (H*W*C,) uint8 fixed_size_list,
    plus ``height``/``width``/``channels`` metadata columns.
    """

    def __init__(self, key_col: str = "url", payload_col: str = "payload",
                 decode_fn=None, channels: int = 3,
                 target_hw: tuple[int, int] = (8, 8), use_pil: bool = True):
        self.key_col = key_col
        self.payload_col = payload_col
        self.channels = channels
        self.target_hw = target_hw
        # per-actor setup: codecs load here once, never per batch.  Pillow
        # is OPTIONAL — absent (as in this container) the compressed-format
        # path falls through to decode_fn / the deterministic fake.
        self.pil = load_pil_image_module() if use_pil else None
        self.fallback = decode_fn if decode_fn is not None else (
            lambda b: _fake_decode(b, channels))

    _PIL_MODES = {1: "L", 3: "RGB", 4: "RGBA"}

    def _decode_pil(self, payload: bytes) -> np.ndarray | None:
        """Real compressed-image decode via Pillow, or None to fall back.

        Honors ``self.channels`` (1/3/4 → L/RGB/RGBA); any other channel
        count falls back to ``decode_fn`` so every row of a batch keeps the
        same (H, W, channels) shape — mixed widths would break the
        fixed_size_list output column.
        """
        import io

        mode = self._PIL_MODES.get(self.channels)
        if mode is None:
            return None
        try:
            with self.pil.open(io.BytesIO(payload)) as im:
                arr = np.asarray(im.convert(mode), dtype=np.uint8)
        except Exception:  # undecodable/truncated payload → decode_fn hook
            return None
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr

    def _to_channels(self, img3: np.ndarray) -> np.ndarray | None:
        """Adapt a decoded (H, W, 3) tensor to ``self.channels`` so every
        row of a batch keeps one shape (ITU-R 601 luma for 1ch, opaque
        alpha for 4ch; other channel counts fall back to decode_fn)."""
        if self.channels == 3:
            return img3
        if self.channels == 1:
            luma = (img3 @ np.array([0.299, 0.587, 0.114])).astype(np.uint8)
            return luma[:, :, None]
        if self.channels == 4:
            alpha = np.full(img3.shape[:2] + (1,), 255, np.uint8)
            return np.concatenate([img3, alpha], axis=2)
        return None

    def decode(self, payload: bytes) -> np.ndarray:
        img = None
        if payload.startswith(b"P6") or payload.startswith(b"BM"):
            try:
                raw = (decode_ppm(payload) if payload.startswith(b"P6")
                       else decode_bmp(payload))
                # zero-dimension images can't resize; malformed headers can
                # also raise non-ValueError int() parses → route to fallback
                img = self._to_channels(raw) if raw.size else None
            except (ValueError, IndexError):
                img = None
        elif self.pil is not None:
            img = self._decode_pil(payload)
        if img is None:
            return self.fallback(payload)
        th, tw = self.target_hw
        if img.shape[:2] != (th, tw):
            img = resize_nearest(img, th, tw)
        return img

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        imgs = [self.decode(b"" if p is None else p) for p in payloads]
        h, w, c = imgs[0].shape if imgs else (*self.target_hw, self.channels)
        flat = (np.stack(imgs).reshape(len(imgs), -1) if imgs
                else np.empty((0, h * w * c), np.uint8))
        return pa.table({
            self.key_col: batch[self.key_col],
            "image": pa.FixedSizeListArray.from_arrays(
                pa.array(flat.reshape(-1), pa.uint8()), h * w * c),
            "height": pa.array(np.full(len(imgs), h, np.int32)),
            "width": pa.array(np.full(len(imgs), w, np.int32)),
            "channels": pa.array(np.full(len(imgs), c, np.int32)),
        })


class ImageFeatureStage:
    """map_batches actor: decoded image column → feature vector column.

    The stub feature is a per-channel byte histogram (deterministic, fully
    vectorized); a real deployment would run batched model inference here —
    same signature, same output layout (``fixed_size_list<float>``)."""

    def __init__(self, image_col: str = "image", key_col: str = "url",
                 bins: int = 16, feature_fn=None):
        self.image_col = image_col
        self.key_col = key_col
        self.bins = bins
        self.feature_fn = feature_fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.image_col].combine_chunks()
        size = col.type.list_size
        m = col.flatten().to_numpy(zero_copy_only=False).reshape(-1, size)
        if self.feature_fn is not None:
            feats = self.feature_fn(m)
        else:
            edges = np.linspace(0, 256, self.bins + 1)
            idx = np.clip(np.searchsorted(edges, m, side="right") - 1,
                          0, self.bins - 1)
            feats = np.zeros((len(m), self.bins), np.float64)
            rows = np.repeat(np.arange(len(m)), size)
            np.add.at(feats, (rows, idx.reshape(-1)), 1.0)
            feats /= max(size, 1)
        return pa.table({
            self.key_col: batch[self.key_col],
            "feature": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.astype(np.float32).reshape(-1), pa.float32()),
                feats.shape[1]),
        })


class FrameSampleStage:
    """map_batches stage: (key, video binary) → N deterministic 'frames' per
    row (flat_map layout: output has more rows than input).

    Real frame extraction (ffmpeg) is stubbed with byte-slicing; the row
    fan-out, frame_id column and per-frame payloads are the real contract."""

    def __init__(self, key_col: str = "url", payload_col: str = "payload",
                 num_frames: int = 4, extract_fn=None):
        self.key_col = key_col
        self.payload_col = payload_col
        self.num_frames = num_frames
        self.extract_fn = extract_fn

    def _frames(self, payload: bytes) -> list[bytes]:
        if self.extract_fn is not None:
            return self.extract_fn(payload, self.num_frames)
        if not payload:
            return [b""] * self.num_frames
        step = max(len(payload) // self.num_frames, 1)
        return [payload[i * step : (i + 1) * step] for i in range(self.num_frames)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_pylist()
        payloads = batch[self.payload_col].to_pylist()
        out_keys, out_fid, out_frames = [], [], []
        for k, p in zip(keys, payloads):
            for fid, fr in enumerate(self._frames(b"" if p is None else p)):
                out_keys.append(k)
                out_fid.append(fid)
                out_frames.append(fr)
        return pa.table({
            self.key_col: pa.array(out_keys, batch[self.key_col].type),
            "frame_id": pa.array(out_fid, pa.int32()),
            "frame": pa.array(out_frames, pa.binary()),
        })


def decode_and_featurize(ds, key_col: str = "url", payload_col: str = "payload",
                         batch_size: int = 128, concurrency=2):
    """Composed media pipeline: decode (actor pool, small batches for large
    payloads) → feature extract (actor pool)."""
    decoded = ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"key_col": key_col, "payload_col": payload_col},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
        num_cpus=1)
    return decoded.map_batches(
        ImageFeatureStage, fn_constructor_kwargs={"key_col": key_col},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
        num_cpus=1)
