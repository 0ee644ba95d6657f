"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video are opaque ``binary`` columns with typed metadata
columns; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages.

The decode step is REAL for the formats the standard library can
handle: **PPM (P6) images** are parsed and nearest-neighbor-resized in
numpy, **WAV (PCM16) audio** is decoded with ``wave`` and
frame-sampled for per-second RMS energy — actual bytes -> pixels ->
features, not a simulation.  Container formats that require external
codecs (JPEG/PNG/MP3/MP4: PIL / ffmpeg are not in this container) fall
back to a deterministic payload-hash feature stub, clearly separated;
``require_real=True`` makes an unsupported payload an error instead.

Scale note: binary payloads dominate block size; batches are sized in
rows here but the stage accepts ``batch_size`` so callers keep
``batch_size x payload x concurrency`` under the worker heap (guide:
large binary rows -> small batches).
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from nyc_taxi_data_pipeline_ray.stages import replace_column

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio
        ("payload", pa.binary()),       # opaque encoded bytes
        ("width", pa.int32()),          # image metadata (null for audio)
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),    # audio metadata (null for image)
        ("duration_ms", pa.int32()),
    ]
)


# ------------------------------------------------------------------ encoders
def _encode_ppm(rng: np.random.Generator, w: int, h: int) -> bytes:
    """Real P6 PPM: ASCII header + raw RGB24 (deterministic pixels)."""
    pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    return f"P6\n{w} {h}\n255\n".encode("ascii") + pix.tobytes()


def _encode_wav(rng: np.random.Generator, sr: int, dur_ms: int) -> bytes:
    """Real RIFF/WAV, mono PCM16: a seeded tone + noise."""
    n = max(int(sr * dur_ms / 1000), 1)
    t = np.arange(n) / sr
    f = float(rng.integers(100, 2000))
    sig = 0.6 * np.sin(2 * np.pi * f * t) + 0.1 * rng.standard_normal(n)
    pcm = np.clip(sig * 32767, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


# ------------------------------------------------------------------ decoders
def decode_ppm(b: bytes) -> np.ndarray:
    """P6 PPM -> (h, w, 3) uint8, pure numpy."""
    if not b.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts = []
    pos = 2
    while len(parts) < 3:  # w, h, maxval (comments not generated here)
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        parts.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, _ = parts
    return np.frombuffer(b, np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3)


def decode_wav(b: bytes) -> tuple[int, np.ndarray]:
    """WAV -> (sample_rate, int16 samples), stdlib only."""
    with wave.open(io.BytesIO(b), "rb") as wf:
        sr = wf.getframerate()
        pcm = np.frombuffer(wf.readframes(wf.getnframes()), "<i2")
    return sr, pcm


def nn_resize(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy index maps."""
    h, w = img.shape[:2]
    ri = (np.arange(th) * h // th).clip(0, h - 1)
    ci = (np.arange(tw) * w // tw).clip(0, w - 1)
    return img[ri][:, ci]


def synthetic_media_table(n: int = 200, seed: int = 42) -> pa.Table:
    """Deterministic media rows with REAL encoded payloads: P6 images
    and PCM16 WAVs whose metadata matches the encoded content, plus a
    small share of 'codec-needed' payloads exercising the stub path."""
    rng = np.random.default_rng(seed)
    r = rng.random(n)
    kinds = np.where(r < 0.55, "image", np.where(r < 0.9, "audio", "image"))
    needs_codec = r >= 0.9  # stands in for JPEG/PNG rows
    payload: list[bytes] = []
    width = np.zeros(n, np.int32)
    height = np.zeros(n, np.int32)
    sr_arr = np.zeros(n, np.int32)
    dur = np.zeros(n, np.int32)
    for i in range(n):
        if kinds[i] == "image":
            w = int(rng.integers(8, 64))
            h = int(rng.integers(8, 64))
            width[i], height[i] = w, h
            if needs_codec[i]:  # opaque "compressed" bytes (no codec here)
                payload.append(b"\xff\xd8" + rng.bytes(int(rng.integers(64, 512))))
            else:
                payload.append(_encode_ppm(rng, w, h))
        else:
            sr = int(rng.choice([8000, 16000]))
            d = int(rng.integers(100, 1500))
            sr_arr[i], dur[i] = sr, d
            payload.append(_encode_wav(rng, sr, d))
    is_img = kinds == "image"
    return pa.table(
        {
            "media_id": np.arange(n, dtype=np.int64),
            "kind": kinds.astype(object),
            "payload": payload,
            "width": np.where(is_img, width, None),
            "height": np.where(is_img, height, None),
            "sample_rate": np.where(~is_img, sr_arr, None),
            "duration_ms": np.where(~is_img, dur, None),
        },
        schema=MEDIA_SCHEMA,
    )


class DecodeMedia:
    """Actor-pool decode stage (setup once per actor in ``__init__``,
    per-batch work in ``__call__``).

    REAL paths: P6 PPM -> numpy pixels -> aspect-preserving NN resize
    to ``max_dim`` -> 16-bin luminance histogram (L1-normalized);
    WAV -> PCM16 samples -> per-second RMS frames -> 16-dim normalized
    energy profile.  Unknown formats (JPEG et al. — codecs absent from
    this container) use a deterministic payload-histogram stub, or
    raise with ``require_real=True``."""

    def __init__(self, *, require_real: bool = False, max_dim: int = 224):
        self.require_real = require_real
        self.max_dim = max_dim

    def _image_features(self, b: bytes) -> np.ndarray:
        img = decode_ppm(b)
        h, w = img.shape[:2]
        scale = min(1.0, self.max_dim / max(h, w))
        th, tw = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
        img = nn_resize(img, tw, th)
        # real luminance (Rec.601 integer approx), 16-bin histogram
        lum = (
            299 * img[..., 0].astype(np.int64)
            + 587 * img[..., 1].astype(np.int64)
            + 114 * img[..., 2].astype(np.int64)
        ) // 1000
        hist = np.bincount((lum >> 4).ravel(), minlength=16).astype(np.float64)
        return hist / max(hist.sum(), 1)

    def _audio_features(self, b: bytes) -> np.ndarray:
        sr, pcm = decode_wav(b)
        if len(pcm) == 0:
            return np.zeros(16)
        # frame-sample: per-second windows, RMS energy each
        n_frames = min(max(int(np.ceil(len(pcm) / sr)), 1), 16)
        feats = np.zeros(16)
        for i in range(n_frames):
            seg = pcm[i * sr : (i + 1) * sr].astype(np.float64)
            if len(seg):
                feats[i] = np.sqrt((seg**2).mean())
        s = feats.sum()
        return feats / s if s > 0 else feats

    def _stub_features(self, b: bytes) -> np.ndarray:
        arr = np.frombuffer(b, dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
        return hist / max(hist.sum(), 1)

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        feats = np.zeros((len(payloads), 16), np.float64)
        sizes = np.zeros(len(payloads), np.int64)
        real = np.zeros(len(payloads), bool)
        for i, b in enumerate(payloads):
            sizes[i] = len(b)
            if b.startswith(b"P6"):
                feats[i] = self._image_features(b)
                real[i] = True
            elif b.startswith(b"RIFF"):
                feats[i] = self._audio_features(b)
                real[i] = True
            elif self.require_real:
                raise NotImplementedError(
                    "payload needs an external codec (JPEG/PNG/MP3...) not "
                    "present in this environment; run with require_real=False "
                    "for the deterministic stub features"
                )
            else:
                feats[i] = self._stub_features(b)
        out = t.drop_columns(["payload"])
        out = replace_column(out, "payload_bytes", pa.array(sizes))
        out = replace_column(out, "real_decode", pa.array(real))
        # type-stable even for a 0-row batch: pa.array([]) would infer
        # NULL type and break schema unification across blocks
        out = replace_column(
            out,
            "features",
            pa.FixedSizeListArray.from_arrays(pa.array(feats.ravel()), 16),
        )
        return out


def resize_spec(t: pa.Table, *, max_dim: int = 224) -> pa.Table:
    """Resize planning stage (vectorized): target dims preserving aspect
    ratio, capped at max_dim — the plan ``DecodeMedia`` executes."""
    w = t["width"].to_numpy(zero_copy_only=False).astype(np.float64)
    h = t["height"].to_numpy(zero_copy_only=False).astype(np.float64)
    scale = np.minimum(1.0, max_dim / np.maximum(np.maximum(w, h), 1))
    # same >=1 clamp as DecodeMedia._image_features: the plan must agree
    # with execution (a 1x500 image at max_dim=224 would otherwise plan
    # a 0-pixel width the decode path never produces)
    tw = np.where(np.isnan(w), np.nan, np.maximum(np.round(w * scale), 1))
    th = np.where(np.isnan(h), np.nan, np.maximum(np.round(h * scale), 1))
    t = replace_column(t, "target_w", pa.array(tw, pa.float64()))
    t = replace_column(t, "target_h", pa.array(th, pa.float64()))
    return t


def frame_sample_spec(t: pa.Table, *, every_ms: int = 1000) -> pa.Table:
    """Frame/segment sampling plan for audio/video rows."""
    dur = t["duration_ms"].to_numpy(zero_copy_only=False).astype(np.float64)
    n_frames = np.where(np.isnan(dur), np.nan, np.ceil(dur / every_ms))
    return replace_column(t, "n_samples", pa.array(n_frames, pa.float64()))


def media_pipeline(ds: rd.Dataset, *, batch_size: int = 256, concurrency: int = 2) -> rd.Dataset:
    """decode (actor pool, small batches) -> resize plan -> sample plan."""
    ds = ds.map_batches(
        DecodeMedia,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    ds = ds.map_batches(resize_spec, batch_format="pyarrow")
    ds = ds.map_batches(frame_sample_spec, batch_format="pyarrow")
    return ds


def q_media_features(sf_dir: str) -> pd.DataFrame:
    """Rows-only query: synthetic media table through the full pipeline.
    (``sf_dir`` scales the row count so bigger SF exercises bigger data.)"""
    n = 200 if "0.001" in sf_dir else (1000 if "0.01" in sf_dir else 5000)
    ds = rd.from_arrow(synthetic_media_table(n))
    out = media_pipeline(ds).to_pandas()
    out["feat_l1"] = out["features"].map(lambda f: float(np.round(np.abs(f).sum(), 4)))
    return out.drop(columns=["features"]).sort_values("media_id", ignore_index=True)
