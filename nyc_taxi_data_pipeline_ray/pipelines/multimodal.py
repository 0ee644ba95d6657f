"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video are opaque ``binary`` columns with typed metadata
columns; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages.  The decode libraries (PIL, ffmpeg,
torchaudio...) are NOT in this container, so the byte->pixels step is
STUBBED: ``DecodeMedia`` tries the real import and otherwise uses a
deterministic fake decoder (payload-hash-seeded), keeping all the
Ray-side plumbing — schema, batch sizing, actor signature, output
layout — real and tested.

Scale note: binary payloads dominate block size; batches are sized in
rows here but the stage accepts ``batch_size`` so callers keep
``batch_size x payload x concurrency`` under the worker heap (guide:
large binary rows -> small batches).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

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


def synthetic_media_table(n: int = 200, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded random bytes)."""
    rng = np.random.default_rng(seed)
    kinds = np.where(rng.random(n) < 0.6, "image", "audio")
    payload = [rng.integers(0, 256, int(rng.integers(64, 4096)), dtype=np.uint8).tobytes() for _ in range(n)]
    is_img = kinds == "image"
    width = np.where(is_img, rng.integers(32, 1920, n), 0).astype(np.int32)
    height = np.where(is_img, rng.integers(32, 1080, n), 0).astype(np.int32)
    sr = np.where(~is_img, rng.choice([8000, 16000, 44100], n), 0).astype(np.int32)
    dur = np.where(~is_img, rng.integers(100, 60_000, n), 0).astype(np.int32)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds.astype(object), pa.string()),
            "payload": pa.array(payload, pa.binary()),
            "width": pa.array(np.where(is_img, width, None), pa.int32()),
            "height": pa.array(np.where(is_img, height, None), pa.int32()),
            "sample_rate": pa.array(np.where(~is_img, sr, None), pa.int32()),
            "duration_ms": pa.array(np.where(~is_img, dur, None), pa.int32()),
        }
    )


class DecodeMedia:
    """Actor-pool decode stage.  Real decoders load once in __init__
    (the model-load-per-actor pattern); absent libs -> deterministic
    fake decode so the pipeline shape stays testable."""

    def __init__(self, *, require_real: bool = False):
        self.real = False
        try:  # pragma: no cover - PIL not in this container
            from PIL import Image  # noqa: F401

            self.real = True
        except ImportError:
            if require_real:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/ffmpeg, not present "
                    "in this environment; run with require_real=False for the "
                    "deterministic stub decoder"
                )

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        # deterministic "decode": feature vector from payload bytes
        feats = np.zeros((len(payloads), 16), np.float64)
        sizes = np.zeros(len(payloads), np.int64)
        for i, b in enumerate(payloads):
            arr = np.frombuffer(b, dtype=np.uint8)
            sizes[i] = len(arr)
            # 16 byte-histogram buckets, L1-normalized: a stand-in embedding
            hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
            feats[i] = hist / max(hist.sum(), 1)
        out = t.drop_columns(["payload"])
        out = out.append_column("payload_bytes", pa.array(sizes))
        out = out.append_column("features", pa.array(list(feats)))
        return out


def resize_spec(t: pa.Table, *, max_dim: int = 224) -> pa.Table:
    """Resize planning stage (vectorized): target dims preserving aspect
    ratio, capped at max_dim — the transform a real decoder would apply."""
    w = t["width"].to_numpy(zero_copy_only=False).astype(np.float64)
    h = t["height"].to_numpy(zero_copy_only=False).astype(np.float64)
    scale = np.minimum(1.0, max_dim / np.maximum(np.maximum(w, h), 1))
    tw = np.where(np.isnan(w), np.nan, np.round(w * scale))
    th = np.where(np.isnan(h), np.nan, np.round(h * scale))
    t = t.append_column("target_w", pa.array(tw, pa.float64()))
    t = t.append_column("target_h", pa.array(th, pa.float64()))
    return t


def frame_sample_spec(t: pa.Table, *, every_ms: int = 1000) -> pa.Table:
    """Frame/segment sampling plan for audio/video rows."""
    dur = t["duration_ms"].to_numpy(zero_copy_only=False).astype(np.float64)
    n_frames = np.where(np.isnan(dur), np.nan, np.ceil(dur / every_ms))
    return t.append_column("n_samples", pa.array(n_frames, pa.float64()))


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
