"""Multimodal columns: image/audio/video as opaque ``binary`` +
typed metadata, with decode / feature-extract / frame-sample as
Arrow-batched ``mapInPandas`` stages.

The decode step is STUBBED (no image/audio libraries in this
environment): ``decode=\"fake\"`` runs a deterministic pure-numpy fake
decoder so the Spark-side plumbing — schema, batch shape, partition
behavior — is real and tested; ``decode=\"real\"`` raises
NotImplementedError where PIL/ffmpeg would be called.

Schema convention:
    media(url string, kind string, payload binary,
          meta struct<width:int, height:int, sample_rate:int,
                      duration_ms:int, codec:string>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "url string, kind string, payload binary, "
    "meta struct<width:int,height:int,sample_rate:int,"
    "duration_ms:int,codec:string>"
)

FEATURE_DIM = 32

FEATURES_SCHEMA = (
    "url string, kind string, n_bytes long, feature array<float>"
)


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for an image/audio decoder: expands the
    payload bytes into a pseudo-signal via seeded hashing.  Real
    decoding would be `PIL.Image.open` / `soundfile.read` here."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(256)


def _real_decode(payload: bytes, kind: str) -> np.ndarray:
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg/soundfile — not available in "
        "this environment; use decode='fake' for plumbing tests"
    )


def extract_media_features(
    media: DataFrame, dim: int = FEATURE_DIM, decode: str = "fake"
) -> DataFrame:
    """media → (url, kind, n_bytes, feature) via mapInPandas.

    Batch shape: whole Arrow batches in, one output row per input row;
    the decoder runs per element but all orchestration is vectorized.
    Map-only — partitioning preserved from the scan.
    """
    decoder = _fake_decode if decode == "fake" else _real_decode

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            signals = [
                decoder(b if b is not None else b"", k)
                for b, k in zip(pdf["payload"], pdf["kind"])
            ]
            feats = [
                np.abs(np.fft.rfft(s))[:dim].astype(np.float32).tolist()
                for s in signals
            ]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(b or b"") for b in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(_fn, FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, decode: str = "fake"
) -> DataFrame:
    """Video frame-sampling plumbing: 1 row → N frame rows
    (url, frame_idx, ts_ms, frame_feature).  Frame decode is the same
    stub; the row-explosion shape and schema are real."""
    decoder = _fake_decode if decode == "fake" else _real_decode

    schema = "url string, frame_idx int, ts_ms long, frame_feature array<float>"

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": [], "frame_idx": [], "ts_ms": [], "frame_feature": []}
            for url, payload, meta in zip(pdf["url"], pdf["payload"], pdf["meta"]):
                dur = (meta or {}).get("duration_ms") or 0
                n_frames = max(1, int(dur // every_ms))
                sig = decoder(payload if payload is not None else b"", "video")
                for i in range(n_frames):
                    rows["url"].append(url)
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(i * every_ms)
                    rows["frame_feature"].append(
                        np.roll(sig, i)[:8].astype(np.float32).tolist()
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(_fn, schema)


def synthetic_media(spark, n: int = 24, seed: int = 42):
    """Deterministic media fixture rows."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(64 + i))
        meta = {
            "width": 64 if kind == "image" else None,
            "height": 48 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": 3500 if kind == "video" else None,
            "codec": {"image": "png", "audio": "pcm", "video": "h264"}[kind],
        }
        rows.append((f"https://m.example.com/{kind}/{i}", kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
