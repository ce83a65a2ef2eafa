"""Multimodal column plumbing — images/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched ``mapInPandas``.

The Spark-side machinery (schemas, partition-sized batch processing,
UDF signatures) is real and tested. ``_decode_one`` uses Pillow when it
is installed and the bytes parse as an image; otherwise it falls back
to a deterministic fake decode derived from the bytes (clearly marked)
so the container — which ships no image/audio libraries — still
exercises the full plumbing.

Scale design: media bytes stay columnar (never collected), batches are
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``, and
feature outputs are fixed-width arrays so downstream joins/aggregations
are pure JVM.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<format:string, width:int, height:int, duration_ms:int>"
)

try:  # pragma: no cover - not installed in this container
    from PIL import Image

    HAVE_PIL = True
except ImportError:
    Image = None
    HAVE_PIL = False


def _fake_decode(payload: bytes, out_hw: tuple[int, int]) -> np.ndarray:
    """Deterministic stand-in decode: bytes → pseudo-pixel grid.
    NOT an image decoder — a fixture generator for plumbing tests."""
    h = hashlib.sha256(payload).digest()
    rng = np.frombuffer((h * ((out_hw[0] * out_hw[1] * 3) // len(h) + 1))[: out_hw[0] * out_hw[1] * 3], dtype=np.uint8)
    return rng.reshape(out_hw[0], out_hw[1], 3)


def _decode_one(payload: bytes, resize_to: tuple[int, int]) -> np.ndarray:
    """Decode + resize one payload to an (H, W, 3) uint8 array.

    With Pillow available, real image bytes go through the real decoder;
    payloads Pillow cannot parse (e.g. the deterministic synth fixtures)
    fall back to ``_fake_decode`` so the plumbing keeps the same shape
    with or without the codec installed."""
    if HAVE_PIL:
        import io

        try:
            with Image.open(io.BytesIO(payload)) as img:
                rgb = img.convert("RGB").resize((resize_to[1], resize_to[0]))
                return np.asarray(rgb, dtype=np.uint8)
        except Exception:
            pass
    return _fake_decode(payload, resize_to)


def image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    resize_to: tuple[int, int] = (8, 8),
) -> DataFrame:
    """binary → fixed-width feature vector (mean-pooled channels of the
    resized decode) + basic stats. Output: (media_id, n_bytes,
    features array<float>)."""
    src = df.select(F.col(id_col), F.col(payload_col).alias("payload"))
    n_feat = resize_to[0] * resize_to[1] // 16 * 3

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nbytes, feats = [], [], []
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                ids.append(mid)
                nbytes.append(len(b))
                if not b:
                    feats.append([0.0] * n_feat)
                    continue
                img = _decode_one(b, resize_to).astype(np.float32) / 255.0
                pooled = img.reshape(resize_to[0] // 4, 4, resize_to[1] // 4, 4, 3).mean(axis=(1, 3))
                feats.append([float(x) for x in pooled.ravel()])
            yield pd.DataFrame({id_col: ids, "n_bytes": nbytes, "features": feats})

    return src.mapInPandas(
        _run, schema=f"{id_col} long, n_bytes long, features array<float>"
    )


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_frames: int = 4,
) -> DataFrame:
    """'Video' frame sampling stub: deterministic byte-range slices as
    frames (media_id, frame_idx, frame binary) — the explode shape a
    real ffmpeg-backed sampler would produce."""
    src = df.select(F.col(id_col), F.col(payload_col).alias("payload"))

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if not b:
                    continue
                step = max(1, len(b) // n_frames)
                for i in range(min(n_frames, len(b))):
                    rows.append((mid, i, b[i * step : i * step + step]))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame"])

    return src.mapInPandas(_run, schema=f"{id_col} long, frame_idx int, frame binary")


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{seed}/{i}".encode()).digest() * (4 + i % 7)
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (i, kind, payload, {"format": "fake", "width": 64, "height": 64, "duration_ms": 1000 * (i % 5)})
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
