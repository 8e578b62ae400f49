"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads are treated as opaque binary columns; decode
/ feature-extraction runs in Arrow-batched ``mapInPandas`` so the Spark
side (schema, partitioning, batch shape) is real and tested even though
the codec libraries are absent in this container — the decode kernels
are STUBBED behind ``decoder=`` hooks (deterministic fakes by default,
``NotImplementedError`` for the real codecs).

Design for 100 TB: binary payloads never pass through Catalyst
expressions (no codegen over megabyte blobs); per-batch Arrow transfer
sizes are bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
and repartitioning is by metadata (size buckets), never by payload.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "media_metadata",
    "extract_features",
    "fake_image_decoder",
    "real_image_decoder",
    "frame_sample",
]


def media_metadata(
    df: DataFrame, payload_col: str = "html", kind: str = "binary"
) -> DataFrame:
    """Typed metadata columns for an opaque payload: size, md5, magic
    prefix. Pure Catalyst; payloads stay columnar."""
    p = F.col(payload_col)
    return df.withColumn("media_size", F.length(p)).withColumn(
        "media_md5", F.md5(p)
    ).withColumn("media_magic", F.hex(F.substring(p, 1, 4))).withColumn(
        "media_kind", F.lit(kind)
    )


def fake_image_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for an image decode: derives an 8x8x3
    uint8 'thumbnail' from the payload digest. Keeps the full pipeline
    (batch shapes, schema, partitioning) testable without codec libs."""
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer((digest * 6)[:192], dtype=np.uint8)
    return arr.reshape(8, 8, 3)


def real_image_decoder(payload: bytes) -> np.ndarray:
    """The real decode hook. Image/audio libraries are not available in
    this container; plug in PIL/cv2/torchvision on a real cluster."""
    raise NotImplementedError(
        "image codec libraries are not installed in this environment; "
        "pass decoder=fake_image_decoder for plumbing tests or install "
        "PIL/cv2 on the cluster"
    )


def extract_features(
    df: DataFrame,
    payload_col: str = "html",
    id_col: str = "url",
    decoder: Callable[[bytes], np.ndarray] = fake_image_decoder,
    feature_dim: int = 16,
) -> DataFrame:
    """(id, features array<float>, height, width) via mapInPandas.

    The decoder produces an (H, W, C) array per payload; features are a
    deterministic channel-mean pooling flattened to ``feature_dim``.
    """
    out_schema = f"{id_col} string, features array<float>, height int, width int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # decode is inherently per-row; zip over columns avoids the
            # per-row Series construction cost of iterrows
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    rows.append((rid, None, 0, 0))
                    continue
                img = decoder(bytes(payload))
                h, w = img.shape[0], img.shape[1]
                pooled = img.astype(np.float32).mean(axis=2).reshape(-1)
                if pooled.size >= feature_dim:
                    feats = pooled[:feature_dim]
                else:
                    feats = np.pad(pooled, (0, feature_dim - pooled.size))
                rows.append((rid, (feats / 255.0).tolist(), h, w))
            yield pd.DataFrame(
                rows, columns=[id_col, "features", "height", "width"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def frame_sample(
    df: DataFrame,
    payload_col: str = "html",
    id_col: str = "url",
    n_frames: int = 4,
    decoder: Callable[[bytes], np.ndarray] | None = None,
) -> DataFrame:
    """(id, frame_idx, frame binary) — deterministic frame sampling.

    For a real video codec, ``decoder`` yields frames; the default fake
    slices the payload into n_frames deterministic chunks, preserving
    the batch/schema contract.
    """
    out_schema = f"{id_col} string, frame_idx int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    chunk = b[i * step : (i + 1) * step]
                    if chunk:
                        rows.append({id_col: rid, "frame_idx": i, "frame": chunk})
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame"])

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)
