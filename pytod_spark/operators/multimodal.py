"""Multimodal column plumbing (image/audio/video as opaque binary).

The Spark-side machinery — schema, partition-preserving mapInPandas,
Arrow batch shapes, typed metadata structs — is real and tested; the
actual codec step is stubbed (no image/audio libraries in this
container): ``decode_image`` raises NotImplementedError unless the
deterministic fake decoder is requested, which synthesizes stable
pseudo-pixels from the payload bytes so downstream feature plumbing
can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METADATA_SCHEMA = (
    "doc_id long, n_bytes long, payload_sha string, width int, height int, channels int"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stand-in ingest: treat the text bytes as an opaque media payload
    (binary column), as a real pipeline would carry raw JPEG/PCM."""
    return df.select(F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("payload"))


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic pseudo-header parse: dims derived from the sha of
    the payload (stable across runs/engines)."""
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 64, 16 + h[1] % 64, 1 + h[2] % 3


def extract_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched metadata extraction over the binary column — the
    shape a real header parser (PIL/ffprobe) would run in."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = pdf["payload"]
            dims = [_fake_dims(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "payload_sha": [hashlib.sha256(bytes(p)).hexdigest() for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                }
            )

    return df.mapInPandas(kernel, schema=METADATA_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: decode an image payload to an HxWxC uint8 array.

    Real decoding needs an image library absent from this container.
    ``fake=True`` returns deterministic pseudo-pixels seeded from the
    payload hash (for plumbing tests only).
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image codec library (not in this container); "
            "pass fake=True for deterministic pseudo-pixels in tests"
        )
    w, h, c = _fake_dims(payload)
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, c), dtype=np.uint8)


def image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Feature-extraction plumbing over (fake-)decoded images:
    mean/std of pixel values per channel-flattened frame. Real models
    would swap the kernel body; the Spark-side contract (schema,
    batching, partitioning) is what this exercises."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for i in range(len(pdf)):
                img = decode_image(bytes(pdf["payload"].iloc[i]), fake=True)
                rows.append(
                    (int(pdf[id_col].iloc[i]), float(img.mean()), float(img.std()),
                     int(img.shape[1]), int(img.shape[0]))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "pix_mean", "pix_std", "width", "height"]
            )

    return df.mapInPandas(
        kernel, schema="doc_id long, pix_mean double, pix_std double, width int, height int"
    )
