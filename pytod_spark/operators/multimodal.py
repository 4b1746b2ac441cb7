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


def _payload_bytes(p) -> bytes:
    """NULL payloads (e.g. from encoding NULL text) decode as empty
    blobs — the same empty-document convention as validation/features."""
    return b"" if p is None else bytes(p)


def extract_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched metadata extraction over the binary column — the
    shape a real header parser (PIL/ffprobe) would run in."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = pdf["payload"]
            dims = [_fake_dims(_payload_bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "n_bytes": [len(_payload_bytes(p)) for p in payloads],
                    "payload_sha": [hashlib.sha256(_payload_bytes(p)).hexdigest() for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                }
            )

    return df.mapInPandas(kernel, schema=METADATA_SCHEMA)


try:  # real codec when the environment provides one; stub otherwise
    from PIL import Image as _PIL_Image  # type: ignore
except ImportError:  # pragma: no cover - PIL absent in this container
    _PIL_Image = None


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWxC uint8 array.

    Uses PIL when importable (absent from this container — then this
    is a declared stub and raises NotImplementedError). ``fake=True``
    bypasses the codec entirely and returns deterministic
    pseudo-pixels seeded from the payload hash, so the surrounding
    Spark plumbing (schema, batching, partitioning) is testable in
    codec-less environments.
    """
    if fake:
        w, h, c = _fake_dims(payload)
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
        return np.random.default_rng(seed).integers(
            0, 256, size=(h, w, c), dtype=np.uint8
        )
    if _PIL_Image is not None:
        import io

        img = _PIL_Image.open(io.BytesIO(payload))
        arr = np.asarray(img)
        if arr.ndim == 2:  # grayscale -> HxWx1
            arr = arr[:, :, None]
        return np.ascontiguousarray(arr, dtype=np.uint8)
    raise NotImplementedError(
        "image decoding requires an image codec library (not in this container); "
        "pass fake=True for deterministic pseudo-pixels in tests"
    )


def image_features(df: DataFrame, id_col: str = "doc_id", fake: bool = True) -> DataFrame:
    """Feature-extraction plumbing over decoded images: mean/std of
    pixel values per channel-flattened frame. Real models would swap
    the kernel body; the Spark-side contract (schema, batching,
    partitioning) is what this exercises. ``fake=False`` uses the real
    codec path of decode_image (requires PIL)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for i in range(len(pdf)):
                img = decode_image(_payload_bytes(pdf["payload"].iloc[i]), fake=fake)
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


def resize_images(
    df: DataFrame, out_w: int, out_h: int, id_col: str = "doc_id", fake: bool = True
) -> DataFrame:
    """Resize plumbing: decode, nearest-neighbor resample to
    (out_h, out_w), re-emit as bytes + typed dims. Nearest-neighbor
    index math is pure numpy (a real pipeline swaps in a codec/SIMD
    resampler; batch shape, schema and partitioning are identical).
    ``fake=False`` uses the real codec path of decode_image."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, blobs, ws, hs, cs = [], [], [], [], []
            for i in range(len(pdf)):
                img = decode_image(_payload_bytes(pdf["payload"].iloc[i]), fake=fake)
                h, w, c = img.shape
                yi = (np.arange(out_h) * h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w // out_w).astype(np.int64)
                resized = img[yi][:, xi]
                ids.append(int(pdf[id_col].iloc[i]))
                blobs.append(resized.tobytes())
                ws.append(out_w)
                hs.append(out_h)
                cs.append(c)
            yield pd.DataFrame(
                {"doc_id": ids, "pixels": blobs, "width": ws, "height": hs,
                 "channels": cs}
            )

    return df.mapInPandas(
        kernel,
        schema="doc_id long, pixels binary, width int, height int, channels int",
    )


def sample_frames(
    df: DataFrame, n_frames: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: treat the
    payload as a stream of fixed-size pseudo-frames, emit every
    (len/n)-th frame as (doc_id, frame_idx, frame_sha, n_bytes) — one
    output row per sampled frame (the explode shape a real ffmpeg
    keyframe sampler produces). Deterministic; no codec needed for the
    plumbing contract."""
    frame_bytes = 256

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, idxs, shas, sizes = [], [], [], []
            for i in range(len(pdf)):
                payload = _payload_bytes(pdf["payload"].iloc[i])
                total = max(1, len(payload) // frame_bytes)
                step = max(1, total // n_frames)
                for k, f in enumerate(range(0, total, step)):
                    if k >= n_frames:
                        break
                    chunk = payload[f * frame_bytes:(f + 1) * frame_bytes]
                    ids.append(int(pdf[id_col].iloc[i]))
                    idxs.append(f)
                    shas.append(hashlib.sha256(chunk).hexdigest())
                    sizes.append(len(chunk))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_sha": shas,
                 "n_bytes": sizes}
            )

    return df.mapInPandas(
        kernel, schema="doc_id long, frame_idx int, frame_sha string, n_bytes int"
    )
