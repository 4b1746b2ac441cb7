"""Multimodal column plumbing (image/audio/video as opaque binary).

The Spark-side machinery — schema, partition-preserving mapInPandas,
Arrow batch shapes, typed metadata structs — is real and tested, and
since round 5 so is the REAL decode path: built-in dependency-free
codecs for two fully-specified uncompressed formats (netpbm PPM P5/P6
and 24-bit BMP) execute ``decode_image(fake=False)`` end-to-end in
this codec-less container (tests + an oracle-checked catalogue row,
``image_pixel_stats``). Compressed formats (JPEG/PNG) still dispatch
to PIL when importable and raise NotImplementedError otherwise — a
production deployment swaps the codec without touching any Spark
code. ``fake=True`` remains available for plumbing tests over
arbitrary payload bytes (deterministic pseudo-pixels from the payload
hash).
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


try:  # richer codec coverage when the environment provides PIL
    from PIL import Image as _PIL_Image  # type: ignore
except ImportError:  # pragma: no cover - PIL absent in this container
    _PIL_Image = None


# ------------------------- built-in codecs (PPM P5/P6, BMP 24-bit) --
#
# Dependency-free decoders for two trivial uncompressed formats so the
# REAL (fake=False) decode path executes in codec-less environments —
# the plumbing around them (schema, batching, partitioning) is format-
# agnostic, and a production deployment swaps PIL/turbojpeg in without
# touching any Spark code. Both formats are fully specified public
# layouts (netpbm PPM; Windows BITMAPINFOHEADER BMP).


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary netpbm: P6 (RGB) -> HxWx3, P5 (gray) -> HxWx1."""
    magic = payload[:2]
    channels = 3 if magic == b"P6" else 1
    # header tokens (width, height, maxval) separated by whitespace,
    # '#' comments run to end-of-line; ONE whitespace byte then raster
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported by the built-in codec")
    n = w * h * channels
    raster = payload[pos:pos + n]
    if len(raster) != n:
        raise ValueError(f"PPM raster truncated: {len(raster)} of {n} bytes")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, channels)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP -> HxWx3 (RGB). Handles the
    4-byte row padding and the bottom-up row order."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"built-in BMP codec handles uncompressed 24-bit only "
            f"(got bpp={bpp}, compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload[data_off:data_off + stride * h], dtype=np.uint8
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR -> RGB


def encode_ppm(arr: np.ndarray) -> bytes:
    """HxWx3 -> binary P6, HxWx1 (or HxW) -> binary P5 — the test/
    synthesis encoder for the built-in decoder."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    magic = b"P6" if c == 3 else b"P5"
    if c not in (1, 3):
        raise ValueError(f"PPM needs 1 or 3 channels, got {c}")
    return magic + f"\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()


def encode_bmp(arr: np.ndarray) -> bytes:
    """HxWx3 RGB -> uncompressed 24-bit bottom-up BMP."""
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    raster[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    body = raster.tobytes()
    dib = (
        (40).to_bytes(4, "little") + w.to_bytes(4, "little")
        + h.to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little") + b"\x00" * 16
    )
    header = b"BM" + (14 + len(dib) + len(body)).to_bytes(4, "little") \
        + b"\x00" * 4 + (14 + len(dib)).to_bytes(4, "little")
    return header + dib + body


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWxC uint8 array.

    ``fake=False`` (the REAL path) dispatches by magic bytes: PPM
    (P5/P6) and uncompressed 24-bit BMP decode through the built-in
    dependency-free codecs above; anything else goes to PIL when
    importable and raises NotImplementedError otherwise (JPEG/PNG need
    a codec library this container lacks). ``fake=True`` bypasses
    decoding entirely and returns deterministic pseudo-pixels seeded
    from the payload hash, for exercising the Spark plumbing with
    arbitrary payload bytes.
    """
    if fake:
        w, h, c = _fake_dims(payload)
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
        return np.random.default_rng(seed).integers(
            0, 256, size=(h, w, c), dtype=np.uint8
        )
    if payload[:2] in (b"P5", b"P6"):
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if _PIL_Image is not None:
        import io

        img = _PIL_Image.open(io.BytesIO(payload))
        arr = np.asarray(img)
        if arr.ndim == 2:  # grayscale -> HxWx1
            arr = arr[:, :, None]
        return np.ascontiguousarray(arr, dtype=np.uint8)
    raise NotImplementedError(
        "payload is neither PPM nor 24-bit BMP (the built-in codecs) and "
        "no codec library is importable; pass fake=True for deterministic "
        "pseudo-pixels, or install PIL for JPEG/PNG"
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


def synthesize_image_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL image payloads for codec-path tests and the
    oracle-checked catalogue row: per id, a (8 + id%9) x (8 + id%7) x 3
    image with pixel k = (id*7 + k) % 256 in row-major RGB order,
    encoded as PPM (even ids) or 24-bit BMP (odd ids) — both built-in
    codecs decode back to the identical array, so one closed-form
    oracle covers both formats."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, blobs = [], []
            for did in pdf[id_col]:
                did = int(did)
                w, h = 8 + did % 9, 8 + did % 7
                v = ((did * 7 + np.arange(w * h * 3)) % 256).astype(
                    np.uint8
                ).reshape(h, w, 3)
                ids.append(did)
                blobs.append(encode_ppm(v) if did % 2 == 0 else encode_bmp(v))
            yield pd.DataFrame({"doc_id": ids, "payload": blobs})

    return df.select(id_col).mapInPandas(kernel, schema="doc_id long, payload binary")


def image_pixel_stats(df: DataFrame, id_col: str = "doc_id", fake: bool = False) -> DataFrame:
    """Exact integer pixel aggregates per decoded image — (width,
    height, sum, sum-of-squares), the hash-stable feature row the
    catalogue oracle checks. fake=False runs the REAL codec dispatch
    (built-in PPM/BMP here; PIL formats where installed)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for i in range(len(pdf)):
                img = decode_image(_payload_bytes(pdf["payload"].iloc[i]), fake=fake)
                a = img.astype(np.int64)
                rows.append(
                    (int(pdf[id_col].iloc[i]), int(img.shape[1]),
                     int(img.shape[0]), int(a.sum()), int((a * a).sum()))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "pix_sum", "pix_sqsum"]
            )

    return df.mapInPandas(
        kernel,
        schema="doc_id long, width int, height int, pix_sum long, pix_sqsum long",
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
