"""Built-in real-codec path (operators/multimodal.py): PPM/BMP decode
round-trips, dispatch, and the fake=False Spark kernels."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pytod_spark.operators.multimodal import (
    _decode_bmp,
    _decode_ppm,
    decode_image,
    encode_bmp,
    encode_ppm,
    image_features,
    image_pixel_stats,
    resize_images,
    synthesize_image_payloads,
)


def _rgb(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_ppm_round_trip_rgb_and_gray():
    a = _rgb(5, 7)
    assert np.array_equal(_decode_ppm(encode_ppm(a)), a)
    g = _rgb(4, 6)[:, :, :1]
    assert np.array_equal(_decode_ppm(encode_ppm(g)), g)
    # 2-D gray input encodes as P5
    g2 = g[:, :, 0]
    assert np.array_equal(_decode_ppm(encode_ppm(g2)), g)


def test_ppm_header_comments_and_truncation():
    a = _rgb(3, 3)
    payload = encode_ppm(a)
    commented = b"P6\n# a comment line\n3 3\n# another\n255\n" + payload.split(b"255\n", 1)[1]
    assert np.array_equal(_decode_ppm(commented), a)
    with pytest.raises(ValueError, match="truncated"):
        _decode_ppm(payload[:-2])


def test_bmp_round_trip_with_row_padding():
    # w=5 -> 15-byte rows padded to 16: exercises the stride math
    a = _rgb(4, 5, seed=3)
    assert np.array_equal(_decode_bmp(encode_bmp(a)), a)
    a2 = _rgb(6, 8, seed=4)  # stride-aligned width too
    assert np.array_equal(_decode_bmp(encode_bmp(a2)), a2)


def test_decode_image_dispatch():
    a = _rgb(4, 5, seed=9)
    assert np.array_equal(decode_image(encode_ppm(a)), a)
    assert np.array_equal(decode_image(encode_bmp(a)), a)
    with pytest.raises((NotImplementedError, Exception)):
        decode_image(b"\x89PNG\r\n\x1a\nnot really a png")


def test_image_features_real_codec(spark):
    """fake=False end-to-end through Spark: mean/std/width/height of
    the decoded array must match numpy on the same synthesized image."""
    df = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    payloads = synthesize_image_payloads(df)
    got = {r.doc_id: r for r in image_features(payloads, fake=False).collect()}
    assert len(got) == 20
    for did in (0, 1, 7):  # even=PPM, odd=BMP
        w, h = 8 + did % 9, 8 + did % 7
        v = ((did * 7 + np.arange(w * h * 3)) % 256).reshape(h, w, 3)
        r = got[did]
        assert (r.width, r.height) == (w, h)
        assert r.pix_mean == pytest.approx(float(v.mean()))
        assert r.pix_std == pytest.approx(float(v.std()))


def test_image_pixel_stats_real_codec(spark):
    df = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    got = {r.doc_id: r for r in
           image_pixel_stats(synthesize_image_payloads(df), fake=False).collect()}
    for did in range(12):
        w, h = 8 + did % 9, 8 + did % 7
        v = ((did * 7 + np.arange(w * h * 3)) % 256).astype(np.int64)
        assert got[did].pix_sum == int(v.sum())
        assert got[did].pix_sqsum == int((v * v).sum())


def test_resize_images_real_codec(spark):
    df = spark.createDataFrame([(2,), (3,)], "doc_id long")
    out = resize_images(synthesize_image_payloads(df), 4, 4, fake=False).collect()
    assert {(r.width, r.height) for r in out} == {(4, 4)}
    for r in out:
        did = r.doc_id
        w, h = 8 + did % 9, 8 + did % 7
        v = ((did * 7 + np.arange(w * h * 3)) % 256).astype(np.uint8).reshape(h, w, 3)
        yi = (np.arange(4) * h // 4)
        xi = (np.arange(4) * w // 4)
        assert bytes(r.pixels) == v[yi][:, xi].tobytes()
