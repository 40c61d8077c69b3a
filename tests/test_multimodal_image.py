"""REAL PPM image codec (multimodal §2C): roundtrip identity, header
edge cases, nearest-neighbor resize math, and the distributed stats
pipeline."""

import numpy as np
import pytest

from philotes_spark.multimodal.binary_ops import (
    decode_ppm,
    encode_ppm,
    image_stats,
    resize_ppm,
)


def _img(h, w, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_roundtrip_identity():
    px = _img(5, 9)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)


def test_header_comments_and_whitespace():
    px = _img(2, 3)
    raw = encode_ppm(px)
    body = raw.split(b"\n", 3)[3]
    weird = b"P6 # binary ppm\n# another comment\n 3\t2 \n255\n" + body
    assert np.array_equal(decode_ppm(weird), px)


def test_decoder_rejects_bad_input():
    with pytest.raises(ValueError, match="not a binary PPM"):
        decode_ppm(b"P3\n1 1\n255\n000")
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n4 4\n255\n\x00\x01")


def test_nearest_neighbor_resize_picks_exact_pixels():
    px = _img(8, 8)
    small = decode_ppm(resize_ppm(encode_ppm(px), 4, 4))
    # 2x downscale: (y', x') ← (2y', 2x')
    assert np.array_equal(small, px[::2, ::2])
    # upscale repeats source pixels, never invents values
    big = decode_ppm(resize_ppm(encode_ppm(px), 16, 16))
    assert np.array_equal(big[::2, ::2], px)


def test_image_stats_pipeline(spark):
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[..., 0] = 10  # R
    px[..., 1] = 20  # G
    px[..., 2] = 250  # B
    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(px)))], "doc_id long, payload binary"
    )
    row = image_stats(df).select("image.*").collect()[0]
    assert (row.width, row.height, row.n_pixels) == (4, 4, 16)
    assert (row.mean_r, row.mean_g, row.mean_b) == (10.0, 20.0, 250.0)
