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


# --- PNG (stdlib zlib + numpy unfiltering) ----------------------------------


def test_png_roundtrip_every_filter_type():
    from philotes_spark.multimodal.binary_ops import decode_png, encode_png

    px = _img(7, 5, seed=11)
    for ft in range(5):
        got = decode_png(encode_png(px, filters=[ft] * 7))
        assert np.array_equal(got, px), f"filter {ft} roundtrip broke"
    # mixed per-row filters (the real-world case)
    got = decode_png(encode_png(px, filters=[0, 1, 2, 3, 4, 2, 1]))
    assert np.array_equal(got, px)


def test_png_crc_and_format_guards():
    from philotes_spark.multimodal.binary_ops import decode_png, encode_png

    raw = bytearray(encode_png(_img(3, 3)))
    raw[40] ^= 0xFF  # corrupt a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(raw))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNX" + b"\x00" * 16)


def test_png_grey_and_rgba_color_types():
    import struct
    import zlib

    from philotes_spark.multimodal.binary_ops import _PNG_SIG, decode_png

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    # 2×2 greyscale: values expand to all three channels
    grey = bytes([0, 10, 20, 0, 30, 40])  # two rows, filter 0
    png = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(grey))
        + chunk(b"IEND", b"")
    )
    got = decode_png(png)
    assert got.shape == (2, 2, 3)
    assert np.array_equal(got[..., 0], [[10, 20], [30, 40]])
    assert np.array_equal(got[..., 0], got[..., 1])

    # 1×2 RGBA: alpha dropped
    rgba = bytes([0, 1, 2, 3, 255, 4, 5, 6, 128])
    png = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(rgba))
        + chunk(b"IEND", b"")
    )
    got = decode_png(png)
    assert got.shape == (1, 2, 3)
    assert got.tolist() == [[[1, 2, 3], [4, 5, 6]]]


def test_decode_any_image_dispatch():
    from philotes_spark.multimodal.binary_ops import decode_any_image, encode_png

    px = _img(4, 4, seed=3)
    assert np.array_equal(decode_any_image(encode_ppm(px)), px)
    assert np.array_equal(decode_any_image(encode_png(px)), px)
    # JPEG now dispatches to the real baseline codec (exact on a flat
    # tile at gray 128, shape-exact always)
    from philotes_spark.multimodal.jpeg import encode_jpeg

    flat = np.full((8, 8, 3), 128, dtype=np.uint8)
    assert np.array_equal(decode_any_image(encode_jpeg(flat)), flat)
    with pytest.raises(ValueError, match="unrecognized"):
        decode_any_image(b"GIF89a...")


def test_decode_image_real_features_from_png():
    from philotes_spark.multimodal.binary_ops import FEATURE_DIM, decode_image, encode_png

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[..., 0] = 100
    feats = decode_image(encode_png(px))
    assert len(feats) == FEATURE_DIM
    # each 2×2 grid cell has (R,G,B) means (100, 0, 0)
    assert feats[0:3] == [100.0, 0.0, 0.0]
    assert feats[12:16] == [4.0, 4.0, 16.0, pytest.approx(100 / 3)]


def test_png_stats_pipeline(spark):
    from philotes_spark.multimodal.binary_ops import encode_png

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[..., 0] = 10
    px[..., 1] = 20
    px[..., 2] = 250
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(px, filters=[4, 3, 2, 1])))],
        "doc_id long, payload binary",
    )
    row = image_stats(df).select("image.*").collect()[0]
    assert (row.width, row.height, row.n_pixels) == (4, 4, 16)
    assert (row.mean_r, row.mean_g, row.mean_b) == (10.0, 20.0, 250.0)
