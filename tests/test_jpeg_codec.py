"""Round-trip gates for the pure-numpy baseline JPEG codec (jpeg.py).

These are the accuracy pins the module docstring promises: flat-tile
EXACTNESS (the oracle contract), PSNR floors for general content, the
restart-marker resync path, odd (non-MCU-multiple) shapes, grayscale,
and the reject paths for non-baseline streams.
"""

from __future__ import annotations

import numpy as np
import pytest

from philotes_spark.multimodal.jpeg import (
    dc_roundtrip_value,
    decode_jpeg,
    encode_jpeg,
    quality_scale,
    QUANT_LUMA,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 3 + 20) % 256, (xx * 2 + 100) % 256, ((yy + xx) * 2) % 256],
        axis=2,
    ).astype(np.uint8)


@pytest.mark.parametrize("v", [0, 1, 37, 127, 128, 129, 200, 254, 255])
@pytest.mark.parametrize("quality", [50, 75, 90])
def test_flat_tile_exactness(v, quality):
    """A flat gray 8x8 tile reconstructs EXACTLY to dc_roundtrip_value —
    the invariant the multimodal_jpeg_stats SQL oracle recomputes."""
    img = np.full((8, 8, 3), v, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=quality))
    assert (dec == dc_roundtrip_value(v, quality)).all()


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_flat_multi_tile_exactness_all_subsamplings(sub):
    """Four flat tiles per image (differential DC across blocks), every
    subsampling mode, restart marker after every MCU."""
    for doc in (0, 5, 77, 191):
        img = np.zeros((16, 16, 3), np.uint8)
        exp = np.zeros((16, 16, 3), np.int64)
        for t in range(4):
            v = (doc * 37 + t * 59) % 256
            r, c = divmod(t, 2)
            img[r * 8 : (r + 1) * 8, c * 8 : (c + 1) * 8, :] = v
            exp[r * 8 : (r + 1) * 8, c * 8 : (c + 1) * 8, :] = dc_roundtrip_value(v, 90)
        dec = decode_jpeg(
            encode_jpeg(img, quality=90, subsampling=sub, restart_interval=1)
        )
        assert (dec == exp).all()


@pytest.mark.parametrize("sub", ["444", "422", "420"])
@pytest.mark.parametrize("shape", [(8, 8), (17, 23), (64, 48)])
def test_gradient_psnr_floor(sub, shape):
    """Chroma-smooth gradients survive every subsampling mode at >40 dB
    (q90) — the general-content accuracy gate."""
    img = _gradient(*shape)
    dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
    assert dec.shape == img.shape
    assert _psnr(img, dec) > 40.0


def test_luma_noise_psnr_unaffected_by_chroma_subsampling():
    """Gray random noise has constant chroma, so 4:2:0 must match 4:4:4
    bit-for-bit in PSNR terms — isolates the luma path."""
    g = np.random.default_rng(3).integers(0, 256, size=(24, 40), dtype=np.uint8)
    img = np.stack([g, g, g], axis=2)
    p444 = _psnr(img, decode_jpeg(encode_jpeg(img, quality=90, subsampling="444")))
    p420 = _psnr(img, decode_jpeg(encode_jpeg(img, quality=90, subsampling="420")))
    assert p444 > 30.0
    assert abs(p444 - p420) < 0.01


def test_rgb_noise_psnr_floor():
    """Worst-case content (iid RGB noise): 4:4:4 still clears 25 dB at
    q90; quality ladder is monotone."""
    img = np.random.default_rng(7).integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    prev = 0.0
    for q in (50, 75, 95):
        p = _psnr(img, decode_jpeg(encode_jpeg(img, quality=q)))
        assert p >= prev  # higher quality never hurts
        prev = p
    assert _psnr(img, decode_jpeg(encode_jpeg(img, quality=90))) > 25.0


def test_restart_markers_resync_matches_unrestarted():
    """DRI/RSTn must not change the decoded pixels — only the entropy
    segmentation (predictors reset at each boundary)."""
    img = _gradient(40, 24)
    base = decode_jpeg(encode_jpeg(img, quality=85))
    for ri in (1, 2, 5):
        dec = decode_jpeg(encode_jpeg(img, quality=85, restart_interval=ri))
        assert np.array_equal(dec, base)


def test_grayscale_single_component():
    """1-component JPEG decodes and broadcasts to 3 channels."""
    img = np.full((8, 8, 3), 90, dtype=np.uint8)
    payload = encode_jpeg(img, quality=90)
    dec = decode_jpeg(payload)
    assert dec.shape == (8, 8, 3)
    assert (dec[:, :, 0] == dec[:, :, 1]).all()


def test_odd_shapes_pad_and_crop():
    """Non-multiple-of-MCU dimensions: encoder edge-pads, decoder crops
    back to the SOF-declared size."""
    for shape in ((1, 1), (7, 9), (15, 17)):
        img = _gradient(*shape)
        dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
        assert dec.shape == img.shape


def test_rejects_non_baseline_and_garbage():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    # a progressive (SOF2) frame header must be rejected with a clear error
    img = np.full((8, 8, 3), 10, dtype=np.uint8)
    payload = bytearray(encode_jpeg(img))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bytes(payload))


def test_truncated_entropy_data_raises():
    img = _gradient(16, 16)
    payload = encode_jpeg(img, quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) // 2])


def test_quality_scale_dc_quantum_pinned():
    """The oracle SQL hard-codes q0=3 at quality 90 — pin it."""
    assert int(quality_scale(QUANT_LUMA, 90)[0, 0]) == 3


def test_property_roundtrip_never_crashes_and_preserves_shape():
    """Property sweep (deterministic seeds): any uint8 RGB image of any
    small shape, any quality/subsampling/restart combination, must encode
    and decode back to the same shape with bounded error on flat regions.
    This is the class of test that would have caught the r4 SOF
    off-by-one immediately."""
    rng = np.random.default_rng(42)
    for trial in range(40):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        quality = int(rng.integers(30, 96))
        sub = ("444", "422", "420")[trial % 3]
        ri = (0, 1, 3)[trial % 3]
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        dec = decode_jpeg(
            encode_jpeg(img, quality=quality, subsampling=sub, restart_interval=ri)
        )
        assert dec.shape == img.shape, (h, w, quality, sub, ri)
        assert dec.dtype == np.uint8
