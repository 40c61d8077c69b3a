"""Real audio decode (stdlib WAV): codec roundtrip physics + the
distributed Arrow plumbing. Unlike the image path (fake decoder, no codec
libs here), these run a genuine decoder end to end.
"""

import math

import pytest

from philotes_spark.multimodal.binary_ops import (
    audio_features,
    decode_audio_wav,
    encode_wav,
)


def _sine(freq=440.0, sr=8000, n=8000, amp=0.5):
    return [amp * math.sin(2 * math.pi * freq * i / sr) for i in range(n)]


def test_wav_roundtrip_stats():
    payload = encode_wav(_sine(), sample_rate=8000)
    got = decode_audio_wav(payload)
    assert got["sample_rate"] == 8000
    assert got["n_channels"] == 1
    assert got["n_samples"] == 8000
    assert got["duration_s"] == pytest.approx(1.0)
    # physics: rms of a 0.5-amplitude sine is 0.5/sqrt(2); peak is 0.5
    assert got["rms"] == pytest.approx(0.5 / math.sqrt(2), rel=1e-3)
    assert got["peak"] == pytest.approx(0.5, rel=1e-3)


def test_wav_8bit_and_32bit_paths():
    for sw in (1, 4):
        got = decode_audio_wav(encode_wav(_sine(n=1600), sampwidth=sw))
        tol = 2e-2 if sw == 1 else 1e-6
        assert got["rms"] == pytest.approx(0.5 / math.sqrt(2), rel=tol)


def test_audio_features_distributed(spark):
    rows = [(i, encode_wav(_sine(n=800 * (i + 1)))) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id int, payload binary").repartition(4)
    out = {r.doc_id: r.audio for r in audio_features(df).collect()}
    assert len(out) == 8
    for i, a in out.items():
        assert a.n_samples == 800 * (i + 1)
        assert a.rms == pytest.approx(0.5 / math.sqrt(2), rel=1e-2)
