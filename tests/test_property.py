"""Property-based tests (hypothesis) for the pure-Python kernels —
mirrors the reference's table-driven unit matrices (SURVEY §5) with
generated cases instead of fixed ones. No Spark session needed: fast.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from philotes_spark.multimodal.binary_ops import decode_audio_wav, encode_wav
from philotes_spark.streaming.backpressure import (
    BackpressureConfig,
    BackpressureController,
)
from philotes_spark.streaming.reliability import RetryPolicy


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=4000),
    sr=st.sampled_from([8000, 16000, 44100]),
    amp=st.floats(min_value=0.01, max_value=0.99),
    sw=st.sampled_from([1, 2, 4]),
)
def test_wav_roundtrip_preserves_shape_and_energy(n, sr, amp, sw):
    x = [amp * math.sin(2 * math.pi * 5 * i / n) for i in range(n)]
    got = decode_audio_wav(encode_wav(x, sample_rate=sr, sampwidth=sw))
    assert got["n_samples"] == n
    assert got["sample_rate"] == sr
    assert got["duration_s"] == n / sr
    # quantization error bound: half an LSB of the sample width
    lsb = 1.0 / (2 ** (8 * sw - 1) - 1)
    assert got["peak"] <= amp + lsb
    expected_rms = math.sqrt(sum(v * v for v in x) / n)
    assert abs(got["rms"] - expected_rms) <= lsb + 1e-9


@settings(max_examples=60, deadline=None)
@given(depths=st.lists(st.integers(min_value=0, max_value=20000), max_size=60))
def test_backpressure_invariants(depths):
    events = []
    c = BackpressureController(
        BackpressureConfig(),
        get_size=iter(depths).__next__,
        pause=lambda: events.append("pause"),
        resume=lambda: events.append("resume"),
    )
    paused = False
    for d in depths:
        action = c.check()
        # hysteresis truth table
        if not paused and d > 8000:
            assert action == "paused"
            paused = True
        elif paused and d < 5000:
            assert action == "resumed"
            paused = False
        else:
            assert action == "noop"
    # events strictly alternate, starting with pause
    assert all(e == ("pause" if i % 2 == 0 else "resume") for i, e in enumerate(events))
    assert c.stats.pause_count - c.stats.resume_count in (0, 1)


@settings(max_examples=40, deadline=None)
@given(
    attempt=st.integers(min_value=0, max_value=10),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_retry_backoff_bounded(attempt, seed):
    import random

    p = RetryPolicy()
    b = p.backoff(attempt, random.Random(seed))
    # never exceeds max_backoff + jitter band; never negative
    assert 0 <= b <= p.max_backoff * (1 + p.jitter)
    if attempt == 0:
        assert b >= p.initial_backoff * (1 - p.jitter)
