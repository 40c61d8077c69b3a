"""Multimodal column plumbing (SURVEY §2C): image/audio/video as opaque
``binary`` columns with typed metadata.

The Spark-side plumbing — schema, partitioning, Arrow batch shapes,
``mapInPandas`` signatures — is real and tested. Decode status per
modality:

- **audio: REAL** — PCM WAV parses with the stdlib (``decode_audio_wav``).
- **image: REAL for PPM** — binary P6 parses and resizes with pure
  numpy (``decode_ppm``/``resize_ppm``/``image_stats``); compressed
  formats (JPEG/PNG) still need PIL, so ``decode_image`` stays an honest
  ``NotImplementedError`` stub unless ``fake=True``.
- **video: frame sampling is JVM-side chunk arithmetic** (no codec).

Swap the stubbed inner functions for PIL/ffmpeg on a real cluster — the
dataflow does not change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# metadata struct carried next to every binary payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("byte_length", T.LongType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("media_type", T.StringType(), True),
    ]
)

FEATURE_DIM = 16


def to_binary(text: Column) -> Column:
    """Fixture adapter: UTF-8 encode a text column into an opaque payload
    (stands in for reading real media bytes via `binaryFile`)."""
    return F.encode(text, "UTF-8")


def media_meta(payload: Column, media_type: str = "text/plain") -> Column:
    """Typed metadata struct computed JVM-side — no decode needed."""
    return F.struct(
        F.octet_length(payload).cast("long").alias("byte_length"),
        F.sha2(payload, 256).alias("content_hash"),
        F.lit(media_type).alias("media_type"),
    )


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """STUB: real impl would be PIL.Image.open(io.BytesIO(payload)).

    ``fake=True`` returns a deterministic FEATURE_DIM-float vector derived
    from the payload digest, so the distributed plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv — not present in this "
            "container; pass fake=True for the deterministic test decoder"
        )
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(
    df: DataFrame, payload_col: str = "payload", fake: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the real decode slots into ``decode_image``.

    Output schema: input columns + ``features array<double>``. Batches
    stream through Arrow; nothing is collected to the driver, and the
    operation is a narrow map (no shuffle) however large the corpus."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.DoubleType()))]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["features"] = pdf[payload_col].map(
                lambda p: decode_image(bytes(p), fake=fake)
            )
            yield pdf

    return df.mapInPandas(batches, out_schema)


def resize_image(
    df: DataFrame,
    payload_col: str = "payload",
    width: int = 64,
    height: int = 64,
    fake: bool = True,
) -> DataFrame:
    """STUB resize: real impl is PIL `Image.resize((w,h))` inside the same
    mapInPandas; the fake deterministically re-derives a payload of the
    right size from the source digest so downstream schema/partitioning
    are exercised for real.

    Output: input columns + `resized binary` + `resized_meta struct` —
    a narrow Arrow-batched map, no shuffle at any corpus size."""
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("resized", T.BinaryType()),
            T.StructField("resized_meta", MEDIA_META_SCHEMA),
        ]
    )
    target = width * height

    def _resize(payload: bytes) -> bytes:
        if not fake:
            raise NotImplementedError(
                "image resize requires PIL — pass fake=True for the "
                "deterministic test path"
            )
        digest = hashlib.sha256(payload).digest()
        return (digest * (target // len(digest) + 1))[:target]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            resized = pdf[payload_col].map(lambda p: _resize(bytes(p)))
            pdf["resized"] = resized
            pdf["resized_meta"] = resized.map(
                lambda b: {
                    "byte_length": len(b),
                    "content_hash": hashlib.sha256(b).hexdigest(),
                    "media_type": f"image/fake;w={width};h={height}",
                }
            )
            yield pdf

    return df.mapInPandas(batches, out_schema)


# --- images: REAL decode for PPM (pure parsing — no codec lib needed) -------

IMAGE_STATS_FIELDS = T.StructType(
    [
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_pixels", T.LongType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_b", T.DoubleType(), False),
    ]
)


def encode_ppm(pixels) -> bytes:
    """Binary PPM (P6) encoder: header + raw RGB. ``pixels`` is a
    ``uint8`` array of shape (h, w, 3)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def decode_ppm(payload: bytes):
    """REAL image decode for binary PPM: parse the P6 header (whitespace
    + ``#`` comments per the spec) and return the (h, w, 3) uint8 pixel
    array. Like the WAV path, this is a genuine decoder running in this
    container; compressed formats (JPEG/PNG) still need PIL — see
    ``decode_image``."""
    import numpy as np

    pos, tokens = 0, []
    while len(tokens) < 4:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(payload[start:pos])
    if tokens[0] != b"P6":
        raise ValueError(f"not a binary PPM (magic {tokens[0]!r})")
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    pos += 1  # single whitespace after maxval, then raw data
    data = payload[pos : pos + w * h * 3]
    if len(data) != w * h * 3:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def resize_ppm(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL nearest-neighbor resize on a PPM payload: index-map rows and
    columns (y' → floor(y'·h/out_h)), re-encode. Pure numpy striding —
    the genuine pixel operation, not a digest fake."""
    import numpy as np

    px = decode_ppm(payload)
    h, w, _ = px.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return encode_ppm(px[ys][:, xs])


def image_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched REAL image decode over PPM payloads via
    ``mapInPandas``: input columns + ``image`` stats struct (dimensions +
    per-channel means). Narrow map, no shuffle, nothing collected — the
    image twin of ``audio_features``."""
    import numpy as np

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("image", IMAGE_STATS_FIELDS)]
    )

    def stats(payload: bytes) -> dict:
        px = decode_ppm(payload).astype(np.float64)
        h, w, _ = px.shape
        means = px.reshape(-1, 3).mean(axis=0)
        return {
            "width": w,
            "height": h,
            "n_pixels": int(w * h),
            "mean_r": float(means[0]),
            "mean_g": float(means[1]),
            "mean_b": float(means[2]),
        }

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["image"] = pdf[payload_col].map(lambda p: stats(bytes(p)))
            yield pdf

    return df.mapInPandas(batches, out_schema)


# --- audio: REAL decode (stdlib wave — no external codec needed) -----------

AUDIO_FEATURE_FIELDS = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("peak", T.DoubleType(), False),
    ]
)


def encode_wav(
    samples, sample_rate: int = 8000, sampwidth: int = 2
) -> bytes:
    """PCM WAV encoder (stdlib). ``samples`` are floats in [-1, 1]."""
    import io
    import wave

    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    scale = float(2 ** (8 * sampwidth - 1) - 1)
    ints = np.clip(np.round(x * scale), -scale - 1, scale).astype(
        {1: np.int8, 2: np.int16, 4: np.int32}[sampwidth]
    )
    if sampwidth == 1:
        ints = (ints.astype(np.int16) + 128).astype(np.uint8)  # 8-bit is unsigned
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


def decode_audio_wav(payload: bytes) -> dict:
    """REAL audio decode: PCM WAV bytes → sample stats. Unlike the image
    path (no codec libs in this container), WAV parses with the stdlib, so
    this modality runs the genuine decode in the distributed plumbing."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        sr, ch, sw, n = (
            w.getframerate(),
            w.getnchannels(),
            w.getsampwidth(),
            w.getnframes(),
        )
        raw = w.readframes(n)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[sw]
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if sw == 1:
        x = x - 128.0
    x = x / float(2 ** (8 * sw - 1) - 1)
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    n_samp = int(len(x))
    return {
        "sample_rate": sr,
        "n_channels": ch,
        "n_samples": n_samp,
        "duration_s": n_samp / sr if sr else 0.0,
        "rms": float(np.sqrt((x**2).mean())) if n_samp else 0.0,
        "peak": float(np.abs(x).max()) if n_samp else 0.0,
    }


def audio_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched REAL audio decode over WAV payloads via
    ``mapInPandas``: input columns + ``audio`` struct. Narrow map, no
    shuffle, nothing collected — same plumbing as extract_features but
    with a genuine decoder inside."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("audio", AUDIO_FEATURE_FIELDS)]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["audio"] = pdf[payload_col].map(
                lambda p: decode_audio_wav(bytes(p))
            )
            yield pdf

    return df.mapInPandas(batches, out_schema)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    chunk_size: int = 64,
    every_nth: int = 4,
) -> DataFrame:
    """'Video' frame sampling on an opaque payload: split the byte stream
    into fixed-size chunks and keep every Nth — one output row per kept
    chunk (explode), exactly the shape a real frame sampler produces.

    Implemented as a JVM-side expression (substring over binary + explode);
    a real codec version would swap in mapInPandas like extract_features."""
    n_chunks = F.ceil(F.octet_length(F.col(payload_col)) / F.lit(chunk_size))
    idx = F.sequence(F.lit(0), n_chunks - 1)
    kept = F.filter(idx, lambda i: i % every_nth == 0)
    chunk = F.explode(kept).alias("frame_idx")
    return df.select("*", chunk).select(
        "*",
        F.substring(
            F.col(payload_col), F.col("frame_idx") * chunk_size + 1, chunk_size
        ).alias("frame_bytes"),
    )
