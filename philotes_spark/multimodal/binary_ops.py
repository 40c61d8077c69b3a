"""Multimodal column plumbing (SURVEY §2C): image/audio/video as opaque
``binary`` columns with typed metadata.

The Spark-side plumbing — schema, partitioning, Arrow batch shapes,
``mapInPandas`` signatures — is real and tested. Decode status per
modality:

- **audio: REAL** — PCM WAV parses with the stdlib (``decode_audio_wav``).
- **image: REAL for PPM, PNG, and baseline JPEG** — binary P6 parses and
  resizes with pure numpy (``decode_ppm``/``resize_ppm``); PNG decodes
  with stdlib zlib + numpy unfiltering, all five scanline filters
  (``decode_png``/``encode_png``); baseline JPEG decodes with the
  pure-numpy T.81 codec (``jpeg.decode_jpeg`` — Huffman, IDCT, chroma
  upsampling, restart markers); ``image_stats`` dispatches on magic
  bytes. Only generic image RESIZE still wants PIL (``resize_image``
  keeps an honest ``NotImplementedError`` unless ``fake=True``;
  ``resize_ppm`` is the real nearest-neighbor path for PPM).
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
    """Feature vector from an image payload. PPM/PNG/baseline-JPEG all
    decode for REAL (``decode_any_image`` below).

    ``fake=True`` returns a deterministic FEATURE_DIM-float vector derived
    from the payload digest, so the distributed plumbing is testable over
    arbitrary (non-image) payloads too."""
    if fake:
        digest = hashlib.sha256(payload).digest()
        return [b / 255.0 for b in digest[:FEATURE_DIM]]
    import numpy as np

    px = decode_any_image(payload).astype(np.float64)
    h, w, _ = px.shape
    # 2×2 grid × RGB means + (w, h, n_pixels, global mean): FEATURE_DIM=16
    half_h, half_w = max(1, h // 2), max(1, w // 2)
    feats: list[float] = []
    for gy in range(2):
        for gx in range(2):
            block = px[gy * half_h : (gy + 1) * half_h or None,
                       gx * half_w : (gx + 1) * half_w or None]
            feats.extend(float(m) for m in block.reshape(-1, 3).mean(axis=0))
    feats.extend([float(w), float(h), float(w * h), float(px.mean())])
    return feats


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
    container; the compressed formats decode for real too — PNG via
    ``decode_png``, baseline JPEG via ``jpeg.decode_jpeg``."""
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


# --- images: REAL decode for PNG (stdlib zlib + numpy — no PIL) -------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a, b, c):
    """Paeth predictor (PNG spec §9.4), vectorized over int arrays."""
    import numpy as np

    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(pixels, filters: list[int] | None = None) -> bytes:
    """Minimal PNG encoder (8-bit RGB, no interlace) — stdlib ``zlib`` +
    ``struct`` only. ``filters`` optionally sets the per-row filter type
    (0..4) so tests can exercise every unfilter path in the decoder."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    if ch != 3:
        raise ValueError("encoder writes 8-bit RGB (h, w, 3) only")
    if filters is None:
        filters = [0] * h
    raw = bytearray()
    zero = np.zeros((1, ch), dtype=np.int16)
    prev = np.zeros((w, ch), dtype=np.int16)
    for y in range(h):
        row = px[y].astype(np.int16)
        left = np.vstack([zero, row[:-1]])
        ft = filters[y]
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub
            filt = row - left
        elif ft == 2:  # Up
            filt = row - prev
        elif ft == 3:  # Average
            filt = row - (left + prev) // 2
        elif ft == 4:  # Paeth
            upleft = np.vstack([zero, prev[:-1]])
            filt = row - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"bad filter type {ft}")
        raw.append(ft)
        raw += (filt % 256).astype(np.uint8).tobytes()
        prev = row

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """REAL PNG decode with the stdlib only: chunk walk with CRC checks,
    ``zlib`` inflate, scanline unfilter (all five filter types), numpy
    reshape. Supports 8-bit depth, no interlace, color types 0
    (greyscale, expanded to RGB), 2 (RGB), 6 (RGBA, alpha dropped) —
    the common real-media format the PPM tier couldn't cover; baseline
    JPEG is handled by the pure-numpy codec in ``jpeg.py``."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, header = 8, b"", None
    while pos + 8 <= len(payload):
        length, typ = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            header = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + length
    if header is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype, comp, filt_method, interlace = header
    if depth != 8 or comp != 0 or filt_method != 0 or interlace != 0:
        raise ValueError(
            "unsupported PNG variant (only 8-bit, non-interlaced supported)"
        )
    try:
        ch = {0: 1, 2: 3, 6: 4}[ctype]
    except KeyError:
        raise ValueError(f"unsupported color type {ctype}") from None

    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise ValueError("truncated PNG scanline data")
    out = np.zeros((h, w, ch), dtype=np.uint8)
    prev = np.zeros((w, ch), dtype=np.int64)
    for y in range(h):
        ft = raw[y * (1 + stride)]
        line = (
            np.frombuffer(raw, np.uint8, stride, offset=y * (1 + stride) + 1)
            .reshape(w, ch)
            .astype(np.int64)
        )
        if ft == 0:
            rec = line
        elif ft == 1:  # Sub: recon[x] = filt[x] + recon[x-1] ⇒ cumsum mod 256
            rec = np.cumsum(line, axis=0) % 256
        elif ft == 2:  # Up
            rec = (line + prev) % 256
        elif ft in (3, 4):  # Average / Paeth: sequential in x
            rec = np.zeros((w, ch), dtype=np.int64)
            left = np.zeros(ch, dtype=np.int64)
            for x in range(w):
                if ft == 3:
                    pred = (left + prev[x]) // 2
                else:
                    upleft = prev[x - 1] if x else np.zeros(ch, dtype=np.int64)
                    pred = _paeth(left, prev[x], upleft)
                left = (line[x] + pred) % 256
                rec[x] = left
        else:
            raise ValueError(f"bad scanline filter {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    if ch == 1:
        out = np.repeat(out, 3, axis=2)
    elif ch == 4:
        out = out[:, :, :3]
    return out


def decode_any_image(payload: bytes):
    """Magic-sniffing dispatch over the real decoders: binary PPM (P6),
    PNG (stdlib inflate+unfilter), baseline JPEG (pure-numpy T.81 codec —
    Huffman + IDCT + chroma upsampling; progressive/arithmetic rejected
    with a clear error by the codec itself)."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from philotes_spark.multimodal.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise ValueError("unrecognized image format (supported: PPM P6, PNG, JPEG)")


def image_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched REAL image decode over PPM/PNG payloads via
    ``mapInPandas``: input columns + ``image`` stats struct (dimensions +
    per-channel means). Narrow map, no shuffle, nothing collected — the
    image twin of ``audio_features``."""
    import numpy as np

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("image", IMAGE_STATS_FIELDS)]
    )

    def stats(payload: bytes) -> dict:
        px = decode_any_image(payload).astype(np.float64)
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
