"""Registered multimodal queries — binary-column plumbing over the
`documents` fixture (text bytes stand in for media payloads).

`multimodal_meta` is oracle-checked (byte length + sha256 agree across
engines); the decode/feature path is rows-only (the fake decoder is
engine-local by design).

Scan-parallelism (r16, catalog.load_table_parallel — A/B interleaved
min-of-N cold, sf0.1/sf1): the per-payload Python digest passes win
only once the corpus is a few MB (features +64%/−10%, resize
+59%/−17%), so both sit behind min_bytes=1MB; meta (+57%/+28%) and
frames (+25%/+18%) are JVM-cheap and stay on the plain scan. The real
codec queries (PPM/PNG/JPEG/WAV) synthesize 200-row inputs — nothing to
parallelize at the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from philotes_spark.multimodal.binary_ops import (
    extract_features,
    media_meta,
    to_binary,
)
from philotes_spark.registry import query
from philotes_spark.sources.catalog import load_table, load_table_parallel


@query(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_length,
           sha256(text) AS content_hash
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads — computed without any
    decode, purely JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    payload = to_binary(F.col("text"))
    meta = media_meta(payload)
    return docs.select(
        "doc_id",
        meta["byte_length"].alias("byte_length"),
        meta["content_hash"].alias("content_hash"),
    )


@query("multimodal_features")  # rows-only: fake decoder is engine-local
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (deterministic
    fake decoder): doc_id, byte_length, 16-dim feature vector summary."""
    docs = load_table_parallel(
        spark, sf_dir, "documents", "doc_id", min_bytes=1 << 20
    ).select(
        "doc_id", to_binary(F.col("text")).alias("payload")
    )
    feats = extract_features(docs, "payload", fake=True)
    return feats.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("byte_length"),
        F.round(
            F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 4
        ).alias("feature_sum"),
        F.size("features").alias("feature_dim"),
    ).orderBy("doc_id")


@query(
    "multimodal_frames",
    oracle="""
    WITH chunks AS (
        SELECT doc_id,
               octet_length(CAST(text AS BLOB)) AS blen,
               UNNEST(generate_series(0,
                   CAST(ceil(octet_length(CAST(text AS BLOB)) / 64.0) AS BIGINT) - 1)) AS i
        FROM documents
    )
    SELECT doc_id, CAST(i AS BIGINT) AS frame_idx
    FROM chunks WHERE i % 4 = 0
    """,
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Video' frame sampling over opaque payloads: fixed-size chunking,
    keep every 4th — JVM-side expressions only (no decode, no Python).
    The oracle checks the sampling arithmetic (chunk indices)."""
    from philotes_spark.multimodal.binary_ops import frame_sample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", to_binary(F.col("text")).alias("payload")
    )
    frames = frame_sample(docs, "payload", chunk_size=64, every_nth=4)
    return frames.select("doc_id", F.col("frame_idx").cast("long").alias("frame_idx"))


@query("multimodal_resize")  # rows-only: fake resizer is engine-local
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed image resize (Arrow-batched mapInPandas): the plumbing —
    schema with nested meta struct, batch shape, no shuffle — is real;
    the pixel math is a deterministic fake (no codecs in this container)."""
    from philotes_spark.multimodal.binary_ops import resize_image

    docs = load_table_parallel(
        spark, sf_dir, "documents", "doc_id", min_bytes=1 << 20
    ).select(
        "doc_id", to_binary(F.col("text")).alias("payload")
    )
    out = resize_image(docs, "payload", width=32, height=32, fake=True)
    return out.select(
        "doc_id",
        F.col("resized_meta")["byte_length"].alias("resized_bytes"),
        F.col("resized_meta")["content_hash"].alias("resized_hash"),
    ).orderBy("doc_id")


def _synth_ppm_df(spark: SparkSession, sf_dir: str, n_docs: int = 200) -> DataFrame:
    """Deterministic 8×8 RGB PPM per document: pixel (y,x,channel c) value
    is (doc_id·31 + y·13 + x·7 + c·91) mod 256 — arithmetic the SQL
    oracle reproduces exactly, so the REAL decode is hash-checkable."""
    import numpy as np

    from philotes_spark.multimodal.binary_ops import encode_ppm

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < n_docs
    ).select("doc_id")

    def synth(it):
        y, x, c = np.meshgrid(
            np.arange(8), np.arange(8), np.arange(3), indexing="ij"
        )
        for pdf in it:
            pdf = pdf.copy()
            pdf["payload"] = pdf["doc_id"].map(
                lambda d: encode_ppm(
                    (int(d) * 31 + y * 13 + x * 7 + c * 91) % 256
                )
            )
            yield pdf

    return docs.mapInPandas(synth, "doc_id bigint, payload binary")


_PX = "(doc_id * 31 + y.y * 13 + x.x * 7 + {c} * 91) % 256"


@query(
    "multimodal_image_stats",
    oracle=f"""
    SELECT doc_id, 8 AS width, 8 AS height, CAST(64 AS BIGINT) AS n_pixels,
           ROUND(AVG({_PX.format(c=0)}), 4) AS mean_r,
           ROUND(AVG({_PX.format(c=1)}), 4) AS mean_g,
           ROUND(AVG({_PX.format(c=2)}), 4) AS mean_b
    FROM documents,
         (SELECT UNNEST(generate_series(0, 7)) AS y) y,
         (SELECT UNNEST(generate_series(0, 7)) AS x) x
    WHERE doc_id < 200
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode roundtrip (the image twin of multimodal_audio):
    synthesize a binary PPM per document, parse it with the genuine P6
    decoder inside Arrow-batched mapInPandas, emit dimensions +
    per-channel means. The oracle recomputes the pixel arithmetic in pure
    SQL — a wrong header parse, stride, or channel order hash-mismatches.
    (PNG and baseline JPEG have their own oracle-gated twins below.)"""
    from philotes_spark.multimodal.binary_ops import image_stats

    out = image_stats(_synth_ppm_df(spark, sf_dir), "payload")
    return out.select(
        "doc_id",
        F.col("image.width").alias("width"),
        F.col("image.height").alias("height"),
        F.col("image.n_pixels").alias("n_pixels"),
        F.round(F.col("image.mean_r"), 4).alias("mean_r"),
        F.round(F.col("image.mean_g"), 4).alias("mean_g"),
        F.round(F.col("image.mean_b"), 4).alias("mean_b"),
    ).orderBy("doc_id")


@query(
    "multimodal_png_stats",
    oracle=f"""
    SELECT doc_id, 8 AS width, 8 AS height, CAST(64 AS BIGINT) AS n_pixels,
           ROUND(AVG({_PX.format(c=0)}), 4) AS mean_r,
           ROUND(AVG({_PX.format(c=1)}), 4) AS mean_g,
           ROUND(AVG({_PX.format(c=2)}), 4) AS mean_b
    FROM documents,
         (SELECT UNNEST(generate_series(0, 7)) AS y) y,
         (SELECT UNNEST(generate_series(0, 7)) AS x) x
    WHERE doc_id < 200
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def multimodal_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode roundtrip (stdlib zlib inflate + scanline
    unfilter — no PIL): the same deterministic pixels as the PPM tier are
    encoded as PNG with the scanline filter CYCLING through all five
    types per row ((doc_id + y) % 5), decoded with the genuine decoder
    inside Arrow-batched mapInPandas, and hash-checked against the pure
    SQL pixel arithmetic. A wrong inflate, CRC, unfilter (Sub/Up/Average/
    Paeth), stride, or channel order mismatches the oracle."""
    import numpy as np

    from philotes_spark.multimodal.binary_ops import encode_png, image_stats

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    ).select("doc_id")

    def synth(it):
        y, x, c = np.meshgrid(
            np.arange(8), np.arange(8), np.arange(3), indexing="ij"
        )
        for pdf in it:
            pdf = pdf.copy()
            pdf["payload"] = pdf["doc_id"].map(
                lambda d: encode_png(
                    (int(d) * 31 + y * 13 + x * 7 + c * 91) % 256,
                    filters=[(int(d) + row) % 5 for row in range(8)],
                )
            )
            yield pdf

    pngs = docs.mapInPandas(synth, "doc_id bigint, payload binary")
    out = image_stats(pngs, "payload")
    return out.select(
        "doc_id",
        F.col("image.width").alias("width"),
        F.col("image.height").alias("height"),
        F.col("image.n_pixels").alias("n_pixels"),
        F.round(F.col("image.mean_r"), 4).alias("mean_r"),
        F.round(F.col("image.mean_g"), 4).alias("mean_g"),
        F.round(F.col("image.mean_b"), 4).alias("mean_b"),
    ).orderBy("doc_id")


@query(
    "multimodal_jpeg_stats",
    oracle="""
    WITH tiles AS (
        SELECT doc_id, UNNEST(generate_series(0, 3)) AS t
        FROM documents WHERE doc_id < 200
    ), rt AS (
        -- exact flat-tile JPEG roundtrip at quality 90 (DC quantum q0 = 3):
        -- v' = floor(floor(8*(v-128)/q0 + 1/2)*q0/8 + 1/2) + 128
        SELECT doc_id,
               LEAST(GREATEST(FLOOR(FLOOR(
                   8 * ((doc_id * 37 + t * 59) % 256 - 128) / 3.0 + 0.5
               ) * 3 / 8.0 + 0.5) + 128, 0), 255) AS vp
        FROM tiles
    )
    SELECT doc_id, 16 AS width, 16 AS height,
           ROUND(AVG(vp), 4) AS mean_r,
           ROUND(AVG(vp), 4) AS mean_b
    FROM rt GROUP BY doc_id ORDER BY doc_id
    """,
)
def multimodal_jpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode roundtrip (pure-numpy T.81 codec, no
    PIL): each document becomes a 16×16 gray image of four flat 8×8
    tiles, encoded at quality 90 with the subsampling mode CYCLING
    through 4:4:4 / 4:2:2 / 4:2:0 by doc_id and restart markers every
    MCU, then decoded with the genuine Huffman+IDCT decoder inside
    Arrow-batched mapInPandas. Flat tiles reconstruct EXACTLY up to DC
    quantization (jpeg.py module contract), so the oracle recomputes the
    roundtrip value in pure SQL — a wrong SOF parse, Huffman table,
    dequant, restart resync, chroma transform, or upsample stride
    hash-mismatches. mean_r vs mean_b also pins chroma neutrality
    through the subsampled path."""
    import numpy as np

    from philotes_spark.multimodal.binary_ops import image_stats
    from philotes_spark.multimodal.jpeg import encode_jpeg

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    ).select("doc_id")

    def synth(it):
        def make(doc: int) -> bytes:
            img = np.zeros((16, 16, 3), np.uint8)
            for t in range(4):
                v = (doc * 37 + t * 59) % 256
                r, c = divmod(t, 2)
                img[r * 8 : (r + 1) * 8, c * 8 : (c + 1) * 8, :] = v
            sub = ("444", "422", "420")[doc % 3]
            return encode_jpeg(img, quality=90, subsampling=sub, restart_interval=1)

        for pdf in it:
            pdf = pdf.copy()
            pdf["payload"] = pdf["doc_id"].map(lambda d: make(int(d)))
            yield pdf

    jpegs = docs.mapInPandas(synth, "doc_id bigint, payload binary")
    out = image_stats(jpegs, "payload")
    return out.select(
        "doc_id",
        F.col("image.width").alias("width"),
        F.col("image.height").alias("height"),
        F.round(F.col("image.mean_r"), 4).alias("mean_r"),
        F.round(F.col("image.mean_b"), 4).alias("mean_b"),
    ).orderBy("doc_id")


_PX2 = "(doc_id * 31 + (y.y * 2) * 13 + (x.x * 2) * 7 + {c} * 91) % 256"


@query(
    "multimodal_image_resize",
    oracle=f"""
    SELECT doc_id, 4 AS width, 4 AS height,
           ROUND(AVG({_PX2.format(c=0)}), 4) AS mean_r,
           ROUND(AVG({_PX2.format(c=2)}), 4) AS mean_b
    FROM documents,
         (SELECT UNNEST(generate_series(0, 3)) AS y) y,
         (SELECT UNNEST(generate_series(0, 3)) AS x) x
    WHERE doc_id < 200
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL nearest-neighbor resize (8×8 → 4×4) on PPM payloads, then the
    real decoder reads the result back. Nearest-neighbor at 2× picks
    pixels (2y, 2x) — the oracle averages exactly those source pixels, so
    the resize index math itself is hash-verified across engines."""
    import pandas as pd

    from philotes_spark.multimodal.binary_ops import image_stats, resize_ppm

    ppms = _synth_ppm_df(spark, sf_dir)

    def do_resize(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["payload"] = pdf["payload"].map(
                lambda p: resize_ppm(bytes(p), 4, 4)
            )
            yield pdf

    small = ppms.mapInPandas(do_resize, "doc_id bigint, payload binary")
    out = image_stats(small, "payload")
    return out.select(
        "doc_id",
        F.col("image.width").alias("width"),
        F.col("image.height").alias("height"),
        F.round(F.col("image.mean_r"), 4).alias("mean_r"),
        F.round(F.col("image.mean_b"), 4).alias("mean_b"),
    ).orderBy("doc_id")


@query(
    "multimodal_audio",
    oracle="""
    SELECT doc_id,
           8000 AS sample_rate,
           CAST(8000 + (doc_id % 10) * 800 AS BIGINT) AS n_samples,
           ROUND((8000 + (doc_id % 10) * 800) / 8000.0, 6) AS duration_s
    FROM documents
    WHERE doc_id < 200
    """,
)
def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode roundtrip: synthesize a PCM WAV per document
    (440 Hz sine, length keyed by doc_id), then decode it with the stdlib
    WAV parser inside Arrow-batched mapInPandas — the one modality whose
    genuine decoder runs in this container. The oracle pins the decoded
    sample counts and durations; rms/peak physics are pinned in pytest."""
    import math

    from philotes_spark.multimodal.binary_ops import audio_features, encode_wav

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    ).select("doc_id")

    def synth(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["payload"] = pdf["doc_id"].map(
                lambda d: encode_wav(
                    [
                        0.5 * math.sin(2 * math.pi * 440 * i / 8000)
                        for i in range(8000 + (int(d) % 10) * 800)
                    ]
                )
            )
            yield pdf

    wavs = docs.mapInPandas(synth, "doc_id bigint, payload binary")
    out = audio_features(wavs, "payload")
    return out.select(
        "doc_id",
        F.col("audio.sample_rate").alias("sample_rate"),
        F.col("audio.n_samples").alias("n_samples"),
        F.round(F.col("audio.duration_s"), 6).alias("duration_s"),
    )
