"""Training-data pipeline operators beyond dedup/similarity (§2C family):
deterministic dataset splitting, hash-stratified sampling, and test-set
decontamination. These are the remaining ops a 100 TB pretraining corpus
pipeline runs between dedup and training.

Design rules shared by all three:
- **Deterministic by content-independent hash** (md5 of the id): a
  document's split/sample assignment never changes when the corpus grows,
  is reproducible across engines (md5 is portable SQL — the oracle runs
  the identical expression), and needs no state, no RNG, no join.
- **Pure projection / broadcast shapes**: split + sample are per-row
  projections (zero shuffle); decontamination broadcasts the (small)
  benchmark shingle set against the corpus scan — the corpus is never
  shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from philotes_spark.dedup.ngram import shingles


def hash_bucket(id_col: Column) -> Column:
    """Stable [0, 256) assignment from the first md5 byte of the row id.

    The first two hex chars ARE the bucket — no arithmetic whose
    rounding could diverge between engines (Spark truncates double→int,
    DuckDB rounds); the identical expression runs as SQL everywhere:
    Spark ``conv(substring(md5(id), 1, 2), 16, 10)``,
    DuckDB ``('0x' || substring(md5(id), 1, 2))::INT``."""
    hx = F.substring(F.md5(id_col.cast("string")), 1, 2)
    return F.conv(hx, 16, 10).cast("int")


def split_assign(
    id_col: Column,
    train: float = 0.8,
    val: float = 0.1,
) -> Column:
    """'train' | 'val' | 'test' per row, by hash bucket — the standard
    deterministic corpus split. Fractions are quantized to 1/256."""
    b = hash_bucket(id_col)
    t_hi = int(train * 256)
    v_hi = t_hi + int(val * 256)
    return (
        F.when(b < t_hi, F.lit("train"))
        .when(b < v_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def sample_deterministic(
    df: DataFrame, id_col: str, rate: float
) -> DataFrame:
    """Keep a stable ``rate`` fraction of rows: hash-bucket < rate·256.
    Unlike ``df.sample`` this is reproducible across runs, engines, and
    partitionings, and composes with incremental corpora (a surviving row
    keeps surviving). Pure filter — pushdown-friendly, zero shuffle."""
    return df.filter(hash_bucket(F.col(id_col)) < int(rate * 256))


def ngram_overlap_contamination(
    docs: DataFrame,
    probe_ids: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_overlap: int = 3,
) -> DataFrame:
    """Test-set decontamination: corpus documents sharing ≥ ``min_overlap``
    distinct word ``n``-grams with any benchmark ("probe") document —
    the contamination check run before training on scraped data.

    Plan shape for 100 TB: the probe set is a benchmark suite (10²-10⁵
    docs) — its shingles are broadcast; the corpus is scanned once,
    shingled as a projection, hash-joined against the broadcast, and only
    the (corpus_doc, probe_doc) overlap counts shuffle (bounded by match
    count, not corpus size).

    Returns (doc_id, probe_id, n_overlap) for flagged corpus docs,
    probe docs themselves excluded from the corpus side.
    """
    sh = shingles(docs, id_col, text_col, n)
    probes = probe_ids.select(F.col(id_col).alias("probe_id"))
    # the probe id list and the probe shingle set are both benchmark-sized
    # (small): broadcast them so the corpus scan is never shuffled
    probe_sh = (
        sh.join(F.broadcast(probes), sh["doc"] == probes["probe_id"], "inner")
        .select("probe_id", "shingle")
    )
    corpus_sh = sh.join(
        F.broadcast(probes), sh["doc"] == probes["probe_id"], "left_anti"
    )
    return (
        corpus_sh.join(F.broadcast(probe_sh), "shingle")
        .groupBy(F.col("doc").alias(id_col), "probe_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


def compression_signals(df, text_col: str = "text"):
    """Per-document zlib compression ratio — the Dolma/Gopher quality
    signal SQL cannot express (a DEFLATE pass over the text): highly
    repetitive/templated documents compress far below normal prose, and
    `compressed_len / raw_len` separates them with no tokenizer at all.

    Runs as Arrow-batched ``mapInPandas`` over a narrow projection — the
    honest use of the Python path (same rationale as the multimodal
    codecs): per-row zlib, no shuffle, no driver collection, scales as a
    map at any corpus size. Level 6 (zlib default) pinned for
    determinism across runs and partitionings.

    Output: input columns + raw_len, compressed_len, compression_ratio
    (rounded to 4, ratio 0 for empty text)."""
    import zlib

    from pyspark.sql import types as T

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("raw_len", T.LongType()),
            T.StructField("compressed_len", T.LongType()),
            T.StructField("compression_ratio", T.DoubleType()),
        ]
    )

    def _batches(it):
        for pdf in it:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            pdf["raw_len"] = raw.str.len().astype("int64")
            pdf["compressed_len"] = (
                raw.map(lambda b: len(zlib.compress(b, 6))).astype("int64")
            )
            pdf["compression_ratio"] = (
                pdf["compressed_len"] / pdf["raw_len"].where(pdf["raw_len"] > 0)
            ).fillna(0.0).round(4)
            yield pdf

    return df.mapInPandas(_batches, out_schema)
