"""MinHash + LSH near-duplicate detection (SURVEY §2C) — the approximate
tier that scales where exact n-gram Jaccard (ngram.py) cannot.

Pipeline (all built-in ops, no Python UDFs):
  shingle → hash to 31-bit → k universal-hash mins (one groupBy with k
  min-aggregates) → signature array → band hashes → inverted-index
  self-join on (band_idx, band_hash) → candidate pairs → signature-overlap
  Jaccard estimate.

Scale shape: two shuffles (signature groupBy on doc id; candidate join on
band hash). Band-hash postings are (long, long) pairs — bytes, not
documents. Hot buckets (boilerplate text) are handled the same way as
ngram.py's df-cut: ``max_bucket_size`` drops degenerate buckets.

Arithmetic is kept inside 63 bits so it is safe under ANSI mode: shingle
hashes are reduced to 31 bits, multipliers are < 2^31, so a*h+b < 2^62.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from philotes_spark.dedup.ngram import shingles

_P = 4294967311  # smallest prime > 2^32


def _coeffs(k: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, 2**31 - 1), rng.randrange(0, 2**31 - 1)) for _ in range(k)]


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 128,
    seed: int = 42,
) -> DataFrame:
    """(doc, sig: array<long> of length k). One explode + one groupBy."""
    sh = shingles(df, id_col, text_col, n)
    h31 = F.pmod(F.xxhash64("shingle"), F.lit(2**31)).alias("h")
    hashed = sh.select("doc", h31)
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(_P)).alias(f"m{i}")
        for i, (a, b) in enumerate(_coeffs(k, seed))
    ]
    sigs = hashed.groupBy("doc").agg(*mins)
    return sigs.select("doc", F.array(*[f"m{i}" for i in range(k)]).alias("sig"))


def lsh_candidate_pairs(
    sig_df: DataFrame,
    bands: int = 32,
    k: int = 128,
    min_est_jaccard: float = 0.5,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Band the signatures, bucket-join, estimate Jaccard from signature
    overlap: (doc_a, doc_b, est_jaccard)."""
    rows = k // bands
    band_arr = F.array(
        *[
            F.xxhash64(F.concat_ws(",", *[F.col("sig")[b * rows + r] for r in range(rows)]))
            for b in range(bands)
        ]
    )
    banded = sig_df.select("doc", "sig", F.posexplode(band_arr).alias("band", "bh"))

    if max_bucket_size is not None:
        ok = (
            banded.groupBy("band", "bh")
            .agg(F.count(F.lit(1)).alias("sz"))
            .filter((F.col("sz") > 1) & (F.col("sz") <= max_bucket_size))
            .select("band", "bh")
        )
        banded = banded.join(ok, ["band", "bh"], "left_semi")

    a = banded.select(F.col("doc").alias("doc_a"), F.col("sig").alias("sig_a"), "band", "bh")
    b = banded.select(F.col("doc").alias("doc_b"), F.col("sig").alias("sig_b"), "band", "bh")
    cand = (
        a.join(b, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)
    ) / F.lit(k)
    return (
        cand.withColumn("est_jaccard", F.round(est, 4))
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 128,
    bands: int = 32,
    min_est_jaccard: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """End-to-end near-dup candidate pairs for the documents table."""
    sigs = minhash_signatures(df, id_col, text_col, n=n, k=k, seed=seed)
    return lsh_candidate_pairs(
        sigs, bands=bands, k=k, min_est_jaccard=min_est_jaccard
    )
