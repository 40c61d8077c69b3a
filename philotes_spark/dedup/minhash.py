"""MinHash + LSH near-duplicate detection (SURVEY §2C) — the approximate
tier that scales where exact n-gram Jaccard (ngram.py) cannot.

Pipeline (JVM-only — no Python in the hot path):
  shingle → xxhash64 to 31-bit → per-doc hash list (groupBy +
  collect_list) → k universal-hash mins via ONE nested
  ``transform(coeffs, c -> array_min(transform(hs, h -> (a*h+b) % p)))``
  expression → signature array → band hashes → inverted-index self-join
  on (band_idx, band_hash) → candidate pairs → signature-overlap Jaccard
  estimate.

Why the nested transform: the naive alternative (k=128 *separate*
``min((a*h+b)%p)`` aggregate columns) unrolls into megabytes of generated
Java and spends ~100 s in Janino at any data size. The nested transform
compiles to two short loops; the same math runs whole-stage-codegen'd at
~k·|shingles| ops per document. (A pandas_udf variant was measured too:
correct, but it drags an Arrow boundary into every recomputed plan branch,
and concurrent branch stages stampede the Python worker pool.)

Scale shape: two shuffles (signature groupBy on doc id; candidate join on
band hash). Band-hash postings are (long, long) pairs — bytes, not
documents. Hot buckets (boilerplate text) are handled the same way as
ngram.py's df-cut: ``max_bucket_size`` drops degenerate buckets.

Arithmetic stays inside 63 bits (ANSI-safe): 31-bit shingle hashes,
multipliers < 2^31, so a*h+b < 2^62.
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
    """(doc, sig: array<long> of length k). One explode + one groupBy;
    the min-hash math is one nested higher-order-function expression."""
    coeffs = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in _coeffs(k, seed)
        ]
    )
    sig = F.transform(
        coeffs,
        lambda c: F.array_min(
            F.transform("hs", lambda h: (c["a"] * h + c["b"]) % F.lit(_P))
        ),
    )
    sh = shingles(df, id_col, text_col, n)
    h31 = F.pmod(F.xxhash64("shingle"), F.lit(2**31)).alias("h")
    hashed = sh.select("doc", h31)
    return (
        hashed.groupBy("doc")
        .agg(F.collect_list("h").alias("hs"))
        .select("doc", sig.alias("sig"))
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    bands: int = 32,
    k: int = 128,
    min_est_jaccard: float = 0.5,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Band the signatures, bucket-join, estimate Jaccard from signature
    overlap: (doc_a, doc_b, est_jaccard).

    Plan shape (deliberate, scale-critical):
    - band hashes come from ONE ``transform(sequence, slice)`` expression,
      not ``bands × rows`` inlined element extracts — the inlined form
      generates MB-scale codegen that dominates wall clock;
    - the self-join carries postings ``(doc, band, bh)`` only (24 bytes),
      never the 1 KB signature arrays; signatures are joined back onto the
      *deduplicated pairs* (orders of magnitude fewer rows than raw bucket
      candidates);
    - signatures are persisted because three branches (bucket-size filter,
      both join sides, estimate join-back) would otherwise recompute the
      shingle→minhash pipeline per branch.
    """
    rows = k // bands
    sigs = sig_df.persist()
    band_hashes = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda bi: F.xxhash64(F.slice("sig", bi * rows + 1, rows)),
    )
    banded = sigs.select("doc", F.posexplode(band_hashes).alias("band", "bh"))

    if max_bucket_size is not None:
        ok = (
            banded.groupBy("band", "bh")
            .agg(F.count(F.lit(1)).alias("sz"))
            .filter((F.col("sz") > 1) & (F.col("sz") <= max_bucket_size))
            .select("band", "bh")
        )
        banded = banded.join(ok, ["band", "bh"], "left_semi")

    a = banded.select(F.col("doc").alias("doc_a"), "band", "bh")
    b = banded.select(F.col("doc").alias("doc_b"), "band", "bh")
    pairs = (
        a.join(b, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sig_a = sigs.select(F.col("doc").alias("doc_a"), F.col("sig").alias("sig_a"))
    sig_b = sigs.select(F.col("doc").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)
    ) / F.lit(k)
    return (
        pairs.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .withColumn("est_jaccard", F.round(est, 4))
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
