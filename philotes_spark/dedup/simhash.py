"""SimHash near-duplicate detection (SURVEY §2C).

64-bit SimHash built entirely from built-in expressions:
  token explode → xxhash64 → per-bit ±1 contributions → 64 sums per doc →
  sign bits → bit-string + 4×16-bit band values.

The simhash is carried as (a) a 64-char bit-string (engine-portable, easy
hamming) and (b) four 16-bit integer bands for the candidate join: two
docs within hamming distance ≤ 3 of each other must agree on ≥ 1 band
(pigeonhole), so the bucket join on (band_idx, band_value) finds all such
pairs with one shuffle of (doc, int) postings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from philotes_spark.functions.text import tokens

BITS = 64


def simhash_bits(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, simhash_bits: 64-char '0'/'1' string, bands: array<long> of 4
    16-bit values). One explode + one groupBy with 64 small aggregates —
    map-side combine keeps the shuffle at one row per doc."""
    tok = (
        df.select(F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("tok"))
        .withColumn("h", F.xxhash64("tok"))
    )
    sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(BITS)
    ]
    agg = tok.groupBy("doc").agg(*sums)
    # MSB-first bit string so lexicographic prefix == high bits
    bitstr = F.concat(
        *[F.when(F.col(f"s{i}") > 0, "1").otherwise("0") for i in range(BITS - 1, -1, -1)]
    )
    out = agg.select("doc", bitstr.alias("simhash_bits"))
    # 4 bands of 16 bits each, parsed from the bit string (conv: base2→10)
    band_vals = F.array(
        *[
            F.conv(F.substring("simhash_bits", 1 + 16 * b, 16), 2, 10).cast("long")
            for b in range(4)
        ]
    )
    return out.withColumn("bands", band_vals)


def hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two equal-length bit strings."""
    return F.size(
        F.filter(
            F.zip_with(F.split(a, ""), F.split(b, ""), lambda x, y: x != y),
            lambda v: v,
        )
    )


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """(doc_a, doc_b, hamming_dist ≤ max_hamming) candidate pairs via the
    4-band pigeonhole join, verified with exact hamming distance."""
    sh = simhash_bits(df, id_col, text_col)
    posting = sh.select(
        "doc", "simhash_bits", F.posexplode("bands").alias("band", "bv")
    )
    if max_bucket_size is not None:
        ok = (
            posting.groupBy("band", "bv")
            .agg(F.count(F.lit(1)).alias("sz"))
            .filter((F.col("sz") > 1) & (F.col("sz") <= max_bucket_size))
            .select("band", "bv")
        )
        posting = posting.join(ok, ["band", "bv"], "left_semi")
    a = posting.select(
        F.col("doc").alias("doc_a"), F.col("simhash_bits").alias("bits_a"), "band", "bv"
    )
    b = posting.select(
        F.col("doc").alias("doc_b"), F.col("simhash_bits").alias("bits_b"), "band", "bv"
    )
    return (
        a.join(b, ["band", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("hamming_dist", hamming(F.col("bits_a"), F.col("bits_b")))
        .filter(F.col("hamming_dist") <= max_hamming)
        .select("doc_a", "doc_b", "hamming_dist")
    )
