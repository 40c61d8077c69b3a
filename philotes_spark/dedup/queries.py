"""Registered dedup queries over the `documents` table (SURVEY §2C).

Oracle-checked where SQL-expressible (exact, fingerprint-normalized,
n-gram Jaccard); rows-only for the hash-family approximations (MinHash-LSH,
SimHash) whose xxhash64 primitives DuckDB does not share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from philotes_spark.dedup.exact import dedup_exact
from philotes_spark.dedup.minhash import minhash_dedup
from philotes_spark.dedup.ngram import containment_pairs, jaccard_pairs
from philotes_spark.dedup.simhash import simhash_near_dups
from philotes_spark.registry import query
from philotes_spark.sources.catalog import load_table

_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS survivor_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one survivor per distinct text (hash-groupBy)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_exact(docs, "text", "doc_id")


@query(
    "dedup_normalized",
    oracle=f"""
    SELECT md5(array_to_string({_TOKS}, ' ')) AS content_hash,
           MIN(doc_id) AS survivor_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-aware exact dedup: case/punctuation/whitespace
    variants collapse to the same fingerprint before the hash-groupBy."""
    from philotes_spark.functions.text import fingerprint_md5, tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(fingerprint_md5(tokens(F.col("text"))).alias("content_hash"))
        .agg(F.min("doc_id").alias("survivor_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(t[i.i : i.i + 2], ' ') AS shingle
        FROM toks,
             (SELECT UNNEST(generate_series(1, (SELECT MAX(len(t)) FROM toks))) AS i) i
        WHERE i.i <= len(t) - 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, n_common,
           ROUND(n_common / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE ROUND(n_common / (sa.n_sh + sb.n_sh - n_common), 4) >= 0.12
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard pairs ≥ 0.12 via inverted-index self-join."""
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.12)


@query("dedup_minhash_lsh")  # rows-only: xxhash64 not portable to DuckDB
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(128) + LSH(32 bands × 4 rows) candidate pairs with
    signature-estimated Jaccard ≥ 0.35."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_dedup(docs, "doc_id", "text", min_est_jaccard=0.35).orderBy(
        "doc_a", "doc_b"
    )


@query("dedup_simhash")  # rows-only: xxhash64 not portable to DuckDB
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dups within hamming distance 3 via 4-band
    pigeonhole join."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_dups(docs, "doc_id", "text", max_hamming=3).orderBy(
        "doc_a", "doc_b"
    )


@query(
    "dedup_cross_source_overlap",
    oracle="""
    WITH hs AS (
        SELECT DISTINCT md5(text) AS h, source FROM documents
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS shared_contents
    FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_dedup_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every source pair, how many
    distinct content hashes appear in BOTH — the report that tells a
    curation pipeline which feeds are mirroring each other (and which
    pair to dedup against first).

    100 TB shape: documents reduce to DISTINCT (content-hash, source)
    pairs first (one hash aggregate, partial map-side — output is
    bounded by distinct contents, not corpus rows); the self-join then
    runs on that reduced set keyed by hash, and only hashes present in
    2+ sources produce rows. No full-text ever shuffles — 16-byte
    hashes do."""
    docs = load_table(spark, sf_dir, "documents")
    hs = docs.select(F.md5("text").alias("h"), "source").distinct()
    a = hs.select(F.col("h"), F.col("source").alias("source_a"))
    b = hs.select(F.col("h"), F.col("source").alias("source_b"))
    return (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared_contents"))
        .orderBy("source_a", "source_b")
    )


@query(
    "dedup_ngram_containment",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(t[i.i : i.i + 2], ' ') AS shingle
        FROM toks,
             (SELECT UNNEST(generate_series(1, (SELECT MAX(len(t)) FROM toks))) AS i) i
        WHERE i.i <= len(t) - 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, n_common,
           ROUND(n_common / LEAST(sa.n_sh, sb.n_sh), 4) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE ROUND(n_common / LEAST(sa.n_sh, sb.n_sh), 4) >= 0.25
    """,
)
def q_dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric 3-gram containment pairs ≥ 0.25 (|A∩B| / min set size):
    the short-doc-inside-long-doc criterion symmetric Jaccard misses —
    on these fixtures it surfaces pairs dedup_ngram_jaccard's 0.12 gate
    does not. Same inverted-index join shape as the Jaccard tier."""
    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, "doc_id", "text", n=3, threshold=0.25)
