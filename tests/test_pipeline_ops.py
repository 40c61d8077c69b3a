"""Training-pipeline operators (functions/pipeline.py): deterministic
split/sample properties and planted-contamination detection."""

import pytest
from pyspark.sql import functions as F

from philotes_spark.functions.pipeline import (
    hash_bucket,
    ngram_overlap_contamination,
    sample_deterministic,
    split_assign,
)
from philotes_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_split_is_deterministic_under_repartition(spark, docs):
    a = docs.select("doc_id", split_assign(F.col("doc_id")).alias("s"))
    b = (
        docs.repartition(7, "source")
        .sortWithinPartitions(F.desc("doc_id"))
        .select("doc_id", split_assign(F.col("doc_id")).alias("s"))
    )
    assert {(r.doc_id, r.s) for r in a.collect()} == {
        (r.doc_id, r.s) for r in b.collect()
    }


def test_split_ratios_near_target(docs):
    n = docs.count()
    counts = dict(
        docs.select(split_assign(F.col("doc_id")).alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    assert set(counts) == {"train", "val", "test"}
    # md5 buckets over ≥500 ids: loose tolerance, deterministic per fixture
    assert 0.70 <= counts["train"] / n <= 0.90
    assert 0.04 <= counts["val"] / n <= 0.17
    assert 0.04 <= counts["test"] / n <= 0.17


def test_split_assignment_stable_under_corpus_growth(spark, docs):
    # a document keeps its split when the corpus doubles: assignment
    # depends only on the id hash, not the population
    half = docs.filter(F.col("doc_id") % 2 == 0)
    full_map = dict(
        docs.select("doc_id", split_assign(F.col("doc_id")).alias("s")).collect()
    )
    half_map = dict(
        half.select("doc_id", split_assign(F.col("doc_id")).alias("s")).collect()
    )
    assert all(full_map[k] == v for k, v in half_map.items())


def test_sample_nested_and_reproducible(docs):
    s10 = {r.doc_id for r in sample_deterministic(docs, "doc_id", 0.10).select("doc_id").collect()}
    s20 = {r.doc_id for r in sample_deterministic(docs, "doc_id", 0.20).select("doc_id").collect()}
    s10_again = {r.doc_id for r in sample_deterministic(docs, "doc_id", 0.10).select("doc_id").collect()}
    assert s10 == s10_again
    assert s10 <= s20, "smaller rate must be a subset of larger (stable hash)"
    n = docs.count()
    assert 0.03 <= len(s10) / n <= 0.20


def test_hash_bucket_range(docs):
    mm = docs.select(
        F.min(hash_bucket(F.col("doc_id"))).alias("lo"),
        F.max(hash_bucket(F.col("doc_id"))).alias("hi"),
    ).collect()[0]
    assert 0 <= mm.lo and mm.hi <= 255


def test_planted_contamination_detected(spark):
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, base + " kilo lima"),  # shares the full 10-token prefix: many 5-grams
        (2, "one two three four five six seven eight nine ten"),  # disjoint
        (3, base),  # the probe/benchmark doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    probes = df.filter(F.col("doc_id") == 3).select("doc_id")
    hits = ngram_overlap_contamination(df, probes, n=5, min_overlap=3).collect()
    assert [(r.doc_id, r.probe_id) for r in hits] == [(1, 3)]
    # doc 1 shares 6 distinct 5-grams (10-token common prefix)
    assert hits[0].n_overlap == 6


def test_probe_docs_not_flagged_against_each_other(spark):
    txt = "alpha bravo charlie delta echo foxtrot golf"
    df = spark.createDataFrame(
        [(1, txt), (2, txt)], "doc_id long, text string"
    )
    probes = df.select("doc_id")  # everything is a probe
    assert ngram_overlap_contamination(df, probes, n=5, min_overlap=1).count() == 0


def test_decontam_plan_broadcasts_probe_side(spark, sf_dir):
    from philotes_spark import registry
    from philotes_spark.plans import audit

    registry.load_all()
    a = audit(registry.QUERIES["decontam_ngram_overlap"](spark, sf_dir))
    assert a.broadcast_joins >= 2, "probe ids + probe shingles must broadcast"


# --- chunker structural properties ------------------------------------------


def test_chunker_tiles_and_overlaps_exactly(spark):
    """Every doc's chunks must tile the token sequence with stride 24 and
    size 32: chunk i holds tokens [24i, min(24i+32, n)); reconstructing
    the doc from chunk prefixes (first 24 tokens of each chunk, all of
    the last) gives back the original token stream."""
    from philotes_spark.functions.pipeline_queries import train_chunk_documents
    from philotes_spark.functions.text import tokens as tok_expr
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    out = train_chunk_documents.__wrapped__(spark, sf)
    lens = {
        r.doc_id: r.n
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", F.size(tok_expr(F.col("text"))).alias("n"))
        .collect()
    }
    rows = out.collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r.n_tokens
    for doc_id, chunks in by_doc.items():
        n = lens[doc_id]
        n_chunks = (n - 1) // 24 + 1
        assert sorted(chunks) == list(range(n_chunks)), (doc_id, n)
        for i, ct in chunks.items():
            assert ct == min(32, n - 24 * i), (doc_id, i, ct, n)
    # every non-empty doc is chunked
    assert set(by_doc) == {d for d, n in lens.items() if n > 0}


def test_compression_signal_separates_repetition(spark):
    from philotes_spark.functions.pipeline import compression_signals

    docs = spark.createDataFrame(
        [
            (1, "spam " * 200),              # templated: compresses hard
            (2, "the quick brown fox jumps over the lazy dog and then "
                "discusses seventeen unrelated topics in moderate detail"),
            (3, ""),                          # empty: ratio 0, no crash
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in compression_signals(docs).collect()}
    assert got[1].compression_ratio < 0.05 < got[2].compression_ratio
    assert got[3].raw_len == 0 and got[3].compression_ratio == 0.0
    assert got[2].raw_len == len(got[2].text.encode())
    # deterministic under repartition
    again = {
        r.doc_id: r.compression_ratio
        for r in compression_signals(docs.repartition(3)).collect()
    }
    assert again == {d: r.compression_ratio for d, r in got.items()}


def test_repetition_arrow_fold_row_identical_to_expr(spark, sf_dir):
    """r13: the Arrow-batched numpy repetition fold serves
    text_repetition_stats; the fused explode+aggregate expression form
    stays as ground truth. Same JVM xxhash64 gram keys, integer counts,
    JVM-side ROUND on both — rows must be IDENTICAL, not merely close."""
    from philotes_spark.functions.text_queries import (
        text_repetition_stats,
        text_repetition_stats_expr,
    )

    a = sorted(map(tuple, text_repetition_stats(spark, sf_dir).collect()))
    b = sorted(map(tuple, text_repetition_stats_expr(spark, sf_dir).collect()))
    assert a == b and a


def test_repetition_stats_null_and_empty_text(spark, tmp_path):
    """Review r13: NULL/empty text must be EXCLUDED (as the expression
    twin and the DuckDB oracle do), not crash the Arrow fold's len()."""
    import pyspark.sql.functions as F

    from philotes_spark.functions.text_queries import (
        text_repetition_stats,
        text_repetition_stats_expr,
    )

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat on the mat"),
            (2, None),
            (3, ""),
            (4, "one"),  # tokens but no bigram: excluded by contract
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "docs")
    df.write.parquet(path + "/documents.parquet")
    a = sorted(map(tuple, text_repetition_stats(spark, path).collect()))
    b = sorted(map(tuple, text_repetition_stats_expr(spark, path).collect()))
    assert a == b
    assert [r[0] for r in a] == [1]


def test_dup_ngram_arrow_fold_row_identical_to_expr(spark, sf_dir):
    """r16: the Arrow-batched numpy (doc, gram, multiplicity) fold serves
    text_dup_ngram_fraction; the r11 explode + groupBy expression form
    stays as ground truth. Same JVM xxhash64 gram keys, integer counts,
    JVM-side ROUND on both — rows must be IDENTICAL, not merely close."""
    from philotes_spark.functions.text_queries import (
        text_dup_ngram_fraction,
        text_dup_ngram_fraction_expr,
    )

    a = sorted(map(tuple, text_dup_ngram_fraction.__wrapped__(spark, sf_dir).collect()))
    b = sorted(map(tuple, text_dup_ngram_fraction_expr(spark, sf_dir).collect()))
    assert a == b and a


def test_dup_ngram_null_short_and_empty_text(spark, tmp_path):
    """NULL/empty/short (< 8 tokens) docs must be EXCLUDED (as the
    expression twin and the DuckDB oracle do), not crash the fold."""
    from philotes_spark.functions.text_queries import (
        text_dup_ngram_fraction,
        text_dup_ngram_fraction_expr,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j a b c d e f g h i j"),
            (2, None),
            (3, ""),
            (4, "one two three"),  # < 8 tokens: no 8-gram, excluded
            (5, "a b c d e f g h i j k l"),  # shares 8-grams with doc 1
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "docs")
    df.write.parquet(path + "/documents.parquet")
    a = sorted(map(tuple, text_dup_ngram_fraction.__wrapped__(spark, path).collect()))
    b = sorted(map(tuple, text_dup_ngram_fraction_expr(spark, path).collect()))
    assert a == b
    assert [r[0] for r in a] == [1, 5]
    # doc 1 repeats its whole token stream, so every one of its 8-grams
    # also occurs in the repeat — and the first 5 are shared with doc 5
    frac = {r[0]: r[1] for r in a}
    assert frac[5] > 0  # the shared prefix grams are corpus-duplicated
