"""MinHash-LSH quality pins: the signature estimate must track the exact
n-gram Jaccard, and LSH must recall the strong near-dup pairs the exact
tier finds. Rows-only driver checks can't see broken recall — pin it here.
"""

import pytest

from philotes_spark.dedup.minhash import minhash_dedup
from philotes_spark.dedup.ngram import jaccard_pairs
from philotes_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def exact_pairs(docs):
    return {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()
    }


def test_lsh_recalls_strong_exact_pairs(docs, exact_pairs):
    got = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in minhash_dedup(
            docs, "doc_id", "text", min_est_jaccard=0.35
        ).collect()
    }
    strong = {p for p, j in exact_pairs.items() if j >= 0.6}
    if not strong:
        pytest.skip("fixture has no strong near-dup pairs at this sf")
    recall = len(strong & set(got)) / len(strong)
    assert recall >= 0.9, f"LSH recall {recall:.2f} over {len(strong)} pairs"


def test_estimate_tracks_exact_jaccard(docs, exact_pairs):
    got = {
        (r.doc_a, r.doc_b): float(r.est_jaccard)
        for r in minhash_dedup(
            docs, "doc_id", "text", min_est_jaccard=0.35
        ).collect()
    }
    common = set(got) & set(exact_pairs)
    if not common:
        pytest.skip("no overlapping pairs at this sf")
    for p in common:
        # k=128 signature ⇒ σ ≈ sqrt(j(1-j)/128) ≤ 0.045; allow 4σ
        assert abs(got[p] - float(exact_pairs[p])) < 0.2, (p, got[p], exact_pairs[p])


def test_arrow_signatures_bit_identical_to_expr(docs):
    """r12: the Arrow-batched numpy k-min fold serves minhash_signatures;
    the pure-expression fold stays as the reference. Same shingle hashes
    (shared JVM projection), same int64 (a*h+b) % P arithmetic — the
    signatures must be BIT-identical, not merely close."""
    from philotes_spark.dedup.minhash import (
        minhash_signatures,
        minhash_signatures_expr,
    )

    arrow = {
        r.doc: tuple(r.sig)
        for r in minhash_signatures(docs, "doc_id", "text", k=32).collect()
    }
    expr = {
        r.doc: tuple(r.sig)
        for r in minhash_signatures_expr(docs, "doc_id", "text", k=32).collect()
    }
    assert arrow == expr and arrow


def test_uncapped_fallback_matches_capped_pairs(docs):
    """ADVICE r12: max_bucket_size=None switches pair generation to the
    distributed postings self-join (no single-task collect_list of a
    degenerate bucket). Same pair set and estimates as the capped path
    when no bucket exceeds the cap."""
    from philotes_spark.dedup.minhash import lsh_candidate_pairs, minhash_signatures

    sigs = minhash_signatures(docs, "doc_id", "text", k=32)
    kw = dict(bands=8, k=32, min_est_jaccard=0.35)
    capped = {
        (r.doc_a, r.doc_b): float(r.est_jaccard)
        for r in lsh_candidate_pairs(sigs, max_bucket_size=10**6, **kw).collect()
    }
    uncapped = {
        (r.doc_a, r.doc_b): float(r.est_jaccard)
        for r in lsh_candidate_pairs(sigs, max_bucket_size=None, **kw).collect()
    }
    assert capped == uncapped and capped


def test_signatures_preserve_string_doc_ids(spark):
    """ADVICE r12: the Arrow fold must not coerce doc ids to int64 —
    string ids pass through with their type and values intact."""
    from philotes_spark.dedup.minhash import (
        minhash_signatures,
        minhash_signatures_expr,
    )

    df = spark.createDataFrame(
        [("doc-a", "the quick brown fox jumps"), ("doc-b", "pack my box with jugs")],
        "doc_id string, text string",
    )
    arrow = minhash_signatures(df, "doc_id", "text", k=16)
    assert dict(arrow.dtypes)["doc"] == "string"
    a = {r.doc: tuple(r.sig) for r in arrow.collect()}
    e = {
        r.doc: tuple(r.sig)
        for r in minhash_signatures_expr(df, "doc_id", "text", k=16).collect()
    }
    assert a == e and set(a) == {"doc-a", "doc-b"}
