"""Registered training-pipeline queries (§2C family): deterministic
dataset split and test-set decontamination over `documents`. Both are
oracle-checked — the hash/split expressions are portable SQL by design
(functions/pipeline.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from philotes_spark.functions.pipeline import (
    ngram_overlap_contamination,
    split_assign,
)
from philotes_spark.registry import query
from philotes_spark.sources.catalog import load_table, load_table_parallel

# Scan-parallelism site selection (r16, guide §2.5 — see
# catalog.load_table_parallel and the fuller notes in text_queries.py /
# dedup/queries.py). A/B (interleaved min-of-N cold, sf0.1/sf1):
# - unconditional: decontam −17%/−52%, curation_report −7%/−66%,
#   chunk_documents −30%/−72%, length_batches −14%/−41% (tokenize-heavy
#   map sides);
# - min_bytes=1MB: stratified_sample +56%/−15%;
# - NOT converted (slower at the scale-predicting SF — their own
#   source-keyed exchanges dominate and the doc_id repartition does not
#   align with them): split_stats +70%/+101%, pack_sequences +59%/+61%,
#   source_mixture +23%/−3%, shuffle_epoch +18%/+46%.
_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"


def _sw(lang: str) -> str:
    from philotes_spark.functions.text import LANG_STOPWORDS

    return "[" + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang]) + "]"


@query(
    "train_split_stats",
    oracle="""
    WITH b AS (
        SELECT source, n_chars,
               ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INT AS bkt
        FROM documents
    )
    SELECT source,
           CASE WHEN bkt < 204 THEN 'train'
                WHEN bkt < 229 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           SUM(n_chars) AS total_chars
    FROM b GROUP BY source, split ORDER BY source, split
    """,
)
def q_train_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by md5 bucket of
    doc_id, summarized per (source, split) — the reproducible corpus
    split of a training pipeline. Pure projection + one small agg; a
    document's assignment is stable under corpus growth and engine
    choice (oracle runs the identical hash expression)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            split_assign(F.col("doc_id"), train=0.8, val=0.1).alias("split"),
            "n_chars",
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        # sources × 3 splits is bounded: single-partition sort (r16)
        .coalesce(1)
        .orderBy("source", "split")
    )


@query(
    "decontam_ngram_overlap",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(t[i.i : i.i + 4], ' ') AS shingle
        FROM toks,
             (SELECT UNNEST(generate_series(1, (SELECT MAX(len(t)) FROM toks))) AS i) i
        WHERE i.i <= len(t) - 4
    )
    SELECT c.doc_id, p.doc_id AS probe_id, COUNT(*) AS n_overlap
    FROM sh c JOIN sh p ON c.shingle = p.shingle
    WHERE p.doc_id % 29 = 0 AND c.doc_id % 29 <> 0
    GROUP BY c.doc_id, p.doc_id
    HAVING COUNT(*) >= 3
    ORDER BY c.doc_id, p.doc_id
    """,
)
def q_decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: corpus docs sharing ≥3 distinct word
    5-grams with any benchmark doc (probe set ≙ doc_id % 29 = 0 in the
    fixture — tuned so every SF yields a non-empty, deterministic result:
    3/5/20 flagged docs at sf0.001/0.01/0.1). Probe shingles broadcast against one corpus scan — the
    corpus itself is never shuffled (functions/pipeline.py)."""
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    probes = docs.filter(F.col("doc_id") % 29 == 0).select("doc_id")
    return ngram_overlap_contamination(
        docs, probes, n=5, min_overlap=3
    ).orderBy("doc_id", "probe_id")


@query(
    "corpus_curation_report",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, text, {_TOKS} AS t FROM documents
    ),
    scored AS (
        SELECT doc_id, source,
               len(t) AS n_words,
               len(list_filter(t, x -> list_contains({_sw('en')}, x))) AS s_en,
               len(list_filter(t, x -> list_contains({_sw('es')}, x))) AS s_es,
               len(list_filter(t, x -> list_contains({_sw('de')}, x))) AS s_de,
               len(list_filter(t, x -> list_contains({_sw('fr')}, x))) AS s_fr,
               MIN(doc_id) OVER (PARTITION BY md5(text)) AS survivor
        FROM toks
    ),
    rep AS (
        SELECT doc_id, MAX(c) * 1.0 / SUM(c) AS top_word_ratio
        FROM (
            SELECT doc_id, tok, COUNT(*) AS c
            FROM (SELECT doc_id, UNNEST(t) AS tok FROM toks) u
            GROUP BY doc_id, tok
        ) wc GROUP BY doc_id
    ),
    gated AS (
        SELECT source, n_words,
               n_words >= 30 AS len_ok,
               s_en = greatest(s_en, s_es, s_de, s_fr)
                   AND greatest(s_en, s_es, s_de, s_fr) > 0 AS lang_en,
               survivor = doc_id AS not_dup,
               COALESCE(rep.top_word_ratio, 0) <= 0.12 AS rep_ok
        FROM scored LEFT JOIN rep USING (doc_id)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN len_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ok,
           CAST(SUM(CASE WHEN lang_en THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_en,
           CAST(SUM(CASE WHEN rep_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_rep_ok,
           CAST(SUM(CASE WHEN len_ok AND lang_en AND rep_ok AND not_dup
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
           CAST(SUM(CASE WHEN len_ok AND lang_en AND rep_ok AND not_dup
                    THEN n_words ELSE 0 END) AS BIGINT) AS selected_tokens
    FROM gated GROUP BY source ORDER BY source
    """,
)
def corpus_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation funnel as ONE composed plan: tokenize →
    quality gate (length) → language gate (stopword lang-ID = 'en') →
    repetition gate (top-word share <= 0.12, the Gopher-style signal,
    r05) → exact-dedup survivor gate (min doc_id per content hash) →
    per-source selection report with token budget. This is the query a
    training-data pipeline runs nightly; every gate reuses the library
    primitives (functions.text); the repetition gate adds the mode-count
    branch (explode + two doc-keyed aggregations) joined back on doc_id
    next to the content-hash window and the per-source aggregation."""
    from philotes_spark.functions import text as X
    from pyspark.sql import Window

    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    t = X.tokens(F.col("text"))
    w = Window.partitionBy(F.md5(F.col("text")))
    scored = docs.select(
        "doc_id",
        "source",
        X.word_count(t).alias("n_words"),
        X.lang_predict(t).alias("lang_pred"),
        (F.min("doc_id").over(w) == F.col("doc_id")).alias("not_dup"),
    )
    rep = (
        docs.select("doc_id", F.explode(t).alias("tok"))
        .groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg((F.max("count") / F.sum("count")).alias("top_word_ratio"))
    )
    # LEFT join: a zero-token document produces no explode rows, so an
    # inner join would silently drop it from the whole funnel including
    # n_docs (ADVICE r05). No repetition ⇒ ratio 0 ⇒ rep gate passes;
    # the length gate still rejects it from n_selected.
    gated = scored.join(rep, "doc_id", "left").select(
        "source",
        "n_words",
        (F.col("n_words") >= 30).alias("len_ok"),
        (F.col("lang_pred") == "en").alias("lang_en"),
        (F.coalesce(F.col("top_word_ratio"), F.lit(0.0)) <= 0.12).alias("rep_ok"),
        "not_dup",
    )
    sel = (
        F.col("len_ok") & F.col("lang_en") & F.col("rep_ok") & F.col("not_dup")
    )
    return (
        gated.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("len_ok"), 1).otherwise(0)).alias("n_len_ok"),
            F.sum(F.when(F.col("lang_en"), 1).otherwise(0)).alias("n_lang_en"),
            F.sum(F.when(F.col("rep_ok"), 1).otherwise(0)).alias("n_rep_ok"),
            F.sum(F.when(sel, 1).otherwise(0)).alias("n_selected"),
            F.sum(F.when(sel, F.col("n_words")).otherwise(0)).alias(
                "selected_tokens"
            ),
        )
        # one row per source (bounded): single-partition sort (r16)
        .coalesce(1)
        .orderBy("source")
    )


@query(
    "train_pack_sequences",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, len({_TOKS}) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT source, n_tokens,
               CAST(FLOOR((SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens) / 2048.0) AS BIGINT) AS pack_id
        FROM toks
    )
    SELECT source, pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           ROUND(SUM(n_tokens) / 2048.0, 4) AS fill_ratio
    FROM packed GROUP BY source, pack_id ORDER BY source, pack_id
    """,
)
def train_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing for training batches: documents are
    assigned to fixed-token-budget packs (2048 tokens) in doc_id order
    WITHIN each source — pack_id = floor(exclusive-prefix-token-sum /
    budget), the streaming-greedy packing every data loader implements,
    made engine-portable by using the deterministic doc order instead of
    a bin-packing heuristic. Output is the per-pack manifest (doc count,
    token count, fill ratio; the last pack of a source under-fills,
    everything else lands within one doc of the budget).

    Scale shape: the prefix sum is a window PARTITIONED by source — no
    global ordering, no single-task window (the B9-global
    distributed-prefix-sum pattern applies if packs must cross sources);
    then one aggregation on (source, pack_id). Two shuffles total."""
    from pyspark.sql import Window

    from philotes_spark.functions import text as X

    docs = load_table(spark, sf_dir, "documents")
    t = X.tokens(F.col("text"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = docs.select(
        "doc_id", "source", X.word_count(t).alias("n_tokens")
    )
    packed = toks.select(
        "source",
        "n_tokens",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048.0
        ).alias("pack_id"),
    )
    return (
        packed.groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(F.sum("n_tokens") / 2048.0, 4).alias("fill_ratio"),
        )
        .orderBy("source", "pack_id")
    )


@query(
    "train_source_mixture",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, len({_TOKS}) AS n_tok FROM documents
    ),
    src AS (
        SELECT source, SUM(n_tok) AS src_tokens FROM toks GROUP BY source
    ),
    rates AS (
        SELECT source, src_tokens,
               least(1.0, (0.5 * SUM(src_tokens) OVER () / COUNT(*) OVER ())
                          / src_tokens) AS rate
        FROM src
    ),
    kept AS (
        SELECT t.source, t.n_tok
        FROM toks t JOIN rates r USING (source)
        WHERE ('0x' || substring(md5(CAST(t.doc_id AS VARCHAR)), 1, 4))::INT
              / 65536.0 < r.rate
    ),
    kagg AS (
        SELECT source, COUNT(*) AS n, SUM(n_tok) AS tok
        FROM kept GROUP BY source
    )
    SELECT r.source,
           ROUND(r.rate, 4) AS target_rate,
           CAST(COALESCE(kagg.n, 0) AS BIGINT) AS kept_docs,
           CAST(COALESCE(kagg.tok, 0) AS BIGINT) AS kept_tokens
    FROM rates r LEFT JOIN kagg USING (source)
    ORDER BY r.source
    """,
)
def train_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-mixture sampling: give every source an equal
    share of a global token budget (here 50% of the corpus), convert the
    share into a per-source acceptance rate (capped at 1 for
    under-budget sources), and keep documents whose stable md5 bucket
    falls under the rate — the reproducible mixture-rebalancing step a
    training pipeline runs to stop giant sources from dominating.

    100 TB shape: per-source token totals are one hash aggregate
    (map-side partial, n_sources rows out); the rate table is
    n_sources rows and BROADCASTS back over the corpus for the sampling
    filter, so the only corpus-sized work is two scans — no corpus
    shuffle at all. The md5-bucket predicate is the same portable-hash
    convention as train_split_stats (functions/pipeline.py), so any
    engine reproduces the exact same sample."""
    from philotes_spark.functions import text as X
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", X.word_count(X.tokens(F.col("text"))).alias("n_tok")
    )
    src = docs.groupBy("source").agg(F.sum("n_tok").alias("src_tokens"))
    w = Window.partitionBy()  # n_sources rows — tiny
    rates = src.select(
        "source",
        F.least(
            F.lit(1.0),
            (F.lit(0.5) * F.sum("src_tokens").over(w) / F.count(F.lit(1)).over(w))
            / F.col("src_tokens"),
        ).alias("rate"),
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("double")
        / F.lit(65536.0)
    )
    kept = (
        docs.join(F.broadcast(rates), "source")
        .filter(u < F.col("rate"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("tok"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            F.round("rate", 4).alias("target_rate"),
            F.coalesce("n", F.lit(0)).cast("long").alias("kept_docs"),
            F.coalesce("tok", F.lit(0)).cast("long").alias("kept_tokens"),
        )
        # one row per source (bounded): single-partition sort (r16)
        .coalesce(1)
        .orderBy("source")
    )


@query(
    "train_chunk_documents",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    chunks AS (
        SELECT doc_id, t,
               UNNEST(generate_series(
                   0, CAST(floor((len(t) - 1) / 24) AS INT))) AS chunk_id
        FROM toks WHERE len(t) > 0
    )
    SELECT doc_id,
           CAST(chunk_id AS INT) AS chunk_id,
           CAST(len(t[chunk_id * 24 + 1 : chunk_id * 24 + 32]) AS BIGINT)
               AS n_tokens,
           md5(list_aggregate(t[chunk_id * 24 + 1 : chunk_id * 24 + 32],
                              'string_agg', ' ')) AS chunk_hash
    FROM chunks
    """,
)
def train_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/pretraining chunker: overlapping token windows of size 32 with
    stride 24 per document; one output row per chunk with its token count
    and an md5 fingerprint of the space-joined window (the downstream
    embed/index key).

    Shape (r11): ZERO shuffles — a pure per-document map. The token
    array materializes ONCE behind an ``explode(array(t))`` Generate
    barrier (projection collapse never crosses a Generate, so the
    per-chunk slices below reference an attribute and cannot re-run the
    tokenizer — the hazard that makes naive slice-per-chunk quadratic,
    PERF.md), then ``transform(sequence(0, n_chunks-1), i -> slice(t,
    i*24+1, 32))`` builds every chunk window as an O(32) array copy and
    one posexplode emits (chunk_id, chunk). Chunk i is nonempty iff
    i*24 < n, so the id range 0..floor((n-1)/24) reproduces exactly the
    per-token membership fan-out of the r≤10 plan — which needed a
    doc-keyed shuffle of every (token, chunk) pair plus a
    sort_array(collect_list(...)) per chunk to restore order; the slice
    IS in order. Measured at sf1 (interleaved A/B, min-of-4 cold):
    4.32 → 1.63 s; at 100 TB a chunker with no exchange at all beats any
    shuffle volume."""
    from philotes_spark.functions import text as X

    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", X.tokens(F.col("text")).alias("t")
    )
    # the size(t) guard runs over the materialized attribute — placed
    # before the barrier it would predicate-push below the projection
    # and inline the tokenizer into the Filter
    mat = docs.select("doc_id", F.explode(F.array("t")).alias("t")).filter(
        F.size("t") > 0
    )
    ch = mat.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, CAST(floor((size(t)-1)/24) AS INT)),"
                " i -> slice(t, i*24+1, 32))"
            )
        ).alias("chunk_id", "ctoks"),
    )
    return ch.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size("ctoks").cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", "ctoks")).alias("chunk_hash"),
    )


@query(
    "train_shuffle_epoch",
    oracle="""
    WITH k AS (
        SELECT doc_id, source,
               md5('epoch7:' || CAST(doc_id AS VARCHAR)) AS key
        FROM documents
    ),
    s AS (
        SELECT doc_id, source, key,
               ('0x' || substring(key, 1, 2))::INT % 8 AS shard
        FROM k
    )
    SELECT CAST(shard AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY shard ORDER BY key, doc_id
           ) AS BIGINT) AS pos,
           doc_id, source
    FROM s ORDER BY shard, pos
    """,
)
def train_shuffle_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for a training epoch: every document
    gets a pseudorandom rank from md5(seed:doc_id) — changing the seed
    string reshuffles, re-running reproduces the exact order on any
    engine (the oracle computes the identical hash). The order is
    materialized as (shard, pos): shard = first hash byte mod n_shards,
    pos = rank within the shard — the layout a distributed data loader
    consumes directly (one reader per shard, sequential within).

    Scale shape: a GLOBAL sort of 100 TB is a range-partitioned
    total order — legal but needless here; hashing already randomizes,
    so ordering only WITHIN hash-assigned shards gives the same
    statistical shuffle with a window partitioned by shard (uniform by
    construction, no skew) and no range-sampling pass. One projection +
    one shard-keyed window shuffle."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("epoch7:"), F.col("doc_id").cast("string")))
    keyed = docs.select(
        "doc_id",
        "source",
        key.alias("key"),
        F.pmod(F.conv(F.substring(key, 1, 2), 16, 10).cast("int"), F.lit(8))
        .cast("int")
        .alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("key", "doc_id")
    return (
        keyed.select(
            "shard",
            F.row_number().over(w).cast("long").alias("pos"),
            "doc_id",
            "source",
        )
        .orderBy("shard", "pos")
    )


@query(
    "train_stratified_sample",
    oracle=f"""
    WITH ranked AS (
        SELECT source, doc_id, len({_TOKS}) AS n_tok,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS sampled_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_ids,
           CAST(SUM(n_tok) AS BIGINT) AS sampled_tokens
    FROM ranked WHERE rn <= 40
    GROUP BY source ORDER BY source
    """,
)
def train_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling with EXACT per-stratum quotas:
    rank each source's documents by their stable md5 hash (doc_id
    tie-break) and take the top 40 — the eval-set / ablation-corpus
    builder that needs exactly-k-per-source, where the mixture sampler's
    rate predicate (train_source_mixture) only hits quotas in
    expectation. Any engine reproduces the identical sample (portable
    md5 ordering); sum_doc_ids pins WHICH docs were picked, not just
    how many.

    100 TB shape: one shuffle (hash-partition by source), per-stratum
    sort feeding row_number. With quotas ≪ stratum size, pre-filter by
    hash threshold (u < 2k/n_s) to bound each sort's input before
    ranking — the two-phase top-k trick; unnecessary at bench scale."""
    from philotes_spark.functions import text as X
    from pyspark.sql import Window

    docs = load_table_parallel(
        spark, sf_dir, "documents", "doc_id", min_bytes=1 << 20
    ).select(
        "doc_id", "source",
        X.word_count(X.tokens(F.col("text"))).alias("n_tok"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 40)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("sampled_docs"),
            F.sum("doc_id").cast("long").alias("sum_doc_ids"),
            F.sum("n_tok").cast("long").alias("sampled_tokens"),
        )
        # one row per source (bounded): single-partition sort (r16)
        .coalesce(1)
        .orderBy("source")
    )


@query(
    "train_length_batches",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, greatest(1, len({_TOKS})) AS n_tok FROM documents
    ),
    bucketed AS (
        SELECT n_tok,
               CAST(power(2, ceil(log2(n_tok))) AS BIGINT) AS bucket
        FROM toks
    ),
    agg AS (
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(bucket - n_tok) AS BIGINT) AS padding_tokens,
               CAST(SUM(n_tok) AS BIGINT) AS real_tokens
        FROM bucketed GROUP BY bucket
    )
    SELECT bucket, n_docs,
           CAST(greatest(1, 2048 // bucket) AS BIGINT) AS docs_per_batch,
           CAST(CEIL(CAST(n_docs AS DOUBLE)
                     / greatest(1, 2048 // bucket)) AS BIGINT) AS n_batches,
           padding_tokens,
           ROUND(100.0 * real_tokens / (n_docs * bucket), 2) AS fill_pct
    FROM agg ORDER BY bucket
    """,
)
def train_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed inference batching: pad each document up to its
    power-of-two token bucket, pack `floor(2048 / bucket)` docs per
    batch, and report per-bucket batch counts + padding waste + fill
    percentage — the batching plan an inference/embedding pipeline
    builds so a batch's sequences share a padded length (padding waste
    is the #1 throughput killer in naive batching).

    100 TB shape: pure map expressions + ONE hash aggregate keyed on
    ~15 bucket values (map-side partial collapses it); no window, no
    per-doc shuffle — the plan stays two narrow stages at any corpus
    size."""
    from philotes_spark.functions import text as X

    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id").select(
        F.greatest(
            F.lit(1), X.word_count(X.tokens(F.col("text")))
        ).alias("n_tok")
    )
    bucketed = docs.select(
        "n_tok",
        F.pow(F.lit(2.0), F.ceil(F.log2("n_tok"))).cast("long").alias("bucket"),
    )
    agg = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("bucket") - F.col("n_tok")).cast("long").alias("padding_tokens"),
        F.sum("n_tok").cast("long").alias("real_tokens"),
    )
    dpb = F.greatest(F.lit(1), (F.lit(2048) / F.col("bucket")).cast("long"))
    return agg.select(
        "bucket",
        "n_docs",
        dpb.cast("long").alias("docs_per_batch"),
        F.ceil(F.col("n_docs").cast("double") / dpb).cast("long").alias("n_batches"),
        "padding_tokens",
        F.round(
            F.lit(100.0) * F.col("real_tokens") / (F.col("n_docs") * F.col("bucket")),
            2,
        ).alias("fill_pct"),
        # one row per length bucket (fixed set): single-partition sort (r16)
    ).coalesce(1).orderBy("bucket")
