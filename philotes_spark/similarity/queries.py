"""Registered similarity-search queries over the `embeddings` table.

The brute-force tiers are oracle-checked: the DuckDB twin computes the
same double-precision dot products via UNNEST WITH ORDINALITY, and both
sides round cosine to 4 decimals. The LSH tier is rows-only (hyperplane
set lives in the Spark process).

Scan-parallelism site selection (r16, catalog.load_table_parallel —
cache-honest interleaved A/B, sf0.1/sf1; fuller protocol note in
text_queries.py):
- converted: the O(n²) pairs family (threshold_pairs −91% sf0.1,
  embedding_cosine −89%, connected_components −76%, threshold_sweep
  −89% — the block join broadcast one side, so the whole quadratic
  scoring sat in the single probe-scan task), quantized −44%/−81%,
  lsh_topk −19%/−59%, and the portable twins (lsh −10%/−58%,
  pq −12%/−74%, ivfpq −6%/−57%, semantic −24%/−58%; ivf +4%/−57%
  behind min_bytes=1MB);
- NOT converted, measured slower: cosine_topk +53%/+28% and
  filtered_topk +73%/+69% (the Arrow matmul is already cheap; the
  bounded query-vector collect pays the extra shuffle), norm_stats
  +7%, label_centroids +123%, label_inertia +37% at sf1 (posexplode
  collapses map-side into partial aggs — the exchange only adds bytes);
- NOT convertible: ivf/pq/ivfpq/filtered_ivf serving — their
  limit(sample).collect() training inputs are scan-order-sensitive, so
  a repartition would change trained codebooks and therefore results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from philotes_spark.registry import query
from philotes_spark.similarity.knn import (
    as_double,
    cosine_topk,
    l2_norm,
    lsh_topk,
    similarity_pairs,
)
from philotes_spark.sources.catalog import load_table, load_table_parallel

QUERY_IDS = [0, 1, 2, 3, 4]

# DuckDB fragments: per-element double-cast values (DuckDB v1.0 has no
# UNNEST WITH ORDINALITY — index via a select-list UNNEST of a series) and
# per-vector L2 norms computed in double precision.
_ELEMS = """
    idx AS (
        SELECT vec_id, embedding,
               UNNEST(generate_series(1, len(embedding))) AS i
        FROM embeddings
    ),
    elems AS (
        SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x FROM idx
    ),
    norms AS (
        SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM elems GROUP BY vec_id
    )
"""


@query(
    "sim_cosine_topk",
    oracle=f"""
    WITH {_ELEMS},
    dots AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.x * b.x) AS dp
        FROM elems a JOIN elems b ON a.i = b.i AND a.vec_id <> b.vec_id
        WHERE a.vec_id IN (0, 1, 2, 3, 4)
        GROUP BY a.vec_id, b.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id,
               ROUND(dp / (nq.nrm * nc.nrm), 4) AS cosine_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY dp / (nq.nrm * nc.nrm) DESC, neighbor_id) AS INT) AS rank
        FROM dots
        JOIN norms nq ON nq.vec_id = query_id
        JOIN norms nc ON nc.vec_id = neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank
    FROM ranked WHERE rank <= 10
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-10 for 5 query vectors — the ANN
    baseline. Served by the Arrow-batched numpy twin (r11,
    ``cosine_topk_arrow``: one matmul per batch, corpus scanned once,
    no join node — 2× the interpreted-lambda JVM fold, which stays as
    :func:`~philotes_spark.similarity.knn.cosine_topk`, the recall
    gates' ground truth, pinned row-identical in the suite)."""
    from philotes_spark.similarity.knn import cosine_topk_arrow

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_arrow(emb, QUERY_IDS, k=10)


@query(
    "sim_threshold_pairs",
    oracle=f"""
    WITH {_ELEMS},
    dots AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, SUM(a.x * b.x) AS dp
        FROM elems a JOIN elems b ON a.i = b.i AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id
    )
    SELECT vec_a, vec_b, ROUND(dp / (na.nrm * nb.nrm), 4) AS cosine_sim
    FROM dots
    JOIN norms na ON na.vec_id = vec_a
    JOIN norms nb ON nb.vec_id = vec_b
    WHERE dp / (na.nrm * nb.nrm) >= 0.35
    """,
)
def sim_threshold_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.35) — the exact
    tier of embedding dedup, planned as a block-matrix equi-join (no
    cartesian node; see similarity_pairs). The O(n²) comparisons are
    inherent to exactness; lsh_topk/ivf_topk are the sub-quadratic
    approximate paths.

    τ=0.35 is tuned to the synthetic fixtures' weak structure (max
    pairwise cosine ≈ 0.48-0.60 across sf0.001-0.1): it yields a
    non-empty, deterministic pair set at every SF (257/271/4137 pairs),
    so the correctness check exercises real matches, not the empty set.

    r16 guarded scan repartition (catalog.load_table_parallel): at
    fixture scale the one-row-group embeddings scan fed the block join
    through a BROADCAST of the replicated side, so the entire O(n²)
    scoring ran in the single probe-scan task. A/B (clearCache between
    cold reps): −91% at sf0.1 (10.90 → 0.98 s); same family
    dedup_embedding_cosine −89%, connected_components −76%,
    threshold_sweep below. Per-pair dots are computed within one joined
    row (zip_with/aggregate, fixed order) — partitioning cannot change
    any value."""
    emb = load_table_parallel(spark, sf_dir, "embeddings", "vec_id")
    return similarity_pairs(emb, 0.35)


@query(
    "sim_norm_stats",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vecs,
           ROUND(AVG(sq.nrm), 4) AS avg_norm,
           ROUND(MIN(sq.nrm), 4) AS min_norm,
           ROUND(MAX(sq.nrm), 4) AS max_norm
    FROM embeddings,
    LATERAL (
        SELECT sqrt(SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))) AS nrm
        FROM UNNEST(embedding) AS u(x)
    ) sq
    GROUP BY label ORDER BY label
    """,
)
def sim_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector-norm profile — the sanity/drift query of an
    embedding pipeline; exercises aggregate-over-array + groupBy."""
    emb = load_table(spark, sf_dir, "embeddings")
    nrm = l2_norm(as_double(F.col("embedding")))
    return (
        emb.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
            F.round(F.min("nrm"), 4).alias("min_norm"),
            F.round(F.max("nrm"), 4).alias("max_norm"),
        )
        # bounded label vocabulary: single-partition sort (r16)
        .coalesce(1)
        .orderBy("label")
    )


@query("sim_lsh_topk")  # rows-only: hyperplane tables are engine-local
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-10 for the same query set — the scale
    path (equi-join on buckets instead of a cross join).

    4 planes × 8 tables: tuned for this corpus's weak structure (top
    cosine ≈ 0.33 → per-table collision ≈ 0.13 for true neighbors). At
    larger corpora raise n_planes ~ log2(n) to keep buckets bounded."""
    # r16 guarded scan repartition: 8 hyperplane tables of per-row bit
    # projections ran single-task (one-row-group scan); A/B -19% sf0.1 /
    # -59% sf1. Plane tables derive from a fixed seed, bucketing and
    # ranking are per-row + deterministic windows - results unchanged.
    emb = load_table_parallel(spark, sf_dir, "embeddings", "vec_id")
    return lsh_topk(emb, QUERY_IDS, k=10, n_planes=4, n_tables=8).coalesce(
        1
    ).orderBy("query_id", "rank")


# IVF index cache: one (centroids, persisted cells) per corpus dir —
# index construction is the amortized half of IVF serving; queries reuse it.
_IVF_INDEX: dict[str, tuple[list[list[float]], DataFrame]] = {}


def _drop_index_memos(sf_dir: str | None = None) -> None:
    """registry.invalidate_query_cache hook: a genuine cold run must
    rebuild the ANN indexes from the parquet inputs (the CacheManager
    clear alone would leave stale un-persisted DataFrames in the memos,
    silently re-running the encode on every subsequent action)."""
    for memo in (_IVF_INDEX, _PQ_INDEX, _IVFPQ_INDEX):
        if sf_dir is None:
            memo.clear()
        else:
            memo.pop(sf_dir, None)


@query("sim_ivf_topk")  # rows-only: centroid index is engine-local
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-cell approximate top-10 for the same query set — the
    cluster-pruned ANN path (train on sample, probe nearest cells).
    The index is built once per corpus and cached; each call pays only
    probe + equi-join + re-rank, the steady-state serving cost."""
    from philotes_spark.similarity.ivf import build_index, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    if sf_dir not in _IVF_INDEX:
        # training samples the PLAIN scan (byte-stable centroids); the
        # encode pass is row-local and takes the scan-parallelism guard
        # (r17, VERDICT r16 #5 — the single-row-group fixture otherwise
        # runs the whole interpreted-lambda assignment on one task)
        # min_bytes=4MB, re-measured for the r17 Arrow assign
        # (assign_cells_arrow cut per-row cost ~50x, moving the guard's
        # crossover up): interleaved min-of-4 A/B — guard +23% at
        # 0.8 MB/sf0.1 (0.886 vs 1.093 s), +14% at 2.4 MB/sf0.3,
        # -7% at 5.2 MB/sf1 (1.130 -> 1.050 s)
        _IVF_INDEX[sf_dir] = build_index(
            emb,
            n_centroids=16,
            encode_df=load_table_parallel(
                spark, sf_dir, "embeddings", "vec_id", min_bytes=4 << 20
            ),
        )
    return ivf_topk(
        emb, QUERY_IDS, k=10, n_probe=6, index=_IVF_INDEX[sf_dir]
    ).coalesce(1).orderBy("query_id", "rank")


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH {_ELEMS},
    dots AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, SUM(a.x * b.x) AS dp
        FROM elems a JOIN elems b ON a.i = b.i AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id
    ),
    pairs AS (
        SELECT vec_a, vec_b FROM dots
        JOIN norms na ON na.vec_id = vec_a
        JOIN norms nb ON nb.vec_id = vec_b
        WHERE dp / (na.nrm * nb.nrm) >= 0.35
    )
    SELECT e.vec_id,
           COALESCE(MIN(p.vec_a), e.vec_id) AS canonical_id,
           MIN(p.vec_a) IS NOT NULL AS is_duplicate
    FROM embeddings e LEFT JOIN pairs p ON p.vec_b = e.vec_id
    GROUP BY e.vec_id
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup canonicalization (§2C): every vector maps
    to the smallest vec_id it duplicates (cos ≥ 0.35, tuned so the fixture
    corpus yields real duplicate clusters — see sim_threshold_pairs), else
    itself — the
    keep/drop assignment of an embedding-dedup pass. Single-pass min over
    the pair list (ids are pre-ordered vec_a < vec_b), not a transitive
    closure: chains A~B~C with cos(A,C) < τ keep B→A, C→B, matching the
    reference-free 'drop anything that has a smaller near-duplicate'
    policy. At scale the O(n²) pair step is replaced by the LSH-bucketed
    pair generator (similarity_pairs is the exact baseline)."""
    emb = load_table_parallel(spark, sf_dir, "embeddings", "vec_id")
    pairs = similarity_pairs(emb, 0.35).select("vec_a", "vec_b")
    canon = pairs.groupBy(F.col("vec_b").alias("vec_id")).agg(
        F.min("vec_a").alias("min_dup")
    )
    return emb.select("vec_id").join(canon, "vec_id", "left_outer").select(
        "vec_id",
        F.coalesce(F.col("min_dup"), F.col("vec_id")).alias("canonical_id"),
        F.col("min_dup").isNotNull().alias("is_duplicate"),
    )


@query(
    "dedup_connected_components",
    oracle=f"""
    WITH RECURSIVE {_ELEMS},
    dots AS (
        SELECT a.vec_id AS va, b.vec_id AS vb, SUM(a.x * b.x) AS dp
        FROM elems a JOIN elems b ON a.i = b.i AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id
    ),
    prs AS (
        SELECT va, vb FROM dots
        JOIN norms na ON na.vec_id = va
        JOIN norms nb ON nb.vec_id = vb
        WHERE dp / (na.nrm * nb.nrm) >= 0.35
    ),
    edges AS (
        SELECT va AS u, vb AS v FROM prs UNION SELECT vb, va FROM prs
    ),
    reach AS (
        SELECT u AS node, v AS r FROM edges
        UNION
        SELECT reach.node, e.v FROM reach JOIN edges e ON reach.r = e.u
    )
    SELECT emb.vec_id,
           CAST(COALESCE(LEAST(mn.m, emb.vec_id), emb.vec_id) AS BIGINT)
               AS canonical_id,
           COALESCE(mn.m < emb.vec_id, FALSE) AS is_duplicate
    FROM embeddings emb
    LEFT JOIN (SELECT node, MIN(r) AS m FROM reach GROUP BY node) mn
        ON mn.node = emb.vec_id
    """,
)
def dedup_connected_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive-closure dedup over the cosine near-dup graph (τ=0.35):
    every vector maps to the MINIMUM id in its connected component — the
    cluster-then-keep-one semantics that the single-pass canonicalizer
    (dedup_embedding_cosine) approximates. Spark side: iterated min-label
    propagation, one equi-join+agg shuffle pair per round, converges in
    O(cluster diameter) rounds with a 1-row convergence probe. The oracle
    is a WITH RECURSIVE reachability closure over the same exact pair
    set — an engine-independent proof the propagation closed every
    chain."""
    from philotes_spark.dedup.components import dedup_components

    emb = load_table_parallel(spark, sf_dir, "embeddings", "vec_id")
    pairs = similarity_pairs(emb, 0.35).select("vec_a", "vec_b")
    return dedup_components(pairs, emb, "vec_id", src="vec_a", dst="vec_b")


@query("sim_quantized_topk")  # rows-only: int8 rounding is engine-local
def sim_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized brute-force cosine top-10 — the memory-bound scale
    tier: the stored corpus shrinks 4-8x while cosine (scale-invariant)
    survives quantization to ~1/127 resolution. Same broadcast-scan plan
    as the exact tier; recall pinned vs exact in pytest."""
    from philotes_spark.similarity.knn import quantized_cosine_topk

    # r16 guarded scan repartition (catalog.load_table_parallel): the
    # per-element int8 quantization lambda is interpreted JVM work that
    # ran single-task on the one-row-group fixture scan; A/B -44% sf0.1
    # / -81% sf1. (cosine/filtered_topk measured SLOWER converted —
    # their Arrow matmul is already cheap and the query-vector collect
    # pays the extra shuffle — and stay on the plain scan.)
    emb = load_table_parallel(spark, sf_dir, "embeddings", "vec_id")
    return quantized_cosine_topk(emb, QUERY_IDS, k=10).coalesce(1).orderBy(
        "query_id", "rank"
    )


@query(
    "sim_label_centroids",
    oracle="""
    WITH idx AS (
        SELECT vec_id, label, embedding,
               UNNEST(generate_series(1, len(embedding))) AS i
        FROM embeddings
    ),
    elems AS (
        SELECT vec_id, label, i, CAST(embedding[i] AS DOUBLE) AS x FROM idx
    )
    SELECT label, i AS dim,
           ROUND(AVG(x), 4) + 0 AS centroid,
           CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM elems GROUP BY label, i ORDER BY label, dim
    """,
)
def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label class centroids in long form (label, dim, centroid,
    n_vecs) — the embedding-space profile a training pipeline computes
    before clustering/balancing (and the M-step of one k-means round).

    100 TB shape: posexplode to (label, dim, x) then ONE hash aggregate
    keyed by (label, dim) — partial avg collapses map-side, the shuffle
    carries n_labels x n_dims rows per map partition regardless of corpus
    size. No joins, no window, no driver collect."""
    emb = load_table(spark, sf_dir, "embeddings")
    elems = emb.select(
        "label", F.posexplode("embedding").alias("dim0", "x")
    ).select(
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.col("x").cast("double").alias("x"),
    )
    return (
        elems.groupBy("label", "dim")
        .agg(
            # + 0.0 normalizes IEEE negative zero (-0.0 + 0.0 = +0.0),
            # which the two engines' ROUND otherwise signs differently
            (F.round(F.avg("x"), 4) + F.lit(0.0)).alias("centroid"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
        # labels × fixed vector dims (bounded grid): one partition makes
        # the final sort exchange-free (r16)
        .coalesce(1)
        .orderBy("label", "dim")
    )


@query(
    "sim_label_inertia",
    oracle="""
    WITH idx AS (
        SELECT vec_id, label, embedding,
               UNNEST(generate_series(1, len(embedding))) AS i
        FROM embeddings
    ),
    elems AS (
        SELECT vec_id, label, i, CAST(embedding[i] AS DOUBLE) AS x FROM idx
    ),
    cent AS (
        SELECT label, i, AVG(x) AS c FROM elems GROUP BY label, i
    ),
    per_vec AS (
        SELECT e.vec_id, e.label, SUM((e.x - c.c) * (e.x - c.c)) AS sq
        FROM elems e JOIN cent c ON e.label = c.label AND e.i = c.i
        GROUP BY e.vec_id, e.label
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(AVG(sq), 4) AS mean_sq_dist
    FROM per_vec GROUP BY label ORDER BY label
    """,
)
def sim_label_inertia(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-class inertia (mean squared distance to the label
    centroid) — the k-means E-step shape and the compactness diagnostic
    for label quality / outlier hunting.

    100 TB shape: the centroid table is tiny (n_labels x n_dims) and is
    BROADCAST back against the exploded corpus — the big side is never
    shuffled for the join; per-vector partials then collapse map-side
    (every element of a vector lives in one input row), so the only
    corpus-sized shuffle carries one row per vector. Plan-audited:
    broadcast join present, no sort-merge join."""
    emb = load_table(spark, sf_dir, "embeddings")
    elems = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim0", "x"),
    ).select(
        "vec_id",
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.col("x").cast("double").alias("x"),
    )
    cent = elems.groupBy("label", "dim").agg(F.avg("x").alias("c"))
    per_vec = (
        elems.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.sum((F.col("x") - F.col("c")) ** 2).alias("sq"))
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("sq"), 4).alias("mean_sq_dist"),
        )
        # one row per label (bounded domain): one partition makes the
        # final sort exchange-free (r16)
        .coalesce(1)
        .orderBy("label")
    )


_PQ_INDEX: dict[str, tuple[list, DataFrame]] = {}

# IVF-PQ index cache: (centroids, codebooks, persisted coded corpus) per
# corpus dir — same amortization as _IVF_INDEX/_PQ_INDEX.
_IVFPQ_INDEX: dict[str, tuple[list, list, DataFrame]] = {}

from philotes_spark.registry import register_invalidator  # noqa: E402

register_invalidator(_drop_index_memos)


@query("sim_pq_topk")  # rows-only: per-subspace codebooks are engine-local
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-10 with exact re-rank — the
    compressed-domain ANN tier (similarity/pq.py): the corpus is served
    from 16-byte codes (16 subspaces × 16 codewords, 16× smaller than
    float32), queries score by codebook table lookups and only the
    candidate list touches float vectors. Codebooks + code column are
    built once per corpus and cached — each call pays the steady-state
    serving cost, like the IVF tier. Recall pinned vs exact in
    tests/test_similarity_recall.py (ADC 0.48, rerank-100 0.96)."""
    from philotes_spark.similarity.pq import encode_pq, pq_topk, train_pq_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    if sf_dir not in _PQ_INDEX:
        books = train_pq_codebooks(emb, m=16, ks=16)
        # codebooks train on the plain scan; the encode projection takes
        # the scan-parallelism guard (r17, see build_index)
        # min_bytes=4MB: the Arrow-batched numpy encode is cheap per
        # row — A/B (ivfpq twin, same fold): +24% at 0.8 MB/sf0.1,
        # -4% at 5.2 MB/sf1, so the guard stays off until a few MB
        emb_par = load_table_parallel(
            spark, sf_dir, "embeddings", "vec_id", min_bytes=4 << 20
        )
        _PQ_INDEX[sf_dir] = (books, encode_pq(emb_par, books).persist())
    books, codes = _PQ_INDEX[sf_dir]
    return pq_topk(
        emb, QUERY_IDS, books, k=10, rerank=100, codes=codes
    ).coalesce(1).orderBy("query_id", "rank")


@query(
    "sim_threshold_sweep",
    oracle=f"""
    WITH {_ELEMS},
    dots AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, SUM(a.x * b.x) AS dp
        FROM elems a JOIN elems b ON a.i = b.i AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id
    ),
    cos AS (
        SELECT ROUND(dp / (na.nrm * nb.nrm), 4) AS c
        FROM dots
        JOIN norms na ON na.vec_id = vec_a
        JOIN norms nb ON nb.vec_id = vec_b
        WHERE dp / (na.nrm * nb.nrm) >= 0.30
    ),
    g AS (SELECT UNNEST([30, 35, 40, 45, 50]) AS thr_pct)
    SELECT CAST(g.thr_pct AS INT) AS thr_pct,
           CAST(SUM(CASE WHEN c >= g.thr_pct / 100.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pairs,
           ROUND(AVG(CASE WHEN c >= g.thr_pct / 100.0 THEN c END), 4)
               AS avg_sim
    FROM cos CROSS JOIN g
    GROUP BY g.thr_pct ORDER BY thr_pct
    """,
)
def sim_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-dedup threshold calibration: how many near-duplicate
    pairs (and at what mean similarity) each candidate cosine cutoff
    would declare — computed from ONE exact pair pass at the loosest
    threshold, instead of re-running the O(n²) tier per candidate. This
    is the table read before committing a dedup threshold, the embedding
    twin of text_quality_threshold_sweep.

    Scale shape: the pair generation is the block-matrix equi-join of
    similarity_pairs (no cartesian node, per-task memory bounded by one
    block pair); the 5x grid fan-out happens on the already-reduced pair
    list and collapses map-side to 5 rows per partition."""
    emb = load_table_parallel(spark, sf_dir, "embeddings", "vec_id")
    pairs = similarity_pairs(emb, 0.30).select("cosine_sim")
    grid = F.array(*[F.lit(p) for p in (30, 35, 40, 45, 50)])
    kept = F.col("cosine_sim") >= F.col("thr_pct") / 100.0
    return (
        pairs.select("cosine_sim", F.explode(grid).alias("thr_pct"))
        .groupBy(F.col("thr_pct").cast("int").alias("thr_pct"))
        .agg(
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_pairs"),
            F.round(F.avg(F.when(kept, F.col("cosine_sim"))), 4).alias("avg_sim"),
        )
        # 5 fixed thresholds: one partition makes the final sort
        # exchange-free (bounded result, r16)
        .coalesce(1)
        .orderBy("thr_pct")
    )


@query("sim_ivfpq_topk")  # rows-only: trained codebooks are engine-local
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-10 for the standard query set — the combined production
    ANN layout (coarse cells prune WHICH rows are scored, residual PQ
    codes shrink WHAT is read; exact re-rank of the ADC top-50 restores
    true cosines). similarity/ivfpq.py documents the decomposition
    <q,v> ≈ <q,centroid[cell]> + LUT-sum. Recall floors and the
    rerank-recovers-exact contract are pinned in
    tests/test_similarity_recall.py. The index (centroids + codebooks +
    persisted coded corpus) is built once per corpus and cached, same as
    the IVF and PQ entries — training + the corpus encode are the
    amortized half; each call pays probe + ADC + re-rank only."""
    from philotes_spark.similarity.ivfpq import build_ivfpq_index, ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    if sf_dir not in _IVFPQ_INDEX:
        # plain-scan training, guarded-scan encode (r17, see build_index)
        # min_bytes=4MB: interleaved min-of-4 A/B (r17) — +24% at
        # 0.8 MB/sf0.1 (1.044 -> 1.296 s), -4% at 5.2 MB/sf1
        # (2.326 -> 2.235 s): the mapInArrow encode amortizes Python
        # worker startup only above a few MB of corpus
        _IVFPQ_INDEX[sf_dir] = build_ivfpq_index(
            emb,
            n_centroids=16,
            encode_df=load_table_parallel(
                spark, sf_dir, "embeddings", "vec_id", min_bytes=4 << 20
            ),
        )
    return ivfpq_topk(
        emb,
        QUERY_IDS,
        k=10,
        n_centroids=16,
        n_probe=4,
        rerank=50,
        index=_IVFPQ_INDEX[sf_dir],
    ).coalesce(1).orderBy("query_id", "rank")


@query(
    "sim_filtered_topk",
    oracle="""
    WITH q_idx AS (
        SELECT vec_id, embedding,
               UNNEST(generate_series(1, len(embedding))) AS i
        FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
    ),
    q_elems AS (
        SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x FROM q_idx
    ),
    q_norms AS (
        SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM q_elems GROUP BY vec_id
    ),
    c_idx AS (
        SELECT vec_id, embedding,
               UNNEST(generate_series(1, len(embedding))) AS i
        FROM embeddings WHERE label = 1
    ),
    c_elems AS (
        SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x FROM c_idx
    ),
    c_norms AS (
        SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM c_elems GROUP BY vec_id
    ),
    dots AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               SUM(a.x * b.x) AS dp
        FROM q_elems a JOIN c_elems b ON a.i = b.i AND a.vec_id <> b.vec_id
        GROUP BY a.vec_id, b.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id,
               ROUND(dp / (nq.nrm * nc.nrm), 4) AS cosine_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY dp / (nq.nrm * nc.nrm) DESC, neighbor_id)
                    AS INT) AS rank
        FROM dots
        JOIN q_norms nq ON nq.vec_id = query_id
        JOIN c_norms nc ON nc.vec_id = neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank
    FROM ranked WHERE rank <= 10
    """,
)
def sim_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN (r13): exact cosine top-10 restricted to corpus
    vectors with ``label = 1`` — the "nearest neighbors matching a
    metadata predicate" query every retrieval pipeline needs. PRE-filter
    search: the predicate is applied on the corpus DataFrame before the
    Arrow scorer, so it pushes down to the parquet scan and the matmul
    only ever sees qualifying vectors — the correct plan when the
    predicate is selective (a post-filter over an unfiltered top-k
    silently returns < k rows; an unfiltered scan wastes the predicate's
    entire selectivity at 100 TB). The sub-quadratic scale path composes
    the same way: filter the IVF/LSH posting lists before probing
    (over-fetch + post-filter only when the predicate is weak)."""
    from philotes_spark.similarity.knn import cosine_topk_arrow

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_arrow(
        emb, QUERY_IDS, k=10, corpus=emb.filter(F.col("label") == 1)
    )


@query("sim_filtered_ivf_topk")  # rows-only: centroid index is engine-local
def sim_filtered_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN at scale (r13): IVF top-10 restricted to ``label = 1``
    corpus vectors. The index is the SAME full-corpus cached index
    sim_ivf_topk serves (one index, every predicate — the amortization
    that makes filtered ANN affordable at 100 TB); the predicate lands
    as a semi-join on the posting lists before scoring, with n_probe
    raised to cover the thinner qualifying population per cell. Recall
    vs the exact filtered ground truth is gated in
    test_similarity_recall.py; the exact twin (sim_filtered_topk) is
    oracle-backed."""
    from philotes_spark.similarity.ivf import build_index, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    if sf_dir not in _IVF_INDEX:
        # training samples the PLAIN scan (byte-stable centroids); the
        # encode pass is row-local and takes the scan-parallelism guard
        # (r17, VERDICT r16 #5 — the single-row-group fixture otherwise
        # runs the whole interpreted-lambda assignment on one task)
        # min_bytes=4MB, re-measured for the r17 Arrow assign
        # (assign_cells_arrow cut per-row cost ~50x, moving the guard's
        # crossover up): interleaved min-of-4 A/B — guard +23% at
        # 0.8 MB/sf0.1 (0.886 vs 1.093 s), +14% at 2.4 MB/sf0.3,
        # -7% at 5.2 MB/sf1 (1.130 -> 1.050 s)
        _IVF_INDEX[sf_dir] = build_index(
            emb,
            n_centroids=16,
            encode_df=load_table_parallel(
                spark, sf_dir, "embeddings", "vec_id", min_bytes=4 << 20
            ),
        )
    return ivf_topk(
        emb,
        QUERY_IDS,
        k=10,
        n_probe=8,
        index=_IVF_INDEX[sf_dir],
        corpus=emb.filter(F.col("label") == 1),
    ).coalesce(1).orderBy("query_id", "rank")


# Portable hyperplane signs for the LSH twin: s(t, p, d) = +1 iff the
# first hex digit of md5("t:p:d") < 8 — derivable verbatim in any engine,
# embedded as literals on BOTH sides (2 tables x 4 planes x 64 dims).
def _lsh_portable_signs() -> dict[tuple[int, int], list[int]]:
    import hashlib

    return {
        (t, p): [
            1
            if int(
                hashlib.md5(f"{t}:{p}:{d}".encode()).hexdigest()[0], 16
            ) < 8
            else -1
            for d in range(1, 65)
        ]
        for t in range(2)
        for p in range(4)
    }


_LSH_PORTABLE = _lsh_portable_signs()
_LSH_SIGN_VALUES = ", ".join(
    f"({t}, {p}, {d}, {s})"
    for (t, p), row in sorted(_LSH_PORTABLE.items())
    for d, s in enumerate(row, start=1)
)


@query(
    "sim_lsh_portable",
    oracle=f"""
    WITH idx AS (
        SELECT vec_id, embedding,
               UNNEST(generate_series(1, len(embedding))) AS i
        FROM embeddings
    ),
    elems AS (
        SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x FROM idx
    ),
    qelems AS (
        SELECT vec_id, i,
               CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000)
                    AS BIGINT) AS xq
        FROM idx
    ),
    signs(t, p, d, s) AS (VALUES {_LSH_SIGN_VALUES}),
    proj AS (
        SELECT e.vec_id, s.t, s.p, SUM(e.xq * s.s) AS pr
        FROM qelems e JOIN signs s ON s.d = e.i
        GROUP BY e.vec_id, s.t, s.p
    ),
    bucket AS (
        SELECT vec_id, t,
               STRING_AGG(CASE WHEN pr >= 0 THEN '1' ELSE '0' END, ''
                          ORDER BY p) AS bk
        FROM proj GROUP BY vec_id, t
    ),
    cand AS (
        SELECT DISTINCT b1.vec_id AS query_id, b2.vec_id AS neighbor_id
        FROM bucket b1
        JOIN bucket b2 ON b1.t = b2.t AND b1.bk = b2.bk
        WHERE b1.vec_id IN (0, 1, 2, 3, 4) AND b1.vec_id <> b2.vec_id
    ),
    norms AS (
        SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM elems GROUP BY vec_id
    ),
    dots AS (
        SELECT c.query_id, c.neighbor_id, SUM(a.x * b.x) AS dp
        FROM cand c
        JOIN elems a ON a.vec_id = c.query_id
        JOIN elems b ON b.vec_id = c.neighbor_id AND b.i = a.i
        GROUP BY c.query_id, c.neighbor_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id,
               ROUND(dp / (nq.nrm * nc.nrm), 4) AS cosine_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY dp / (nq.nrm * nc.nrm) DESC, neighbor_id)
                    AS INT) AS rank
        FROM dots
        JOIN norms nq ON nq.vec_id = query_id
        JOIN norms nc ON nc.vec_id = neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank
    FROM ranked WHERE rank <= 10
    """,
)
def sim_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH with every primitive PORTABLE (r13, the
    sim-tier sibling of dedup_minhash_portable): md5-derived ±1
    hyperplane signs shared verbatim with DuckDB, projections in INTEGER
    arithmetic (elements quantized ×1e6 → BIGINT, so the sign bit is
    order-independent — float summation order could flip a
    projection-at-zero), sign-bit buckets over 2 tables × 4 planes,
    bucket equi-join, exact double-cosine re-rank. The driver hash-compare
    proves the LSH construction itself — hyperplane bucketing, multi-table
    candidate union, re-rank — is correct; the production ``lsh_topk``
    (engine-local random hyperplanes at production plane counts) stays
    recall-gated. Scale shape is lsh_topk's: bucket ids are one
    projection, the join is equi on (table, bucket), no cross join."""
    from pyspark.sql import Window

    from philotes_spark.similarity.knn import dot

    emb = load_table_parallel(spark, sf_dir, "embeddings", "vec_id")
    v = as_double(F.col("embedding"))
    vq = F.transform(v, lambda x: F.round(x * 1000000).cast("long"))
    base = emb.select(
        F.col("vec_id").alias("id"),
        v.alias("v"),
        vq.alias("vq"),
        l2_norm(v).alias("nrm"),
    )

    def proj(signs: list[int]):
        sarr = F.array(*[F.lit(s) for s in signs])
        return F.aggregate(
            F.zip_with(F.col("vq"), sarr, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    buckets = F.array(
        *[
            F.concat(
                *[
                    F.when(proj(_LSH_PORTABLE[(t, p)]) >= 0, F.lit("1"))
                    .otherwise(F.lit("0"))
                    for p in range(4)
                ]
            )
            for t in range(2)
        ]
    )
    b = base.select("id", "v", "nrm", F.posexplode(buckets).alias("t", "bk"))
    q = b.filter(F.col("id").isin(QUERY_IDS)).select(
        F.col("id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "t",
        "bk",
    )
    c = b.select(
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
        "t",
        "bk",
    )
    scored = (
        c.join(F.broadcast(q), ["t", "bk"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn(
            "sim",
            dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "query_id",
            "neighbor_id",
            F.round("sim", 4).alias("cosine_sim"),
            "rank",
        )
    )


@query(
    "sim_ivf_portable",
    oracle="""
    WITH idx AS (
        SELECT vec_id, embedding,
               UNNEST(generate_series(1, len(embedding))) AS i
        FROM embeddings
    ),
    elems AS (
        SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x FROM idx
    ),
    qelems AS (
        SELECT vec_id, i,
               CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000)
                    AS BIGINT) AS xq
        FROM idx
    ),
    celems AS (  -- fixed codebook: vec_ids 10..25 are cells 0..15
        SELECT vec_id - 10 AS cell, i, xq AS cq
        FROM qelems WHERE vec_id BETWEEN 10 AND 25
    ),
    cnorm AS (
        SELECT cell, SUM(cq * cq) AS n2 FROM celems GROUP BY cell
    ),
    dots_c AS (
        SELECT e.vec_id, c.cell, SUM(e.xq * c.cq) AS dp
        FROM qelems e JOIN celems c ON c.i = e.i
        GROUP BY e.vec_id, c.cell
    ),
    scored_c AS (  -- L2 assignment: argmin |x-c|^2 = argmin n2 - 2*dp
        SELECT d.vec_id, d.cell,
               ROW_NUMBER() OVER (PARTITION BY d.vec_id
                    ORDER BY cn.n2 - 2 * d.dp ASC, d.cell DESC) AS rnk
        FROM dots_c d JOIN cnorm cn ON cn.cell = d.cell
    ),
    assign AS (SELECT vec_id, cell FROM scored_c WHERE rnk = 1),
    probe AS (  -- queries probe their 4 nearest cells, same ordering
        SELECT vec_id AS query_id, cell FROM scored_c
        WHERE rnk <= 4 AND vec_id IN (0, 1, 2, 3, 4)
    ),
    cand AS (
        SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
        FROM probe p JOIN assign a ON a.cell = p.cell
        WHERE a.vec_id <> p.query_id
    ),
    norms AS (
        SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM elems GROUP BY vec_id
    ),
    dots AS (
        SELECT c.query_id, c.neighbor_id, SUM(a.x * b.x) AS dp
        FROM cand c
        JOIN elems a ON a.vec_id = c.query_id
        JOIN elems b ON b.vec_id = c.neighbor_id AND b.i = a.i
        GROUP BY c.query_id, c.neighbor_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id,
               ROUND(dp / (nq.nrm * nc.nrm), 4) AS cosine_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY dp / (nq.nrm * nc.nrm) DESC, neighbor_id)
                    AS INT) AS rank
        FROM dots
        JOIN norms nq ON nq.vec_id = query_id
        JOIN norms nc ON nc.vec_id = neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank
    FROM ranked WHERE rank <= 10
    """,
)
def sim_ivf_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with every primitive PORTABLE (r13, completing the portable
    twin set: minhash/simhash/LSH/IVF): the codebook is FIXED (the
    vectors of vec_ids 10..25 are cells 0..15 — no k-means, so both
    engines share it verbatim), assignment is L2 in INTEGER arithmetic
    (elements quantized ×1e6 → BIGINT; argmin |x−c|² = argmin n2−2·dp,
    exact on both sides, ties to the higher cell), queries probe their
    4 nearest cells by the same ordering, and candidates re-rank by
    exact double cosine. The driver hash-compare proves the IVF
    construction itself — cell assignment, multi-cell probing, the
    cell equi-join, re-rank — while the production ``ivf_topk``
    (k-means-trained codebook, engine-local) stays recall-gated.
    Scale shape matches ivf.py: assignment is one projection over the
    corpus, the probe join is equi on cell, no cross join."""
    from pyspark.sql import Window

    from philotes_spark.similarity.knn import dot

    emb = load_table_parallel(
        spark, sf_dir, "embeddings", "vec_id", min_bytes=1 << 20
    )
    v = as_double(F.col("embedding"))
    vq = F.transform(v, lambda x: F.round(x * 1000000).cast("long"))
    base = emb.select(
        F.col("vec_id").alias("id"),
        v.alias("v"),
        vq.alias("vq"),
        l2_norm(v).alias("nrm"),
    )
    # bounded driver collect (16 rows): the fixed codebook, quantized
    crows = (
        base.filter((F.col("id") >= 10) & (F.col("id") <= 25))
        .select("id", "vq")
        .collect()
    )
    cents = sorted((int(r.id) - 10, [int(x) for x in r.vq]) for r in crows)
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(cell).alias("cell"),
                F.array(*[F.lit(x) for x in cv]).alias("cv"),
                F.lit(sum(x * x for x in cv)).alias("n2"),
            )
            for cell, cv in cents
        ]
    )
    per_cell = base.select(
        "id", "v", "nrm", "vq", F.explode(cent_arr).alias("c")
    ).select(
        "id",
        "v",
        "nrm",
        F.col("c.cell").alias("cell"),
        (
            F.col("c.n2")
            - 2
            * F.aggregate(
                F.zip_with(
                    F.col("vq"), F.col("c.cv"), lambda x, c: x * c
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
        ).alias("score"),
    )
    wc = Window.partitionBy("id").orderBy(F.asc("score"), F.desc("cell"))
    ranked_c = per_cell.select(
        "id", "v", "nrm", "cell", F.row_number().over(wc).alias("rnk")
    )
    assign = ranked_c.filter(F.col("rnk") == 1).select(
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("cv2"),
        F.col("nrm").alias("cn"),
        "cell",
    )
    probe = ranked_c.filter(
        (F.col("rnk") <= 4) & F.col("id").isin(QUERY_IDS)
    ).select(
        F.col("id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "cell",
    )
    scored = (
        assign.join(F.broadcast(probe), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn(
            "sim",
            dot(F.col("qv"), F.col("cv2")) / (F.col("qn") * F.col("cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "query_id",
            "neighbor_id",
            F.round("sim", 4).alias("cosine_sim"),
            "rank",
        )
    )


@query(
    "sim_pq_portable",
    oracle="""
    WITH idx AS (
        SELECT vec_id, embedding,
               UNNEST(generate_series(1, len(embedding))) AS i
        FROM embeddings
    ),
    elems AS (
        SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x FROM idx
    ),
    qelems AS (
        SELECT vec_id, i, CAST((i - 1) // 8 AS INT) AS sub,
               CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000)
                    AS BIGINT) AS xq
        FROM idx
    ),
    celems AS (  -- per-subspace codebooks: vec_ids 10..25 contribute
                 -- their j-th 8-dim sub-segment as codeword (sub, code)
        SELECT vec_id - 10 AS code, sub, i, xq AS cq
        FROM qelems WHERE vec_id BETWEEN 10 AND 25
    ),
    cnorm AS (
        SELECT sub, code, SUM(cq * cq) AS n2 FROM celems GROUP BY sub, code
    ),
    sdots AS (  -- serves BOTH the corpus encode and the query ADC LUT
        SELECT e.vec_id, e.sub, c.code, SUM(e.xq * c.cq) AS dp
        FROM qelems e JOIN celems c ON c.i = e.i AND c.sub = e.sub
        GROUP BY e.vec_id, e.sub, c.code
    ),
    ranked_codes AS (
        SELECT s.vec_id, s.sub, s.code,
               ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
                    ORDER BY cn.n2 - 2 * s.dp ASC, s.code ASC) AS rnk
        FROM sdots s JOIN cnorm cn ON cn.sub = s.sub AND cn.code = s.code
    ),
    assign AS (
        SELECT vec_id, sub, code FROM ranked_codes WHERE rnk = 1
    ),
    adc AS (  -- est(q, n) = sum_j dot(q's sub j, n's codeword at sub j)
        SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
               SUM(q.dp) AS est
        FROM assign a
        JOIN sdots q ON q.sub = a.sub AND q.code = a.code
        WHERE q.vec_id IN (0, 1, 2, 3, 4) AND a.vec_id <> q.vec_id
        GROUP BY q.vec_id, a.vec_id
    ),
    cand AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY est DESC, neighbor_id) AS arnk
            FROM adc
        ) WHERE arnk <= 50
    ),
    norms AS (
        SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM elems GROUP BY vec_id
    ),
    dots AS (
        SELECT c.query_id, c.neighbor_id, SUM(a.x * b.x) AS dp
        FROM cand c
        JOIN elems a ON a.vec_id = c.query_id
        JOIN elems b ON b.vec_id = c.neighbor_id AND b.i = a.i
        GROUP BY c.query_id, c.neighbor_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id,
               ROUND(dp / (nq.nrm * nc.nrm), 4) AS cosine_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY dp / (nq.nrm * nc.nrm) DESC, neighbor_id)
                    AS INT) AS rank
        FROM dots
        JOIN norms nq ON nq.vec_id = query_id
        JOIN norms nc ON nc.vec_id = neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank
    FROM ranked WHERE rank <= 10
    """,
)
def sim_pq_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization with every primitive PORTABLE (r13; the
    fourth and last ANN tier to get a hash-compare): 8 subspaces × 16
    codewords where codeword (sub, code) is the sub-segment of seed
    vector ``code + 10`` (no k-means — both engines share the books
    verbatim), sub-space encode by INTEGER L2 (quantized ×1e6;
    argmin n2 − 2·dp, ties to the lower code), ADC estimates as exact
    BIGINT sums THROUGH THE SAME sub-dot relation that encoded the
    corpus (the query's LUT row *is* its sdots row — the symmetry that
    makes ADC an O(m) table lookup), top-50 ADC candidates re-ranked by
    exact double cosine. The hash-compare proves the PQ construction
    itself — sub-space split, codeword assignment, ADC accumulation,
    rerank cut — while the production k-means ``pq_topk`` stays
    recall-gated. Scale shape matches pq.py: encode is one projection,
    ADC carries (query × corpus × m) longs, rerank reads floats for 50
    candidates per query only."""
    from pyspark.sql import Window

    from philotes_spark.similarity.knn import dot

    emb = load_table_parallel(spark, sf_dir, "embeddings", "vec_id")
    v = as_double(F.col("embedding"))
    vq = F.transform(v, lambda x: F.round(x * 1000000).cast("long"))
    base = emb.select(
        F.col("vec_id").alias("id"),
        v.alias("v"),
        vq.alias("vq"),
        l2_norm(v).alias("nrm"),
    )
    # bounded driver collect (16 rows): the fixed codebook, quantized,
    # split into 8-dim sub-segments
    crows = (
        base.filter((F.col("id") >= 10) & (F.col("id") <= 25))
        .select("id", "vq")
        .collect()
    )
    books: dict[int, list[tuple[int, list[int], int]]] = {}
    for r in sorted(crows, key=lambda r: r.id):
        code = int(r.id) - 10
        full = [int(x) for x in r.vq]
        for sub in range(8):
            seg = full[8 * sub : 8 * sub + 8]
            books.setdefault(sub, []).append(
                (code, seg, sum(x * x for x in seg))
            )
    books_lit = F.array(
        *[
            F.struct(
                F.lit(sub).alias("sub"),
                F.array(
                    *[
                        F.struct(
                            F.lit(code).alias("code"),
                            F.array(*[F.lit(x) for x in seg]).alias("cv"),
                            F.lit(n2).alias("n2"),
                        )
                        for code, seg, n2 in books[sub]
                    ]
                ).alias("cw"),
            )
            for sub in range(8)
        ]
    )
    # per (id, sub): the 16 integer dots — one relation serves both the
    # corpus encode (argmin n2-2dp) and the query ADC LUT (dp by code)
    sdots = (
        base.select("id", "v", "nrm", "vq", F.explode(books_lit).alias("b"))
        .select(
            "id",
            "v",
            "nrm",
            F.col("b.sub").alias("sub"),
            F.explode("b.cw").alias("c"),
            F.slice("vq", F.col("b.sub") * 8 + 1, 8).alias("svq"),
        )
        .select(
            "id",
            "v",
            "nrm",
            "sub",
            F.col("c.code").alias("code"),
            F.aggregate(
                F.zip_with(
                    "svq", F.col("c.cv"), lambda x, c: x * c
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dp"),
            (F.col("c.n2")).alias("n2"),
        )
    )
    wc = Window.partitionBy("id", "sub").orderBy(
        (F.col("n2") - 2 * F.col("dp")).asc(), F.col("code").asc()
    )
    ranked_codes = sdots.withColumn("rnk", F.row_number().over(wc))
    assign = ranked_codes.filter(F.col("rnk") == 1).select(
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("cv2"),
        F.col("nrm").alias("cn"),
        "sub",
        "code",
    )
    qlut = sdots.filter(F.col("id").isin(QUERY_IDS)).select(
        F.col("id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "sub",
        "code",
        "dp",
    )
    adc = (
        assign.join(F.broadcast(qlut), ["sub", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum("dp").alias("est"),
            F.first("qv").alias("qv"),
            F.first("qn").alias("qn"),
            F.first("cv2").alias("cv2"),
            F.first("cn").alias("cn"),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.desc("est"), "neighbor_id"
    )
    cand = adc.withColumn("arnk", F.row_number().over(wa)).filter(
        F.col("arnk") <= 50
    )
    scored = cand.withColumn(
        "sim", dot(F.col("qv"), F.col("cv2")) / (F.col("qn") * F.col("cn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "query_id",
            "neighbor_id",
            F.round("sim", 4).alias("cosine_sim"),
            "rank",
        )
    )


@query(
    "sim_ivfpq_portable",
    oracle="""
    WITH idx AS (
        SELECT vec_id, embedding,
               UNNEST(generate_series(1, len(embedding))) AS i
        FROM embeddings
    ),
    elems AS (
        SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x FROM idx
    ),
    qelems AS (
        SELECT vec_id, i, CAST((i - 1) // 8 AS INT) AS sub,
               CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000)
                    AS BIGINT) AS xq
        FROM idx
    ),
    celems AS (  -- coarse codebook: vec_ids 10..25 are cells 0..15
        SELECT vec_id - 10 AS cell, i, xq AS cq
        FROM qelems WHERE vec_id BETWEEN 10 AND 25
    ),
    cnorm AS (
        SELECT cell, SUM(cq * cq) AS n2 FROM celems GROUP BY cell
    ),
    cdots AS (
        SELECT e.vec_id, c.cell, SUM(e.xq * c.cq) AS dp
        FROM qelems e JOIN celems c ON c.i = e.i
        GROUP BY e.vec_id, c.cell
    ),
    cassign AS (
        SELECT d.vec_id, d.cell,
               ROW_NUMBER() OVER (PARTITION BY d.vec_id
                    ORDER BY cn.n2 - 2 * d.dp ASC, d.cell DESC) AS rnk
        FROM cdots d JOIN cnorm cn ON cn.cell = d.cell
    ),
    assign AS (SELECT vec_id, cell FROM cassign WHERE rnk = 1),
    probe AS (
        SELECT vec_id AS query_id, cell FROM cassign
        WHERE rnk <= 4 AND vec_id IN (0, 1, 2, 3, 4)
    ),
    sres AS (  -- residual codebooks: vec_ids 30..45's residuals against
               -- their OWN assigned cells; sub-segment (sub, code)
        SELECT s.vec_id - 30 AS code, s.i, s.sub, s.xq - c.cq AS rq
        FROM qelems s
        JOIN assign a ON a.vec_id = s.vec_id
        JOIN celems c ON c.cell = a.cell AND c.i = s.i
        WHERE s.vec_id BETWEEN 30 AND 45
    ),
    rnorm AS (
        SELECT sub, code, SUM(rq * rq) AS n2r FROM sres GROUP BY sub, code
    ),
    vres AS (  -- every vector's residual against its assigned cell
        SELECT e.vec_id, e.i, e.sub, e.xq - c.cq AS r
        FROM qelems e
        JOIN assign a ON a.vec_id = e.vec_id
        JOIN celems c ON c.cell = a.cell AND c.i = e.i
    ),
    vrdots AS (
        SELECT v.vec_id, v.sub, s.code, SUM(v.r * s.rq) AS dp
        FROM vres v JOIN sres s ON s.i = v.i AND s.sub = v.sub
        GROUP BY v.vec_id, v.sub, s.code
    ),
    vcode AS (  -- per-subspace residual encode, ties to the lower code
        SELECT vec_id, sub, code FROM (
            SELECT d.vec_id, d.sub, d.code,
                   ROW_NUMBER() OVER (PARTITION BY d.vec_id, d.sub
                        ORDER BY rn.n2r - 2 * d.dp ASC, d.code ASC) AS rnk
            FROM vrdots d
            JOIN rnorm rn ON rn.sub = d.sub AND rn.code = d.code
        ) WHERE rnk = 1
    ),
    s1 AS (  -- query half of the decomposed LUT: dot(xq_q, rcw)
        SELECT e.vec_id AS query_id, e.sub, s.code, SUM(e.xq * s.rq) AS dp
        FROM qelems e JOIN sres s ON s.i = e.i AND s.sub = e.sub
        WHERE e.vec_id IN (0, 1, 2, 3, 4)
        GROUP BY e.vec_id, e.sub, s.code
    ),
    s2 AS (  -- cell half: dot(centroid, rcw)
        SELECT c.cell, s.sub, s.code, SUM(c.cq * s.rq) AS dp
        FROM celems c JOIN sres s ON s.i = c.i
        GROUP BY c.cell, s.sub, s.code
    ),
    tn AS (  -- per-neighbor constant: sum_j s2(cell(n), j, code(n, j))
        SELECT vc.vec_id, SUM(s2.dp) AS t
        FROM vcode vc
        JOIN assign a ON a.vec_id = vc.vec_id
        JOIN s2 ON s2.cell = a.cell AND s2.sub = vc.sub
               AND s2.code = vc.code
        GROUP BY vc.vec_id
    ),
    adc AS (  -- est(q, n) = sum_j s1(q, j, code(n, j)) - t(n), exact ints
        SELECT p.query_id, a.vec_id AS neighbor_id,
               SUM(s1.dp) - MIN(tn.t) AS est
        FROM probe p
        JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
        JOIN vcode vc ON vc.vec_id = a.vec_id
        JOIN s1 ON s1.query_id = p.query_id AND s1.sub = vc.sub
               AND s1.code = vc.code
        JOIN tn ON tn.vec_id = a.vec_id
        GROUP BY p.query_id, a.vec_id
    ),
    cand AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY est DESC, neighbor_id) AS arnk
            FROM adc
        ) WHERE arnk <= 30
    ),
    norms AS (
        SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM elems GROUP BY vec_id
    ),
    dots AS (
        SELECT c.query_id, c.neighbor_id, SUM(a.x * b.x) AS dp
        FROM cand c
        JOIN elems a ON a.vec_id = c.query_id
        JOIN elems b ON b.vec_id = c.neighbor_id AND b.i = a.i
        GROUP BY c.query_id, c.neighbor_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id,
               ROUND(dp / (nq.nrm * nc.nrm), 4) AS cosine_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY dp / (nq.nrm * nc.nrm) DESC, neighbor_id)
                    AS INT) AS rank
        FROM dots
        JOIN norms nq ON nq.vec_id = query_id
        JOIN norms nc ON nc.vec_id = neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank
    FROM ranked WHERE rank <= 10
    """,
)
def sim_ivfpq_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with every primitive PORTABLE (r13; the composed tier, so
    every approximate construction in the engine now has a hash-compare):
    coarse cells from the fixed IVF codebook (vecs 10..25, integer L2,
    ties high), RESIDUAL product quantization with books from vecs
    30..45's own residuals (integer subtraction — exact on both sides),
    per-subspace residual encode (ties low), 4-cell probing, and ADC
    through the DECOMPOSED LUT dot(x_q − c, rcw) = S1(q) − S2(cell):
    S2 folds into one per-neighbor BIGINT constant t(n) = Σⱼ S2(cell(n),
    j, codeⱼ(n)), so the query-side join is exactly the PQ twin's shape
    — est(q, n) = Σⱼ S1(q, j, codeⱼ(n)) − t(n), exact integers end to
    end. Top-30 ADC candidates re-rank by exact double cosine. The
    production k-means ``ivfpq_topk`` stays recall-gated. Scale shape
    matches ivfpq.py: encode is a projection, ADC carries longs keyed by
    the probed cells only, floats read for 30 candidates per query."""
    from pyspark.sql import Window

    from philotes_spark.similarity.knn import dot

    emb = load_table_parallel(spark, sf_dir, "embeddings", "vec_id")
    v = as_double(F.col("embedding"))
    vq = F.transform(v, lambda x: F.round(x * 1000000).cast("long"))
    base = emb.select(
        F.col("vec_id").alias("id"),
        v.alias("v"),
        vq.alias("vq"),
        l2_norm(v).alias("nrm"),
    )
    # bounded driver collects: 16 centroids + 16 PQ seed vectors
    crows = (
        base.filter(
            ((F.col("id") >= 10) & (F.col("id") <= 25))
            | ((F.col("id") >= 30) & (F.col("id") <= 45))
        )
        .select("id", "vq")
        .collect()
    )
    byid = {int(r.id): [int(x) for x in r.vq] for r in crows}
    cents = [byid[10 + c] for c in range(16)]
    cn2 = [sum(x * x for x in cv) for cv in cents]

    def int_assign(xq: list[int]) -> int:
        # argmin |x-c|^2 = argmin n2 - 2*dot, ties to the HIGHER cell —
        # the same integer rule the engine-side expressions apply
        best, best_score = 0, None
        for cell, cv in enumerate(cents):
            score = cn2[cell] - 2 * sum(x * c for x, c in zip(xq, cv))
            if best_score is None or score < best_score or (
                score == best_score and cell > best
            ):
                best, best_score = cell, score
        return best

    # residual PQ books: seed residuals against their own cells, split
    # into 8-dim sub-segments (pure integer math — identical on any
    # engine, so computing it driver-side keeps portability)
    rbooks: dict[int, list[tuple[int, list[int], int]]] = {}
    for code in range(16):
        seed = byid[30 + code]
        cv = cents[int_assign(seed)]
        res = [x - c for x, c in zip(seed, cv)]
        for sub in range(8):
            seg = res[8 * sub : 8 * sub + 8]
            rbooks.setdefault(sub, []).append(
                (code, seg, sum(x * x for x in seg))
            )
    # s2(cell, sub, code) = dot(centroid sub-segment, residual codeword)
    s2 = {
        (cell, sub, code): sum(
            c * r
            for c, r in zip(cents[cell][8 * sub : 8 * sub + 8], seg)
        )
        for cell in range(16)
        for sub in range(8)
        for code, seg, _ in rbooks[sub]
    }

    cents_lit = F.array(
        *[F.array(*[F.lit(x) for x in cv]) for cv in cents]
    )
    cn2_lit = F.array(*[F.lit(n) for n in cn2])
    cell_scores = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda c: F.struct(
            (
                F.element_at(cn2_lit, c + 1)
                - 2
                * F.aggregate(
                    F.zip_with(
                        F.col("vq"),
                        F.element_at(cents_lit, c + 1),
                        lambda x, cc: x * cc,
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                )
            ).alias("score"),
            (-c).alias("negcell"),
        ),
    )
    with_cell = base.withColumn(
        "cell",
        -F.array_min(cell_scores).getField("negcell"),
    ).withColumn(
        "probed",
        F.slice(
            F.transform(
                F.array_sort(cell_scores),
                lambda s: -s.getField("negcell"),
            ),
            1,
            4,
        ),
    ).withColumn(
        "rvq",
        F.zip_with(
            "vq",
            F.element_at(cents_lit, F.col("cell") + 1),
            lambda x, c: x - c,
        ),
    )
    # materialize the assignment stage: without this, Catalyst INLINES
    # the 16x64-product cell expression into every one of the 128
    # residual-encode lambdas below (the r12 interpreted-HOF pathology
    # squared) — sf0.1 measured 124 s -> ~seconds with the cut
    with_cell = with_cell.localCheckpoint()
    rbooks_lit = F.array(
        *[
            F.struct(
                F.lit(sub).alias("sub"),
                F.array(
                    *[
                        F.struct(
                            F.lit(code).alias("code"),
                            F.array(*[F.lit(x) for x in seg]).alias("cv"),
                            F.lit(n2).alias("n2"),
                        )
                        for code, seg, n2 in rbooks[sub]
                    ]
                ).alias("cw"),
            )
            for sub in range(8)
        ]
    )
    # per-subspace residual encode: argmin (n2r - 2*dot) with ties to
    # the LOWER code — array_min over (score, code) structs
    codes = F.transform(
        rbooks_lit,
        lambda b: F.array_min(
            F.transform(
                b.getField("cw"),
                lambda c: F.struct(
                    (
                        c.getField("n2")
                        - 2
                        * F.aggregate(
                            F.zip_with(
                                F.slice(
                                    "rvq", b.getField("sub") * 8 + 1, 8
                                ),
                                c.getField("cv"),
                                lambda x, cc: x * cc,
                            ),
                            F.lit(0).cast("long"),
                            lambda acc, x: acc + x,
                        )
                    ).alias("score"),
                    c.getField("code").alias("code"),
                ),
            )
        ).getField("code"),
    )
    s2_lit = F.array(
        *[
            F.array(
                *[
                    F.array(
                        *[
                            F.lit(s2[(cell, sub, code)])
                            for code in range(16)
                        ]
                    )
                    for sub in range(8)
                ]
            )
            for cell in range(16)
        ]
    )
    t_n = F.aggregate(
        F.zip_with(
            F.sequence(F.lit(0), F.lit(7)),
            F.col("codes"),
            lambda sub, code: F.element_at(
                F.element_at(
                    F.element_at(s2_lit, F.col("cell") + 1), sub + 1
                ),
                code + 1,
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # second lineage cut: codes feeds t_n (16-deep element_at chains)
    # and the neighbor/query fan-outs below
    encoded = (
        with_cell.withColumn("codes", codes)
        .withColumn("t_n", t_n)
        .localCheckpoint()
    )
    neighbors = encoded.select(
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("cv2"),
        F.col("nrm").alias("cn"),
        "cell",
        F.posexplode("codes").alias("sub", "code"),
        "t_n",
    )
    # query side: S1 through the residual books (the PQ twin's sdots
    # shape), one row per (query, sub, code), plus the probed cells
    queries = encoded.filter(F.col("id").isin(QUERY_IDS))
    qlut = queries.select(
        F.col("id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.explode("probed").alias("pcell"),
        "vq",
    ).select(
        "query_id",
        "qv",
        "qn",
        "pcell",
        F.explode(rbooks_lit).alias("b"),
        "vq",
    ).select(
        "query_id",
        "qv",
        "qn",
        "pcell",
        F.col("b.sub").alias("sub"),
        F.explode("b.cw").alias("c"),
        F.slice("vq", F.col("b.sub") * 8 + 1, 8).alias("svq"),
    ).select(
        "query_id",
        "qv",
        "qn",
        "pcell",
        "sub",
        F.col("c.code").alias("code"),
        F.aggregate(
            F.zip_with("svq", F.col("c.cv"), lambda x, c: x * c),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("s1"),
    )
    adc = (
        neighbors.join(
            F.broadcast(qlut),
            (F.col("cell") == F.col("pcell"))
            & (neighbors.sub == qlut.sub)
            & (neighbors.code == qlut.code),
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(
            (F.sum("s1") - F.min("t_n")).alias("est"),
            F.first("qv").alias("qv"),
            F.first("qn").alias("qn"),
            F.first("cv2").alias("cv2"),
            F.first("cn").alias("cn"),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(F.desc("est"), "neighbor_id")
    cand = adc.withColumn("arnk", F.row_number().over(wa)).filter(
        F.col("arnk") <= 30
    )
    scored = cand.withColumn(
        "sim", dot(F.col("qv"), F.col("cv2")) / (F.col("qn") * F.col("cn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "query_id",
            "neighbor_id",
            F.round("sim", 4).alias("cosine_sim"),
            "rank",
        )
    )


@query(
    "dedup_semantic_portable",
    oracle=f"""
    WITH {_ELEMS},
    qelems AS (
        SELECT vec_id, i,
               CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000)
                    AS BIGINT) AS xq
        FROM idx
    ),
    celems AS (  -- fixed codebook: vec_ids 10..17 are clusters 0..7
        SELECT vec_id - 10 AS cl, i, xq AS cq
        FROM qelems WHERE vec_id BETWEEN 10 AND 17
    ),
    cnorm AS (
        SELECT cl, SUM(cq * cq) AS n2 FROM celems GROUP BY cl
    ),
    dots_c AS (
        SELECT e.vec_id, c.cl, SUM(e.xq * c.cq) AS dp
        FROM qelems e JOIN celems c ON c.i = e.i
        GROUP BY e.vec_id, c.cl
    ),
    scored AS (  -- L2 assignment: argmin |x-c|^2 = argmin n2 - 2*dp
        SELECT d.vec_id, d.cl,
               ROW_NUMBER() OVER (PARTITION BY d.vec_id
                    ORDER BY cn.n2 - 2 * d.dp ASC, d.cl DESC) AS rnk
        FROM dots_c d JOIN cnorm cn ON cn.cl = d.cl
    ),
    assign AS (SELECT vec_id, cl FROM scored WHERE rnk = 1),
    dots AS (  -- pairs WITHIN a cluster only (the SemDeDup bound)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               SUM(ea.x * eb.x) AS dp
        FROM assign a
        JOIN assign b ON b.cl = a.cl AND b.vec_id > a.vec_id
        JOIN elems ea ON ea.vec_id = a.vec_id
        JOIN elems eb ON eb.vec_id = b.vec_id AND eb.i = ea.i
        GROUP BY a.vec_id, b.vec_id
    ),
    pairs AS (
        SELECT vec_a, vec_b FROM dots
        JOIN norms na ON na.vec_id = vec_a
        JOIN norms nb ON nb.vec_id = vec_b
        WHERE dp / (na.nrm * nb.nrm) >= 0.35
    )
    SELECT a.vec_id, CAST(a.cl AS INT) AS cluster,
           COALESCE(MIN(p.vec_a), a.vec_id) AS canonical_id,
           MIN(p.vec_a) IS NOT NULL AS is_duplicate
    FROM assign a LEFT JOIN pairs p ON p.vec_b = a.vec_id
    GROUP BY a.vec_id, a.cl
    """,
)
def dedup_semantic_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup, every primitive portable (r14):
    cluster the embeddings, then canonicalize near-duplicates WITHIN
    each cluster only — the construction that makes embedding dedup
    tractable at 100 TB, where ``dedup_embedding_cosine``'s exact
    all-pairs baseline is O(n²). The codebook is FIXED (vec_ids 10..17
    are clusters 0..7), assignment is integer-quantized L2 (argmin
    |x−c|² = argmin n2−2·dp, ties to the higher cluster — the same
    arithmetic the IVF portable twin pins), and within-cluster pairs
    canonicalize by smallest near-duplicate id (cos ≥ 0.35, the
    fixture-tuned threshold dedup_embedding_cosine uses), so the hash
    compare proves assignment + cluster-bounded pairing + keep/drop
    end to end. Cross-cluster near-dups are deliberately NOT found —
    SemDeDup's recall trade for the per-cluster c² bound (at scale:
    pair work is Σ cᵢ², bounded by sizing K so clusters stay small;
    the pair join is equi on cluster id, never cartesian).

    Scale shape: assignment is one projection over a broadcast 8-row
    codebook + a per-id argmin window; pair generation shuffles once
    on cluster id; canonicalization is a groupBy-min + left join —
    the production variant swaps the fixed codebook for k-means
    centroids (similarity/ivf.py) with identical downstream plan."""
    from pyspark.sql import Window

    from philotes_spark.similarity.knn import dot

    emb = load_table_parallel(spark, sf_dir, "embeddings", "vec_id")
    v = as_double(F.col("embedding"))
    vq = F.transform(v, lambda x: F.round(x * 1000000).cast("long"))
    base = emb.select(
        F.col("vec_id").alias("id"),
        v.alias("v"),
        vq.alias("vq"),
        l2_norm(v).alias("nrm"),
    )
    # bounded driver collect (8 rows): the fixed codebook, quantized
    crows = (
        base.filter((F.col("id") >= 10) & (F.col("id") <= 17))
        .select("id", "vq")
        .collect()
    )
    cents = sorted((int(r.id) - 10, [int(x) for x in r.vq]) for r in crows)
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(cl).alias("cl"),
                F.array(*[F.lit(x) for x in cv]).alias("cv"),
                F.lit(sum(x * x for x in cv)).alias("n2"),
            )
            for cl, cv in cents
        ]
    )
    per = base.select(
        "id", "v", "nrm", "vq", F.explode(cent_arr).alias("c")
    ).select(
        "id",
        "v",
        "nrm",
        F.col("c.cl").alias("cluster"),
        (
            F.col("c.n2")
            - 2
            * F.aggregate(
                F.zip_with(F.col("vq"), F.col("c.cv"), lambda x, c: x * c),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
        ).alias("score"),
    )
    wc = Window.partitionBy("id").orderBy(F.asc("score"), F.desc("cluster"))
    assign = (
        per.select(
            "id", "v", "nrm", "cluster", F.row_number().over(wc).alias("rnk")
        )
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )
    a = assign.select(
        F.col("id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
        "cluster",
    )
    b = assign.select(
        F.col("id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
        "cluster",
    )
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("vec_b") > F.col("vec_a"))
        .filter(
            dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            >= 0.35
        )
        .select("vec_a", "vec_b")
    )
    canon = pairs.groupBy(F.col("vec_b").alias("vec_id")).agg(
        F.min("vec_a").alias("min_dup")
    )
    return (
        assign.select(F.col("id").alias("vec_id"), "cluster")
        .join(canon, "vec_id", "left_outer")
        .select(
            "vec_id",
            F.col("cluster").cast("int").alias("cluster"),
            F.coalesce(F.col("min_dup"), F.col("vec_id")).alias(
                "canonical_id"
            ),
            F.col("min_dup").isNotNull().alias("is_duplicate"),
        )
    )
