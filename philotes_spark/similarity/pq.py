"""Product quantization (PQ) ANN — the compressed-domain scale tier
beyond int8 (SURVEY §2C similarity family; the FAISS ``PQx`` scheme,
Jégou et al. 2011, "Product Quantization for Nearest Neighbor Search").

Where int8 shrinks the corpus 4-8× and still touches every float, PQ
stores each vector as ``m`` sub-codes (here 8 × 4 bits-worth = 8 small
ints ≈ 8 bytes vs 256 for float32×64): the unit vector is split into
``m`` subspaces, each encoded as its nearest per-subspace codeword. A
query never decodes the corpus — it precomputes a lookup table
LUT[j][c] = <q_sub_j, codebook[j][c]> (an ``m × ks`` projection on the
TINY query side) and scores a corpus row by summing ``m`` table lookups
over its codes (asymmetric distance computation, ADC). Since both sides
are unit-normalized, the ADC sum estimates the true cosine.

Plan shape at 100 TB:
  train:  per-subspace k-means on a BOUNDED driver-side sample (numpy),
          exactly like IVF centroid training — never a corpus scan;
  encode: one corpus projection (codes column), built once and reusable
          across query batches — the index build;
  query:  broadcast the LUT rows (queries × m × ks doubles — metadata
          sized) against one scan of the CODES column only; the float
          corpus is never read at query time. No shuffle except the
          final per-query top-k window over candidate rows.

Recall tunes with m/ks (code length), not data scanned; pytest pins
recall vs the exact tier and vs a random baseline, and the exact-re-rank
variant's recall above raw ADC.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from philotes_spark.similarity.knn import as_double, dot, l2_norm


def train_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    ks: int = 16,
    vec_col: str = "embedding",
    sample_size: int = 4096,
    n_iter: int = 10,
    seed: int = 42,
) -> list[list[list[float]]]:
    """Per-subspace k-means codebooks (m × ks × d/m) trained on a bounded
    unit-normalized sample — the same driver-side training budget as IVF
    (similarity/ivf.py train_centroids): O(sample) at any corpus size."""
    import numpy as np

    rows = (
        emb.select(as_double(F.col(vec_col)).alias("v"))
        .limit(sample_size)
        .collect()
    )
    x = np.asarray([r.v for r in rows], dtype=np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.RandomState(seed)
    books: list[list[list[float]]] = []
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        c = xs[rng.choice(len(xs), size=min(ks, len(xs)), replace=False)].copy()
        for _ in range(n_iter):
            # L2 assignment (k-means objective; ADC then sums dot products
            # of the reconstruction — the standard PQ pairing)
            d2 = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for ci in range(len(c)):
                members = xs[assign == ci]
                if len(members):
                    c[ci] = members.mean(axis=0)
        books.append(c.tolist())
    return books


def _books_lit(books: list[list[list[float]]]) -> Column:
    # one 3-level Literal node (m × ks × sub) — same reasoning as IVF's
    # _centroid_lit: array(array(array(lit))) AST explosion dominates
    # codegen time
    return F.lit([[[float(w) for w in c] for c in b] for b in books])


def encode_pq(
    emb: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int> of length m): each subspace of the unit
    vector encoded as its L2-nearest codeword — a pure projection (the
    PQ index build; persist the result to amortize across query
    batches)."""
    m, sub = len(books), len(books[0][0])
    v = as_double(F.col(vec_col))
    base = emb.select(
        F.col(id_col).alias("id"), v.alias("v"), l2_norm(v).alias("nrm")
    )
    unit = F.transform(F.col("v"), lambda x: x / F.col("nrm"))
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.slice(unit, j * sub + 1, sub),
    )
    # argmin per subspace = array_position(dists, array_min(dists)) over
    # the per-codeword squared-L2 array
    dists = F.zip_with(
        subs,
        _books_lit(books),
        lambda s, book: F.transform(
            book,
            lambda c: F.aggregate(
                F.zip_with(s, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, e: acc + e,
            ),
        ),
    )
    codes = F.transform(
        dists, lambda dv: (F.array_position(dv, F.array_min(dv)) - 1).cast("int")
    )
    return base.select("id", codes.alias("codes"))


def pq_topk(
    emb: DataFrame,
    query_ids: list[int],
    books: list[list[list[float]]],
    k: int = 10,
    rerank: int | None = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k: (query_id, neighbor_id, est_cosine/cosine_sim, rank).
    With ``rerank`` set, the top-``rerank`` ADC candidates per query are
    re-scored with exact cosine (reads the float vectors for candidates
    only — the standard PQ + re-rank serving stack) and the top-``k`` of
    those returned with exact similarities."""
    m, sub = len(books), len(books[0][0])
    if codes is None:
        codes = encode_pq(emb, books, id_col=id_col, vec_col=vec_col)
    v = as_double(F.col(vec_col))
    qbase = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), v.alias("qv"))
        .withColumn("qn", l2_norm(F.col("qv")))
    )
    qunit = F.transform(F.col("qv"), lambda x: x / F.col("qn"))
    qsubs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.slice(qunit, j * sub + 1, sub),
    )
    lut = F.zip_with(
        qsubs,
        _books_lit(books),
        lambda s, book: F.transform(book, lambda c: dot(s, c)),
    )
    q = qbase.select("query_id", "qv", "qn", lut.alias("lut"))
    est = F.aggregate(
        F.zip_with(
            F.col("codes"), F.col("lut"), lambda cj, row: F.element_at(row, cj + 1)
        ),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    scored = (
        codes.join(F.broadcast(q), F.col("id") != F.col("query_id"))
        .withColumn("est", est)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("est"), "id")
    if rerank is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                F.col("id").alias("neighbor_id"),
                F.round("est", 4).alias("est_cosine"),
                "rank",
            )
        )
    cand = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= rerank)
        .select("query_id", "qv", "qn", F.col("id").alias("neighbor_id"))
    )
    cvec = emb.select(
        F.col(id_col).alias("neighbor_id"),
        v.alias("cv"),
        l2_norm(v).alias("cn"),
    )
    exact = cand.join(cvec, "neighbor_id").withColumn(
        "sim", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("sim", 4).alias("cosine_sim"),
            "rank",
        )
    )
