"""philotes_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference CDC→data-lake platform
(janovincze/philotes), re-expressed Spark-first.

Layout
------
- ``session``    : tuned SparkSession factory (AQE, pushdown, UTC).
- ``types``      : PG→Spark type mapping + reference-compat casts (SURVEY §1.3).
- ``sources``    : catalog/view registration over parquet test fixtures,
                   lake writer (partitioned, schema-merge).
- ``operators``  : CDC dataflow operators (normalize, latest-view, history,
                   buffer stats) and the relational §2B surface.
- ``functions``  : text-analysis and vector column functions (JVM-side
                   ``pyspark.sql.functions`` compositions — no Python UDFs
                   in the hot path).
- ``dedup``      : exact + near-duplicate detection (minhash-LSH, simhash,
                   n-gram jaccard, embedding cosine).
- ``similarity`` : brute-force + LSH-bucketed approximate nearest neighbors.
- ``multimodal`` : binary-column plumbing (decode stubs behind flags).
- ``streaming``  : Structured Streaming ingest pipeline, reliability layer
                   (quarantine/DLQ, checkpointing, metrics listener).
- ``registry``   : query registry mapping names → (spark impl, oracle SQL);
                   consumed by ``__spark_entry__`` and ``bench.py``.
"""

__version__ = "0.1.0"
