"""SparkSession factory tuned for both local testing and 100 TB-scale jobs.

Every knob here is chosen for the *cluster* plan first; the local overrides
(shuffle partitions ≈ cores) are applied only in ``local[...]`` mode.

Scale rationale (SURVEY §4, pyspark guide):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
  dynamic join-strategy switches replace most hand-tuning at 100 TB.
- ``spark.sql.shuffle.partitions`` — on a real cluster you want O(2-3× total
  cores); AQE coalesces down, so err high. Locally we match the core count.
- Arrow enabled: every pandas_udf / mapInPandas boundary is Arrow-batched.
- UTC session timezone: parquet timestamps are naive; pinning UTC keeps
  results identical to the DuckDB oracle and to any other engine.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "philotes_spark",
    master: str | None = None,
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    On a real cluster, pass ``master=None`` and let spark-submit supply the
    master; the AQE/pushdown settings below are scale-safe as-is.
    """
    cpus = cpus or DEFAULT_CPUS
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- adaptive execution: the 100 TB workhorse ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing ---
        .config("spark.sql.shuffle.partitions", str(max(cpus, 32)))
        # 128 MB input splits: matches the reference's parquet row-group
        # target (internal/iceberg/writer/parquet.go:84) and keeps one task
        # per row group at scale.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # --- correctness / comparability ---
        .config("spark.sql.session.timeZone", "UTC")
        # fixture events.parquet carries TIMESTAMP(NANOS) which Spark has
        # no native type for; read as long and convert in the catalog
        # (sources/catalog.py) — same µs truncation DuckDB applies.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # standard TIMESTAMP_MICROS instead of legacy INT96: INT96 writes
        # NO parquet min/max statistics, which silently disables both
        # row-group skipping and the snapshot manifests' ts footer stats
        # (file-level scan planning on time predicates — a first-order
        # scan-cost lever on any time-series table at 100 TB). INT96 is
        # deprecated in the parquet spec; every modern reader (DuckDB,
        # Trino, Iceberg) expects MICROS.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # --- python boundary ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # --- scheduling latency ---
        # No data locality exists for this engine's storage (local files in
        # one JVM here; S3/object storage on a cluster, where every task is
        # equally "remote") — waiting up to 3 s per locality level for a
        # better-placed executor only adds scheduler latency. 0 dispatches
        # tasks to the first free slot.
        .config("spark.locality.wait", "0s")
        # --- local-mode niceties (harmless on a cluster) ---
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
