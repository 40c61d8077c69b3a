"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` / ``oracle_sql()`` — the full registered operator surface
from SURVEY.md §2 (+ §2C LLM-pipeline ops), backed by
``philotes_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from philotes_spark import registry

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the CDC current-state
    materialization (normalize → dedup-to-latest → drop deletes) — the
    reference's single most load-bearing query (sample-queries.sql:94-102).
    """
    return registry.QUERIES["cdc_latest_state"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2C, in
    coverage-priority order (core §2 + §2C first, TPC-H extras last) —
    the driver checks a bounded prefix of this dict."""
    return {n: registry.QUERIES[n] for n in registry.ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for every SQL-expressible query;
    hash-family and LSH ops are intentionally absent (rows-only check)."""
    return {
        n: registry.ORACLES[n]
        for n in registry.ordered_names()
        if n in registry.ORACLES
    }
