#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set = one representative per operator family (scan/agg, joins,
top-N, window, CDC, dedup, similarity, text) — the queries a user of the
reference would actually run, weighted toward shuffle/join-heavy plans so
regressions at scale show up here first.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from philotes_spark import registry
    from philotes_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="philotes_bench")

    headline = [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q6_forecast_revenue",
        "q8_market_share",
        "q10_returned_items",
        "q13_customer_distribution",
        "q18_large_orders",
        "b7_daily_rollup",
        "b8_top_n",
        "b9_running_total",
        "b10_latest_by_key",
        "b13_join_agg_segment",
        "cdc_latest_state",
        "cdc_op_rollup",
        "stream_tumbling_counts",
        "dedup_exact",
        "dedup_minhash_lsh",
        "sim_cosine_topk",
        "sim_ivf_topk",
        "text_quality_stats",
        "token_counts_by_source",
        "doc_fingerprint",
    ]

    # warm the JVM/codegen paths once so timings measure the queries,
    # not first-call classloading
    registry.QUERIES["b3_count_star"](spark, sf_dir).collect()

    # Best-of-N per query: this host shows CPU-steal spikes that can
    # inflate a single measurement 5-20x (measured: the same deterministic
    # query at 0.8s and 47s minutes apart, idle machine both times); the
    # minimum measures the engine, not the neighbor VMs.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    for name in headline:
        fn = registry.QUERIES[name]
        best, rows = float("inf"), 0
        for _ in range(reps):
            t0 = time.perf_counter()
            # materialize fully (driver does .collect(); mirror that cost)
            rows = len(fn(spark, sf_dir).collect())
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({rows} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
