#!/usr/bin/env python
"""Generate larger scale-factor fixtures by key-consistent replication
of /root/testdata/sf0.1 (VERDICT r04 #3: demonstrate the 2x cold gate at
a scale where the per-action floor amortizes).

Each copy i shifts EVERY entity key (customer/supplier/part/order/
event/user/doc/vec) by i * STRIDE, so foreign keys stay consistent —
join fan-outs, group cardinalities, and selectivities scale linearly the
way a real bigger dataset's would. The fixed dims (region, nation) are
copied verbatim; their keys are never shifted, so each replica
references the same 25 nations, exactly like TPC-H at any SF.
Timestamps are left untouched: replicas overlay the same time window
("more traffic in the same period"), keeping date-filter selectivities
identical across SFs.

Document text is SALTED per replica (VERDICT r05 #3): replica 0 keeps
the original text verbatim; replica i > 0 suffixes every alphanumeric
token with "ri" (regexp, whitespace/punctuation untouched), so tokens
from different replicas never collide. Without this, every doc at sfN
has N-1 exact copies and the dedup/n-gram tier measures an artificially
duplicate-heavy corpus. With it, exact/near-dup structure WITHIN each
replica is isomorphic to sf0.1's (same salt applied to all docs of a
replica), cross-replica Jaccard/MinHash similarity is ~0, and token
count per document is unchanged (lengths shift by the suffix — the one
documented deviation from the base length distribution).

Output dirs mirror the driver layout (<out>/sfX/{table}.parquet) and are
gitignored — they are derived artifacts, ~17 MB per 0.1 SF.

Usage: python tools/make_scaled_fixtures.py [--factor 10 --name sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"
OUT_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".fixtures")
STRIDE = 10_000_000  # all sf0.1 keys are < 10M, so copies never collide

# key columns to shift per table (everything else replicates verbatim)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
VERBATIM = ["region", "nation"]


def generate(factor: int, name: str) -> str:
    out_dir = os.path.join(OUT_ROOT, name)
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in VERBATIM:
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out_dir}/{t}.parquet'"
            f" (FORMAT PARQUET, COMPRESSION SNAPPY)"
        )
    for t, keys in KEYED.items():
        replace = ", ".join(f"{k} + c.i * {STRIDE} AS {k}" for k in keys)
        if t == "documents":
            # salt replica text so the dedup/text tier sees a realistic
            # (non-cloned) corpus at higher SFs; replica 0 stays verbatim
            replace += (
                ", regexp_replace(text, '([A-Za-z0-9]+)', "
                "'\\1' || CASE WHEN c.i = 0 THEN '' "
                "ELSE 'r' || CAST(c.i AS VARCHAR) END, 'g') AS text"
            )
        con.sql(
            f"COPY (SELECT t.* REPLACE ({replace}) FROM '{SRC}/{t}.parquet' t, "
            f"(SELECT UNNEST(generate_series(0, {factor - 1})) AS i) c) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET, COMPRESSION SNAPPY)"
        )
    con.close()
    return out_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10, help="replication factor vs sf0.1")
    ap.add_argument("--name", default=None, help="output dir name (default sf{factor/10})")
    args = ap.parse_args()
    name = args.name or f"sf{args.factor / 10:g}"
    out = generate(args.factor, name)
    for f in sorted(os.listdir(out)):
        print(f"{out}/{f}: {os.path.getsize(os.path.join(out, f)):,} bytes")


if __name__ == "__main__":
    main()
