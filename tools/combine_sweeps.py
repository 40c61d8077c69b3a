"""Combine N raw SWEEP.json runs into the round's SWEEP_r{N}.json.

Protocol (PERF.md, VERDICT r10/r11 #7): per-SF spark totals take the
MIN across the final-code runs; the oracle side is identical SQL in
every run, so its per-SF MIN is taken across ALL provided runs; every
raw total is recorded in ``method`` so the pairing is auditable from
the artifact alone. per_query (and the floor keys) come from the run
whose sf0.1 spark total is smallest.

Usage: python tools/combine_sweeps.py OUT.json runA.json runB.json ...
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, *run_paths = sys.argv[1:]
    runs = []
    for p in run_paths:
        with open(p) as fh:
            runs.append(json.load(fh))

    by_sf: dict[str, dict] = {}
    raw_lines = []
    for i, art in enumerate(runs):
        for row in art.get("rows", []):
            sf = row["sf"]
            cur = by_sf.setdefault(
                sf, {"sf": sf, "spark_total": None, "oracle_total": None}
            )
            # roster size rides along (r13: a composition change must
            # never read as a performance drift) — and MIXED rosters
            # must never be min-paired silently, that is the exact
            # failure this field exists to expose
            if row.get("n_timed") is not None:
                prior = cur.get("n_timed")
                if prior is not None and prior != row["n_timed"]:
                    raise SystemExit(
                        f"refusing to combine: {sf} rosters differ "
                        f"({prior} vs {row['n_timed']} timed queries) — "
                        "per-SF MIN across different rosters is not a "
                        "comparable reading"
                    )
                cur["n_timed"] = row["n_timed"]
            for key in ("spark_total", "oracle_total"):
                v = row.get(key)
                if v is not None and (
                    cur[key] is None or v < cur[key]
                ):
                    cur[key] = v
    for sf in sorted(by_sf, key=lambda s: float(s[2:])):
        pieces = []
        for i, art in enumerate(runs):
            row = next(
                (r for r in art.get("rows", []) if r["sf"] == sf), None
            )
            if row:
                pieces.append(
                    f"run{chr(65 + i)} {row['spark_total']}/"
                    f"{row['oracle_total']}"
                )
        raw_lines.append(f"{sf} " + " ".join(pieces))

    rows = []
    for sf in sorted(by_sf, key=lambda s: float(s[2:])):
        r = by_sf[sf]
        r["ratio"] = (
            round(r["spark_total"] / r["oracle_total"], 2)
            if r["oracle_total"]
            else None
        )
        rows.append(r)

    # per_query from the run with the smallest sf0.1 spark total
    def sf01_total(art):
        row = next(
            (r for r in art.get("rows", []) if r["sf"] == "sf0.1"), None
        )
        return row["spark_total"] if row else float("inf")

    best = min(runs, key=sf01_total)
    base = dict(best)
    base.update(
        {
            "metric": "scale_sweep_cold_totals",
            "n_runs": len(runs),
            "rows": rows,
            "method": (
                f"{len(runs)} full sweep runs of the round's FINAL code "
                "(best-of-%d cold per query per engine per run); spark "
                "and oracle totals take the per-SF MIN across the runs "
                "(identical SQL on the oracle side every run, so its "
                "min is always valid; using the fastest oracle keeps "
                "every ratio conservative). per_query carries the "
                "per-query seconds and Spark job counts of the run "
                "with the smallest sf0.1 spark total. Raw run totals "
                "(spark/oracle s): " % best.get("reps", 3)
            )
            + "; ".join(raw_lines)
            + ". floor_* keys decompose the totals: the sf0.001 spark "
            "total executes the same ~90 jobs over ~zero data, so it "
            "is the roster's per-action scheduling floor on this "
            "host; floor_adjusted_ratio_sfX = (spark_sfX - floor) / "
            "oracle_sfX is the data-time ratio.",
        }
    )
    by_sf2 = {r["sf"]: r for r in rows}
    floor = by_sf2.get("sf0.001")
    if floor:
        base["floor_spark_sf0001"] = floor["spark_total"]
        for sf, r in by_sf2.items():
            if sf == "sf0.001" or not r["oracle_total"]:
                continue
            base[f"floor_adjusted_ratio_{sf.replace('.', '')}"] = round(
                max(r["spark_total"] - floor["spark_total"], 0.0)
                / r["oracle_total"],
                2,
            )
    with open(out_path, "w") as fh:
        json.dump(base, fh, indent=1)
    print(f"wrote {out_path}: " + "; ".join(raw_lines))


if __name__ == "__main__":
    main()
