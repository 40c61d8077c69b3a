"""Dump ``explain("formatted")`` for registered queries to files.

Usage:
    python tools/explain_dump.py OUTDIR SUFFIX [--sf DIR] [--only n1,n2|--headline|--all]

Writes OUTDIR/<query>_<SUFFIX>.txt per query (plan build only — nothing
executes). The optimization rounds commit these as plans/r16/*_before.txt
/ *_after.txt evidence.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    args = sys.argv[1:]
    outdir, suffix = args[0], args[1]

    def opt(name: str, default: str) -> str:
        return args[args.index(name) + 1] if name in args else default

    sf_dir = opt("--sf", "/root/testdata/sf0.1")
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    sys.path.insert(0, repo)

    import bench

    from philotes_spark import registry
    from philotes_spark.session import get_spark

    registry.load_all()
    if "--all" in args:
        names = registry.ordered_names()
    elif "--only" in args:
        names = opt("--only", "").split(",")
    else:
        names = list(bench.HEADLINE)

    spark = get_spark(app_name="explain_dump")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            # __wrapped__ bypasses the prepared-query cache so the dump is
            # the static pre-execution plan, same as the plan audits
            fn = registry.QUERIES[name].__wrapped__
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - record the failure inline
            txt = f"EXPLAIN FAILED: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(f"-- {name} @ {sf_dir}\n{txt}")
        print(f"# wrote {name}", file=sys.stderr)


if __name__ == "__main__":
    main()
