"""The sweep-combining methodology (tools/combine_sweeps.py, re-worked
r16 per VERDICT r15 what's-missing #4): spark and oracle totals pair
WITHIN a run, the headline is the min-over-runs PAIRED ratio, and
adding runs can only improve the reading — the old independent
per-side MIN could manufacture a ratio no actual run produced (the
committed SWEEP_r15 sf0.1 read 2.53× while every per-run paired ratio
was 1.99–2.99)."""

from __future__ import annotations

import json
import subprocess
import sys


def _run(tmp_path, runs):
    paths = []
    for i, rows in enumerate(runs):
        p = tmp_path / f"run{i}.json"
        p.write_text(json.dumps({"reps": 3, "rows": rows, "sf": "sweep"}))
        paths.append(str(p))
    out = tmp_path / "combined.json"
    subprocess.run(
        [sys.executable, "tools/combine_sweeps.py", str(out), *paths],
        check=True,
        cwd="/root/repo",
        capture_output=True,
    )
    return json.loads(out.read_text())


def _row(sf, spark, oracle, n=25):
    return {"sf": sf, "spark_total": spark, "oracle_total": oracle,
            "n_timed": n}


def test_headline_is_paired_within_run_not_cross_run_min(tmp_path):
    # the r15 failure shape: run A is slower on spark but its oracle
    # ran slow too (paired 2.0); run B's spark is fastest but its
    # oracle was even faster (paired 2.67). The old scheme took
    # min-spark (8) over min-oracle (3) = 2.67 — WORSE than run A's
    # own paired reading, despite run B being added as extra evidence.
    art = _run(
        tmp_path,
        [
            [_row("sf0.1", 10.0, 5.0)],
            [_row("sf0.1", 8.0, 3.0)],
        ],
    )
    row = art["rows"][0]
    assert row["ratio"] == 2.0, row
    assert row["ratio_run"] == "runA", row
    assert row["spark_total"] == 10.0 and row["oracle_total"] == 5.0
    assert row["ratios_all"] == [2.0, 2.67], row


def test_adding_runs_never_worsens_the_headline(tmp_path):
    base = [[_row("sf0.1", 10.0, 5.0)], [_row("sf0.1", 8.0, 3.0)]]
    before = _run(tmp_path, base)["rows"][0]["ratio"]
    worse_extra = base + [[_row("sf0.1", 12.0, 3.5)]]  # paired 3.43
    after = _run(tmp_path, worse_extra)["rows"][0]["ratio"]
    assert after <= before, (before, after)
    assert after == 2.0


def test_mixed_rosters_refused(tmp_path):
    import pytest

    with pytest.raises(subprocess.CalledProcessError):
        _run(
            tmp_path,
            [[_row("sf0.1", 10.0, 5.0, n=25)],
             [_row("sf0.1", 8.0, 3.0, n=26)]],
        )


def test_floor_adjustment_uses_headline_rows(tmp_path):
    art = _run(
        tmp_path,
        [
            [_row("sf0.001", 4.0, 0.3), _row("sf0.1", 10.0, 5.0)],
            [_row("sf0.001", 5.0, 0.3), _row("sf0.1", 8.0, 3.0)],
        ],
    )
    assert art["floor_spark_sf0001"] == 4.0
    # (10 - 4) / 5 from the headline sf0.1 row (run A, paired 2.0)
    assert art["floor_adjusted_ratio_sf01"] == 1.2
    # the method string carries every raw paired reading for audit
    assert "runA 10.0/5.0=2.0" in art["method"]
    assert "runB 8.0/3.0=2.67" in art["method"]


def test_floor_is_min_over_runs_not_the_min_ratio_rows_total(tmp_path):
    """r16 fix: a steal-inflated run can win the sf0.001 HEADLINE row
    (its oracle was inflated too, so its RATIO is lowest) while its
    spark total exceeds every larger-SF total — the old floor (that
    row's total) then clamped every floor_adjusted ratio to 0.0. The
    floor must be the MIN sf0.001 spark total over runs: load only ever
    inflates per-action overhead."""
    art = _run(
        tmp_path,
        [
            # run A: clean. sf0.001 total 4.0, ratio 4/0.4 = 10.0
            [_row("sf0.001", 4.0, 0.4), _row("sf0.1", 10.0, 5.0)],
            # run B: steal-inflated BOTH sides at sf0.001 — ratio 8.75
            # wins the headline row, but 21.0 is not a floor estimate
            [_row("sf0.001", 21.0, 2.4), _row("sf0.1", 11.0, 5.0)],
        ],
    )
    assert art["rows"][0]["ratio_run"] == "runB"  # inflated row wins ratio
    assert art["floor_spark_sf0001"] == 4.0  # ...but the floor is run A's
    # (10 - 4) / 5, not max(10 - 21, 0)/5 = 0.0
    assert art["floor_adjusted_ratio_sf01"] == 1.2
