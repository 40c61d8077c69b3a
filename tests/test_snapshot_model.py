"""Randomized model-based check of the whole snapshot layer: a seeded
sequence of append / merge / overwrite / compact operations is mirrored
on a pure-Python dict model, then EVERY version's ``read()`` must equal
the model's state at that version and EVERY adjacent-version
``read_changes`` must equal the model's keyed diff — one test that
cross-checks commit, merge (upsert+delete, stats-pruned CoW), compaction
row-identity, time travel, and both changelog paths against an
independent oracle, under operation interleavings no hand-written case
covers.
"""

import random

import pytest
from pyspark.sql import functions as F  # noqa: F401  (parity with suite style)

from philotes_spark.sources.snapshots import SnapshotTable

# model-based property sweep — slow-tail layer, excluded from the
# default driver-gate profile (pytest.ini), run explicitly with -m slow
pytestmark = pytest.mark.slow

SCHEMA = "k long, v long"


def _df(spark, rows: dict[int, int]):
    return spark.createDataFrame(sorted(rows.items()), SCHEMA)


@pytest.mark.parametrize("seed", [11, 47])
def test_random_op_sequence_agrees_with_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    tbl = SnapshotTable(spark, str(tmp_path / f"model{seed}"))
    states: list[dict[int, int]] = [{}]  # states[v] = table contents at v
    ops: list[str] = ["-"]
    next_k = 0

    def fresh(n):
        nonlocal next_k
        rows = {next_k + i: rng.randrange(1000) for i in range(n)}
        next_k += n
        return rows

    for _ in range(12):
        cur = dict(states[-1])
        roll = rng.random()
        if not cur or roll < 0.40:
            rows = fresh(rng.randrange(2, 6))
            tbl.commit(_df(spark, rows), stats_cols=["k"])
            cur.update(rows)
            states.append(cur)
            ops.append("append")
        elif roll < 0.70:
            mode = "mor" if rng.random() < 0.5 else "cow"
            if mode == "cow" and tbl._resolve().get("deltas"):
                tbl.compact_deltas()  # CoW refuses over pending deltas
                states.append(dict(cur))
                ops.append("compact-deltas")
            keys = sorted(cur)
            upd_keys = rng.sample(keys, min(3, len(keys)))
            del_pool = [k for k in keys if k not in upd_keys]
            del_keys = rng.sample(del_pool, min(2, max(len(del_pool) - 1, 0)))
            ins = fresh(1)
            changes = (
                [(k, rng.randrange(1000, 2000), False) for k in upd_keys]
                + [(k, cur[k], True) for k in del_keys]
                + [(k, v, False) for k, v in ins.items()]
            )
            tbl.merge(
                spark.createDataFrame(changes, "k long, v long, _del boolean"),
                key_cols=["k"],
                delete_col="_del",
                mode=mode,
            )
            for k, v, dele in changes:
                if dele:
                    cur.pop(k, None)
                else:
                    cur[k] = v
            states.append(cur)
            ops.append(f"merge-{mode}")
        elif roll < 0.85:
            got = tbl.compact(small_file_bytes=1 << 30)
            if got is not None:  # no version when nothing to compact
                states.append(cur)
                ops.append("compact")
        else:
            rows = fresh(rng.randrange(2, 5))
            tbl.commit(_df(spark, rows), operation="overwrite", stats_cols=["k"])
            states.append(rows)
            ops.append("overwrite")

    assert tbl.current_version() == len(states) - 1, ops

    # every version's read equals the model state at that version
    for v in range(1, len(states)):
        if not states[v]:
            continue
        got = {r.k: r.v for r in tbl.read(version=v).collect()}
        assert got == states[v], f"v{v} ({ops[v]}): state diverged"

    # every adjacent changelog equals the model's keyed diff (compact
    # versions must diff to empty: row-identical rewrites)
    for v in range(2, len(states)):
        old, new = states[v - 1], states[v]
        want = (
            {(k, "insert") for k in new.keys() - old.keys()}
            | {(k, "delete") for k in old.keys() - new.keys()}
            | {
                (k, "update")
                for k in old.keys() & new.keys()
                if old[k] != new[k]
            }
        )
        ch = tbl.read_changes(v - 1, v, key_cols=["k"])
        got = {(r.k, r.change_type) for r in ch.collect()}
        assert got == want, f"v{v-1}->v{v} ({ops[v]}): changelog diverged"
