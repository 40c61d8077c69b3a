"""CALL rewrite_manifests — VERDICT r15 what's-missing #5.

The engine keeps one internal manifest per commit; every provenance
consumer (``$entries``, delete-file sequence scoping, the external
Avro export's EXISTING-entry rule) walks that chain oldest→current —
O(commits) driver-side JSON loads per call, unbounded between
expirations. ``rewrite_manifests`` is the Iceberg maintenance
procedure shaped for this engine: a metadata-only commit storing the
folded provenance checkpoint, after which the walk is O(commits since
the fold). These tests pin: byte-identical reads through the internal
AND published-Avro chains, identical ``$entries`` provenance, the
bounded walk, idempotence, and composition with MoR deltas and
later appends.
"""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from philotes_spark.sources.snapshots import SnapshotTable
from philotes_spark.sql_frontend import sql as sql_stmt


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(spark, str(tmp_path / "t"))


def _df(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            (F.col("id") * 2).alias("v"),
        )
        .repartition(2)
    )


def _rows(table, version=None):
    return sorted(
        (r.k, r.g, r.v) for r in table.read(version=version).collect()
    )


def _entries(table):
    return sorted(
        (r.status, r.snapshot_id, r.sequence_number, r.file_path)
        for r in table.entries().collect()
    )


def test_fold_preserves_reads_entries_and_provenance(spark, table):
    from philotes_spark.sources.iceberg_manifest import file_provenance

    table.commit(_df(spark, 0, 100))
    table.commit(_df(spark, 100, 200))
    table.delete_where("k < 20", key_cols=["k"])  # CoW delete
    table.commit(_df(spark, 200, 300))
    before_rows = _rows(table)
    before_prov = file_provenance(table, table.current_version())
    v0 = table.current_version()

    v1 = table.rewrite_manifests()
    assert v1 == v0 + 1
    m = table._load(f"v{v1:08d}.json")
    assert m["operation"] == "rewrite-manifests"
    assert m["added_files"] == 0 and m["added_rows"] == 0
    assert sorted(m["files"]) == sorted(
        table._resolve(version=v0)["files"]
    ), "metadata-only: the data file set is untouched"
    assert _rows(table) == before_rows
    # provenance THROUGH the fold equals the walked truth, file by file
    after_prov = file_provenance(table, v1)
    assert after_prov[0] == before_prov[0]
    # $entries keeps the ORIGINAL adding versions (no re-attribution
    # to the fold version)
    ent = _entries(table)
    assert all(sid <= v0 for _s, sid, _q, _f in ent if _s != 2)


def test_walk_is_bounded_after_fold(spark, table, monkeypatch):
    """The scaling property: after the fold, file_provenance loads
    O(commits since the fold) manifests, not the whole chain."""
    from philotes_spark.sources.iceberg_manifest import file_provenance

    for i in range(8):
        table.commit(_df(spark, i * 50, (i + 1) * 50))
    table.rewrite_manifests()
    table.commit(_df(spark, 400, 450))  # one commit past the fold

    loads = []
    orig = SnapshotTable._resolve

    def spy(self, version=None):
        loads.append(version)
        return orig(self, version=version)

    monkeypatch.setattr(SnapshotTable, "_resolve", spy)
    added, _ = file_provenance(table, table.current_version())
    # current (v10) + the fold (v9): the eight pre-fold manifests are
    # never opened
    assert len(loads) == 2, loads
    # and the attributions are still the ORIGINAL adding versions
    assert sorted(set(added.values())) == list(range(1, 9)) + [10]


def test_idempotent_and_sql_surface(spark, table):
    table.commit(_df(spark, 0, 100))
    out = sql_stmt(
        spark, "CALL rewrite_manifests('t')", {"t": table}
    ).collect()[0]
    assert out.operation == "rewrite_manifests"
    v = table.current_version()
    assert table._load(f"v{v:08d}.json")["operation"] == "rewrite-manifests"
    # calling again on the fold itself is a version-less no-op
    assert table.rewrite_manifests() == v
    assert table.current_version() == v


def test_fold_composes_with_mor_deltas_and_later_appends(spark, table):
    """Pending MoR deltas survive the fold with their true sequence
    numbers (equality deletes still apply to strictly-older data only),
    and a later append attributes to ITS version, not the fold's."""
    from philotes_spark.sources.iceberg_manifest import file_provenance

    table.commit(_df(spark, 0, 100))
    # equality delta: delete keys 0..9 MoR-style, then upsert two back
    ch = spark.createDataFrame(
        [(k, 99, 7777, False) for k in range(2)]
        + [(k, 0, 0, True) for k in range(2, 10)],
        "k long, g long, v long, _deleted boolean",
    )
    table.merge(ch, key_cols=["k"], delete_col="_deleted", mode="mor")
    before = _rows(table)
    v_delta = table.current_version()

    v_fold = table.rewrite_manifests()
    assert _rows(table) == before
    _, deltas = file_provenance(table, v_fold)
    assert deltas and all(seq == v_delta for _d, seq in deltas)

    table.commit(_df(spark, 1000, 1010))
    added, _ = file_provenance(table, table.current_version())
    late = [f for f, v in added.items() if v == table.current_version()]
    assert late, "the post-fold append attributes to its own version"
    assert _rows(table) == sorted(
        before + [(k, k % 7, k * 2) for k in range(1000, 1010)]
    )


def test_published_avro_chain_parity_across_fold(
    spark, table, tmp_path
):
    """The external-reader pin: the published Avro manifest chain built
    AT the fold version plans the same live files, same per-entry
    status/provenance, and reads byte-identical rows as the chain built
    just before it."""
    from philotes_spark.sources.iceberg_manifest import (
        plan_entries,
        write_manifests_for_version,
    )

    table.commit(_df(spark, 0, 100))
    table.commit(_df(spark, 100, 200))
    table.delete_where("k < 10", key_cols=["k"])
    v0 = table.current_version()
    ml0 = write_manifests_for_version(table, v0)
    data0, del0 = plan_entries(ml0)

    v1 = table.rewrite_manifests()
    ml1 = write_manifests_for_version(table, v1)
    data1, del1 = plan_entries(ml1)

    def key(es):
        return sorted(
            (e["file_path"], e["content"], e["sequence"]) for e in es
        )

    assert key(data0) == key(data1)
    assert key(del0) == key(del1)

def test_publish_export_reads_no_footers_for_live_files(
    spark, table, monkeypatch
):
    """r16: the Avro export consumes the manifest's commit-time
    file_meta — publishing must NOT re-read a footer or stat the
    filesystem for any live or parent data file (previously O(table
    files) metadata round-trips per publish; on an object store, one
    GET + one HEAD per file per commit_append)."""
    import os as _os

    import pyarrow.parquet as _pq

    from philotes_spark.sources.iceberg_manifest import (
        write_manifests_for_version,
    )

    table.commit(_df(spark, 0, 100))
    table.commit(_df(spark, 100, 200))
    table.delete_where("k < 10", key_cols=["k"])  # parent-only files exist
    covered = set(table._resolve()["files"])
    for v in range(1, table.current_version() + 1):
        covered |= set(table._resolve(version=v)["files"])

    touched: list[str] = []
    real_pf, real_sz = _pq.ParquetFile, _os.path.getsize

    def spy_pf(path, *a, **kw):
        if str(path) in covered:
            touched.append(f"footer:{path}")
        return real_pf(path, *a, **kw)

    def spy_sz(path):
        if str(path) in covered:
            touched.append(f"stat:{path}")
        return real_sz(path)

    monkeypatch.setattr(_pq, "ParquetFile", spy_pf)
    monkeypatch.setattr(_os.path, "getsize", spy_sz)
    write_manifests_for_version(table, table.current_version())
    assert touched == [], touched
