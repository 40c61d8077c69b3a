"""Spec-rule fixtures for the independent pandas planner (VERDICT r10 #2).

``tests/iceberg_planner.py`` re-implements Iceberg v2 scan planning from
the public spec over the cleanroom-decoded Avro chain, and
``_readback_equal`` runs it on every publish-family state (including the
fuzz family-10 end states). This file pins the two rules most likely to
be silently wrong in BOTH implementations if one had been copied from
the other — the sequence-boundary scoping of the two delete kinds, and
name-mapping column resolution across a rename chain with a dropped
column's physical remnant.
"""

from __future__ import annotations

import json
import threading

import pytest

from tests.iceberg_planner import assert_tables_equal, plan_table_pandas


@pytest.fixture()
def live_catalog():
    from tests.test_catalog_rest import MockCatalog

    srv = MockCatalog()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _published_state(cat, namespace, table):
    meta = cat.load_table(namespace, table)["metadata"]
    cur = meta["current-snapshot-id"]
    pub = next(s for s in meta["snapshots"] if s["snapshot-id"] == cur)
    rest_schema = next(
        s for s in meta["schemas"]
        if s["schema-id"] == meta["current-schema-id"]
    )
    mapping = json.loads(
        meta.get("properties", {}).get("schema.name-mapping.default", "null")
    )
    return pub["manifest-list"], rest_schema, mapping


def test_sequence_boundary_scoping(live_catalog, spark, tmp_path):
    """The knife edges of the two delete kinds, at the SAME sequence as
    a data file: an equality delete's own upsert files land at the
    delta's sequence and must survive it (strict ``<``), while a
    position delete addresses rows of files at sequence ≤ its own
    (inclusive) — the upsert row it names must drop."""
    from pyspark.sql import functions as F

    from philotes_spark.sources.catalog_rest import RestCatalog
    from philotes_spark.sources.snapshots import SnapshotTable

    tbl = SnapshotTable(spark, str(tmp_path / "seq_edge"))
    tbl.commit(spark.range(0, 6).select(F.col("id").alias("k")).coalesce(1))
    # eq delta at seq 2: deletes k in {1,2}, upserts k=2 (a data file AT
    # sequence 2 — the delete's own keys must not reach it)
    tbl.merge(
        spark.createDataFrame([(1, True), (2, False)], "k long, _del boolean"),
        key_cols=["k"],
        delete_col="_del",
        mode="mor",
    )
    assert tbl.read().count() == 5  # {0,3,4,5} + upserted 2
    cat = RestCatalog(f"http://127.0.0.1:{live_catalog.port}", "wh")
    cat.publish_snapshot("ns", "t_seq", tbl)
    ml, rest_schema, mapping = _published_state(cat, "ns", "t_seq")
    ind = plan_table_pandas(ml, rest_schema, name_mapping=mapping)
    # the planner's own verdict, not a diff against the engine: the
    # upsert survives its own delta's equality keys
    assert sorted(ind["k"]) == [0, 2, 3, 4, 5]
    assert_tables_equal(ind, tbl.read().toPandas(), rest_schema)
    # position deletes, by contrast, scope sequence ≤ (inclusive) and
    # address by (file_path, pos): only the named row of the named file
    # drops — a later append of the same VALUE is untouched (no key
    # semantics), the eq delta's pending keys keep applying
    tbl2 = SnapshotTable(spark, str(tmp_path / "seq_edge_pos"))
    tbl2.commit(spark.range(0, 4).select(F.col("id").alias("k")).coalesce(1))
    tbl2.delete_where_positional("k = 1")  # seq 2, names the seq-1 file
    tbl2.commit(
        spark.createDataFrame([(1,)], "k long").coalesce(1)
    )  # seq 3: same value, different address — survives
    cat.publish_snapshot("ns", "t_seq_pos", tbl2)
    ml, rest_schema, mapping = _published_state(cat, "ns", "t_seq_pos")
    ind = plan_table_pandas(ml, rest_schema, name_mapping=mapping)
    assert sorted(ind["k"]) == [0, 1, 2, 3]  # the re-appended 1, not two
    assert_tables_equal(ind, tbl2.read().toPandas(), rest_schema)


def test_name_mapping_rename_chain_and_dropped_remnant(
    live_catalog, spark, tmp_path
):
    """Column projection through the mapping: a file written before a
    rename CHAIN (a→b→c) resolves its physical ``a`` to the current
    ``c``; the dropped column's physical remnant in old files matches no
    mapping entry and is not projected; a freshly added column absent
    from every file reads as null."""
    from philotes_spark.sources.catalog_rest import RestCatalog
    from philotes_spark.sources.snapshots import SnapshotTable

    tbl = SnapshotTable(spark, str(tmp_path / "nm_chain"))
    tbl.commit(
        spark.createDataFrame(
            [(1, "v1", "junk1")], "k long, a string, junk string"
        ).coalesce(1)
    )
    tbl.alter_rename_column("a", "b")
    tbl.alter_rename_column("b", "c")
    tbl.alter_drop_column("junk")
    tbl.alter_add_columns([("fresh", "double")])
    # post-evolution file carries the current physical names
    tbl.commit(
        spark.createDataFrame([(2, "v2", 2.5)], "k long, c string, fresh double")
    )
    cat = RestCatalog(f"http://127.0.0.1:{live_catalog.port}", "wh")
    cat.publish_snapshot("ns", "t_nm", tbl)
    cat.verify_publish("ns", "t_nm", tbl)
    ml, rest_schema, mapping = _published_state(cat, "ns", "t_nm")
    # the served mapping lists the full alias chain under one field id
    chain = next(e for e in mapping if "c" in e["names"])
    assert {"a", "b", "c"} <= set(chain["names"])
    ind = plan_table_pandas(ml, rest_schema, name_mapping=mapping)
    assert sorted(ind.columns) == ["c", "fresh", "k"]
    by_k = {int(r.k): (r.c, r.fresh) for r in ind.itertuples()}
    assert by_k[1][0] == "v1"  # pre-rename physical `a` resolved to `c`
    assert by_k[1][1] is None or by_k[1][1] != by_k[1][1]  # null fresh
    assert by_k[2] == ("v2", 2.5)
    assert_tables_equal(ind, tbl.read().toPandas(), rest_schema)


def test_planner_detects_a_broken_chain(live_catalog, spark, tmp_path):
    """Canary: the planner is a real check, not a tautology — feeding it
    a stale manifest list (pre-delete) makes it disagree with the
    engine's current read."""
    from pyspark.sql import functions as F

    from philotes_spark.sources.catalog_rest import RestCatalog
    from philotes_spark.sources.snapshots import SnapshotTable

    tbl = SnapshotTable(spark, str(tmp_path / "canary"))
    tbl.commit(spark.range(0, 8).select(F.col("id").alias("k")).coalesce(1))
    cat = RestCatalog(f"http://127.0.0.1:{live_catalog.port}", "wh")
    cat.publish_snapshot("ns", "t_canary", tbl)
    stale_ml, rest_schema, mapping = _published_state(cat, "ns", "t_canary")
    tbl.merge(
        spark.createDataFrame([(3, True)], "k long, _del boolean"),
        key_cols=["k"], delete_col="_del", mode="mor",
    )
    cat.publish_snapshot("ns", "t_canary", tbl)
    stale = plan_table_pandas(stale_ml, rest_schema, name_mapping=mapping)
    with pytest.raises(AssertionError):
        assert_tables_equal(stale, tbl.read().toPandas(), rest_schema)
