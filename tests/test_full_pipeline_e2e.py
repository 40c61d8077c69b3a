"""The COMPLETE reference architecture in one test (SURVEY §3.1 + §2
A1→A17): walsender bytes on a TCP socket → wire client → pgoutput
decode → WAL segments → custom streaming source → normalize → snapshot
table commit → Iceberg REST catalog publish (v2 table metadata) →
external-engine readback (DuckDB standing in for Trino) reproducing the
CDC latest state.

Every stage is unit/E2E-tested on its own elsewhere; this test proves
the COMPOSITION — that a user can run the reference's entire
ingest-to-query dataflow (`internal/cdc/source/postgres/reader.go` →
`internal/iceberg/writer/writer.go` → `internal/iceberg/catalog/rest.go`
→ external engine) on this engine with no glue beyond the public APIs.
"""

from __future__ import annotations

import json

import duckdb
import pytest
from pyspark.sql import functions as F

from philotes_spark.sources.catalog_rest import (
    RestCatalog,
    validate_table_metadata_v2,
)
from philotes_spark.sources.snapshots import SnapshotTable
from philotes_spark.streaming.ingest import CdcIngestPipeline
from philotes_spark.streaming.pgoutput import (
    PgReplicationConnection,
    drain_feed_to_wal,
)
from philotes_spark.streaming.wal_source import read_wal_stream
from tests.test_catalog_rest import mock_catalog  # noqa: F401  (fixture)
from tests.test_pgoutput import _frames
from tests.test_pgwire import MockWalsender


def test_socket_to_external_readback(spark, tmp_path, mock_catalog):  # noqa: F811
    wal_dir = str(tmp_path / "wal")
    snap_dir = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")

    # -- stage 1: live socket session → decoded events → WAL segments
    # (A1-A6: wire protocol, pgoutput decode, keep-alive filter, durable
    # append, flush-position acks)
    server = MockWalsender(_frames())
    server.start()
    conn = PgReplicationConnection(
        f"host=127.0.0.1 port={server.port} user=repl dbname=app",
        slot="s1",
        publication="p1",
    )
    n, last_lsn = drain_feed_to_wal(conn, wal_dir)
    conn.close()
    server.join(timeout=10)
    assert server.error is None, server.error
    assert n == 4 and last_lsn == 0x1_0000_0040

    # -- stage 2: custom streaming source → normalize → snapshot commit
    # (A9/A14/A17: micro-batch, parquet encode, committed snapshot)
    snap = SnapshotTable(spark, snap_dir)

    def sink(batch_df, _epoch):
        norm = CdcIngestPipeline.normalize(batch_df).select(
            "id",
            "table_name",
            "after",
            "_cdc_operation",
            "_cdc_timestamp",
            "_cdc_lsn",
            "_cdc_lsn_int",
        )
        if norm.take(1):
            snap.commit(norm.coalesce(1))

    q = (
        read_wal_stream(spark, wal_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    assert snap.current_version() >= 1
    version = snap.current_version()

    # -- stage 3: publish to the REST catalog; the served payload must be
    # a valid Iceberg v2 document whose manifest-list resolves (A16/A17)
    cat = RestCatalog(f"http://127.0.0.1:{mock_catalog.port}", "wh")
    n_files = cat.publish_snapshot("cdc", "users_log", snap, version=version)
    assert n_files >= 1
    summary = cat.verify_publish("cdc", "users_log", snap, version=version)
    assert summary["records"] == 4  # INSERT, UPDATE, DELETE, TRUNCATE

    loaded = cat.load_table("cdc", "users_log")
    validate_table_metadata_v2(loaded["metadata"])

    # -- stage 4: an external engine reads ONLY what the catalog serves
    # and must reproduce the CDC latest state (B10 over the log: key 1
    # was inserted, updated, deleted, then the table truncated — current
    # state is empty; the log itself retains all four operations)
    paths = [f["file-path"] for f in loaded["data-files"]]
    con = duckdb.connect()
    ops = con.execute(
        "SELECT _cdc_operation, _cdc_lsn_int FROM read_parquet(?) "
        "ORDER BY _cdc_lsn_int",
        [paths],
    ).fetchall()
    assert [o for o, _ in ops] == ["INSERT", "UPDATE", "DELETE", "TRUNCATE"]
    # LSNs strictly increase through the chain (ordering contract, §7.4
    # risk 4: parsed int64, not lexicographic text)
    lsns = [l for _, l in ops]
    assert lsns == sorted(lsns) and len(set(lsns)) == 4

    # external current-state query over the served files: latest op per
    # key is DELETE/TRUNCATE ⇒ no live rows survive
    live = con.execute(
        """
        WITH ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                ORDER BY _cdc_lsn_int DESC) AS rn
            FROM read_parquet(?)
        )
        SELECT COUNT(*) FROM ranked
        WHERE rn = 1 AND _cdc_operation NOT IN ('DELETE', 'TRUNCATE')
        """,
        [paths],
    ).fetchone()[0]
    con.close()
    assert live == 0

    # and the engine's own read of the same snapshot agrees with what the
    # external engine saw (same files, same rows)
    own = snap.read(version=version)
    assert own.count() == 4
    assert set(
        r._cdc_operation for r in own.select("_cdc_operation").collect()
    ) == {"INSERT", "UPDATE", "DELETE", "TRUNCATE"}
