"""Iceberg REST catalog adapter tests against a local mock catalog
server (the way the reference tests its REST client with httptest —
rest_test.go): create-namespace / create-table / commit / load over real
HTTP, plus the SnapshotTable publish bridge."""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import types as T

from philotes_spark.sources.catalog_rest import (
    CatalogError,
    RestCatalog,
    schema_to_rest,
)


class MockCatalog(ThreadingHTTPServer):
    """Stateful Lakekeeper-ish mock: namespaces set, tables dict,
    committed data files per table, seen auth headers."""

    def __init__(self):
        super().__init__(("127.0.0.1", 0), _Handler)
        self.namespaces: set[str] = set()
        self.tables: dict[tuple[str, str], dict] = {}
        self.commits: dict[tuple[str, str], list[dict]] = {}
        self.auth_headers: list[str | None] = []
        self.port = self.server_address[1]


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def _reply(self, status: int, body: dict | None = None):
        data = json.dumps(body or {}).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(n)) if n else {}

    def do_GET(self):
        srv: MockCatalog = self.server  # type: ignore[assignment]
        srv.auth_headers.append(self.headers.get("Authorization"))
        m = re.fullmatch(r"/catalog/v1/wh/namespaces/([^/]+)", self.path)
        if m:
            ns = m.group(1)
            return self._reply(200 if ns in srv.namespaces else 404)
        m = re.fullmatch(r"/catalog/v1/wh/namespaces/([^/]+)/tables/([^/]+)", self.path)
        if m:
            key = (m.group(1), m.group(2))
            if key in srv.tables:
                return self._reply(
                    200,
                    {
                        "metadata": srv.tables[key],
                        "data-files": srv.commits.get(key, []),
                        "data-files-committed": len(srv.commits.get(key, [])),
                    },
                )
            return self._reply(404)
        return self._reply(400, {"error": f"bad path {self.path}"})

    def do_POST(self):
        srv: MockCatalog = self.server  # type: ignore[assignment]
        srv.auth_headers.append(self.headers.get("Authorization"))
        body = self._body()
        if re.fullmatch(r"/catalog/v1/wh/namespaces", self.path):
            ns = body["namespace"][0]
            if ns in srv.namespaces:
                return self._reply(409, {"error": "namespace exists"})
            srv.namespaces.add(ns)
            return self._reply(200, {"namespace": [ns]})
        m = re.fullmatch(r"/catalog/v1/wh/namespaces/([^/]+)/tables", self.path)
        if m:
            key = (m.group(1), body["name"])
            if key in srv.tables:
                return self._reply(409, {"error": "table exists"})
            srv.tables[key] = {
                "schema": body["schema"],
                "partition-spec": body["partition-spec"],
            }
            return self._reply(200, {"metadata": srv.tables[key]})
        m = re.fullmatch(r"/catalog/v1/wh/namespaces/([^/]+)/tables/([^/]+)", self.path)
        if m:
            key = (m.group(1), m.group(2))
            if key not in srv.tables:
                return self._reply(404)
            for upd in body["updates"]:
                assert upd["action"] == "append"
                srv.commits.setdefault(key, []).extend(
                    upd["append-files"]["data-files"]
                )
            return self._reply(200, {"metadata": srv.tables[key]})
        return self._reply(400, {"error": f"bad path {self.path}"})


@pytest.fixture()
def mock_catalog():
    srv = MockCatalog()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def test_schema_conversion():
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
            T.StructField("amt", T.DecimalType(38, 6), True),
        ]
    )
    rest = schema_to_rest(schema)
    assert [f["id"] for f in rest["fields"]] == [1, 2, 3]
    assert rest["fields"][0] == {
        "id": 1,
        "name": "k",
        "required": True,
        "type": "long",
    }
    assert rest["fields"][2]["type"] == "decimal(38, 6)"
    with pytest.raises(ValueError, match="no Iceberg REST mapping"):
        schema_to_rest(
            T.StructType([T.StructField("a", T.ArrayType(T.LongType()))])
        )


def test_namespace_and_table_lifecycle(mock_catalog):
    cat = RestCatalog(
        f"http://127.0.0.1:{mock_catalog.port}", "wh", token="tok123"
    )
    assert not cat.namespace_exists("cdc")
    cat.create_namespace("cdc")
    assert cat.namespace_exists("cdc")
    cat.create_namespace("cdc")  # idempotent

    schema = T.StructType([T.StructField("k", T.LongType(), False)])
    assert not cat.table_exists("cdc", "events")
    cat.create_table("cdc", "events", schema, partition_by=["k"])
    assert cat.table_exists("cdc", "events")
    cat.create_table("cdc", "events", schema)  # idempotent

    meta = cat.load_table("cdc", "events")
    spec = meta["metadata"]["partition-spec"]
    assert spec["fields"][0]["name"] == "k"
    assert spec["fields"][0]["transform"] == "identity"
    # every request carried the bearer token (rest.go:246-248)
    assert all(h == "Bearer tok123" for h in mock_catalog.auth_headers)


def test_commit_and_error_surface(mock_catalog):
    cat = RestCatalog(f"http://127.0.0.1:{mock_catalog.port}", "wh")
    with pytest.raises(CatalogError, match="status 404"):
        cat.load_table("nope", "missing")
    schema = T.StructType([T.StructField("k", T.LongType(), False)])
    cat.create_table("ns", "t", schema)
    cat.commit_append(
        "ns",
        "t",
        [
            {
                "content": "data",
                "file-path": "/data/part-0.parquet",
                "file-format": "parquet",
                "record-count": 10,
                "file-size-in-bytes": 1234,
            }
        ],
    )
    assert mock_catalog.commits[("ns", "t")][0]["record-count"] == 10
    with pytest.raises(CatalogError, match="status 404"):
        cat.commit_append("ns", "ghost", [])


def test_publish_snapshot_bridge(mock_catalog, spark, tmp_path):
    """SnapshotTable versions publish as appends: v1 commits its files,
    v2 commits only the files added since v1."""
    from philotes_spark.sources.snapshots import SnapshotTable

    snap = SnapshotTable(spark, str(tmp_path / "t"))
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    snap.commit(df1.coalesce(1))
    df2 = spark.createDataFrame([(3, "c")], "k long, v string")
    snap.commit(df2.coalesce(1))

    cat = RestCatalog(f"http://127.0.0.1:{mock_catalog.port}", "wh")
    n1 = cat.publish_snapshot("lake", "tbl", snap, version=1)
    n2 = cat.publish_snapshot("lake", "tbl", snap, version=2)
    assert n1 >= 1 and n2 >= 1

    committed = mock_catalog.commits[("lake", "tbl")]
    assert len(committed) == n1 + n2
    assert all(f["file-format"] == "parquet" for f in committed)
    assert sum(f["record-count"] for f in committed) == 3
    assert all(f["file-size-in-bytes"] > 0 for f in committed)
    # schema arrived in Iceberg REST form
    meta = cat.load_table("lake", "tbl")
    names = [f["name"] for f in meta["metadata"]["schema"]["fields"]]
    assert names == ["k", "v"]


def test_publish_load_round_trip_external_readback(mock_catalog, spark, tmp_path):
    """VERDICT r04 #5: after publishing, load the table BACK through the
    adapter and assert schema + file-list + record-count fidelity against
    the local manifest; then an actual external engine (DuckDB, standing
    in for Trino) reads exactly the files the catalog serves and must
    reproduce the snapshot's rows."""
    import duckdb

    from philotes_spark.sources.snapshots import SnapshotTable

    snap = SnapshotTable(spark, str(tmp_path / "t"))
    snap.commit(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").coalesce(1)
    )
    snap.commit(spark.createDataFrame([(3, "c")], "k long, v string").coalesce(1))

    cat = RestCatalog(f"http://127.0.0.1:{mock_catalog.port}", "wh")
    cat.publish_snapshot("lake", "rt", snap, version=1)
    cat.publish_snapshot("lake", "rt", snap, version=2)

    summary = cat.verify_publish("lake", "rt", snap, version=2)
    assert summary == {"files": 2, "records": 3}

    # external-engine readback: DuckDB reads the catalog-served file list
    served = cat.load_table("lake", "rt")["data-files"]
    paths = [f["file-path"] for f in served]
    con = duckdb.connect()
    got = con.execute(
        "SELECT k, v FROM read_parquet(?) ORDER BY k", [paths]
    ).fetchall()
    con.close()
    local = sorted(
        (r.k, r.v) for r in snap.read(version=2).select("k", "v").collect()
    )
    assert got == local

    # divergence detection: a file the catalog never saw must fail the check
    snap.commit(spark.createDataFrame([(4, "d")], "k long, v string").coalesce(1))
    with pytest.raises(CatalogError, match="file-list divergence"):
        cat.verify_publish("lake", "rt", snap, version=3)
    # ...and publishing v3 heals it
    cat.publish_snapshot("lake", "rt", snap, version=3)
    assert cat.verify_publish("lake", "rt", snap, version=3)["records"] == 4
