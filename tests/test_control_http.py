"""Control-plane REST surface (A32-A35 over HTTP): pipeline CRUD +
lifecycle + table mappings and catalog browsing, with identifier-
validation parity to the reference's handlers (server.go:308-352,
handlers/query.go:32-40, services/query.go:18-53)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from philotes_spark.control_http import ControlServer


def _call(port: int, method: str, path: str, body: dict | None = None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=data,
        method=method,
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, json.loads(resp.read() or b"{}")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


@pytest.fixture()
def server(spark):
    srv = ControlServer(spark).start()
    yield srv
    srv.stop()


def _pipe_body(tmp_path, name="pg_main"):
    return {
        "name": name,
        "table_mappings": ["public.users"],
        "config": {
            "source_dir": str(tmp_path / "feed"),
            "lake_dir": str(tmp_path / "lake"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "dlq_dir": str(tmp_path / "dlq"),
        },
    }


def test_pipeline_crud_over_http(server, tmp_path):
    p = server.port
    # empty list
    assert _call(p, "GET", "/api/v1/pipelines") == (200, {"pipelines": []})

    # create
    status, out = _call(p, "POST", "/api/v1/pipelines", _pipe_body(tmp_path))
    assert status == 201
    assert out["name"] == "pg_main" and out["paused"] is False
    assert out["config"]["source_dir"].endswith("feed")

    # duplicate create → 409 conflict
    status, out = _call(p, "POST", "/api/v1/pipelines", _pipe_body(tmp_path))
    assert status == 409 and "already exists" in out["error"]

    # get / list / status
    assert _call(p, "GET", "/api/v1/pipelines")[1] == {"pipelines": ["pg_main"]}
    status, out = _call(p, "GET", "/api/v1/pipelines/pg_main")
    assert status == 200 and out["table_mappings"] == ["public.users"]
    status, out = _call(p, "GET", "/api/v1/pipelines/pg_main/status")
    assert status == 200 and out["state"] == "stopped"

    # update
    status, out = _call(p, "PUT", "/api/v1/pipelines/pg_main", {"paused": True})
    assert status == 200 and out["paused"] is True

    # table mappings (dotted two-part names, pipeline.go:196-236)
    status, out = _call(
        p, "POST", "/api/v1/pipelines/pg_main/tables", {"table": "public.orders"}
    )
    assert status == 200 and out["table_mappings"] == ["public.users", "public.orders"]
    status, out = _call(
        p, "DELETE", "/api/v1/pipelines/pg_main/tables/public.orders"
    )
    assert status == 200 and out["table_mappings"] == ["public.users"]

    # stop on a non-running pipeline is a safe no-op
    assert _call(p, "POST", "/api/v1/pipelines/pg_main/stop")[0] == 200

    # delete, then 404
    assert _call(p, "DELETE", "/api/v1/pipelines/pg_main")[0] == 200
    assert _call(p, "GET", "/api/v1/pipelines/pg_main")[0] == 404
    assert _call(p, "DELETE", "/api/v1/pipelines/pg_main")[0] == 404


def test_identifier_validation_parity(server, tmp_path):
    p = server.port
    # create with a bad identifier → 400, same rule as services/query.go
    bad = _pipe_body(tmp_path, name="bad-name")
    status, out = _call(p, "POST", "/api/v1/pipelines", bad)
    assert status == 400 and "invalid identifier" in out["error"]
    status, out = _call(p, "GET", "/api/v1/pipelines/1abc")
    assert status == 400 and "invalid identifier" in out["error"]
    # injection-shaped table mapping rejected before touching the registry
    _call(p, "POST", "/api/v1/pipelines", _pipe_body(tmp_path))
    status, out = _call(
        p, "POST", "/api/v1/pipelines/pg_main/tables", {"table": "users; DROP"}
    )
    assert status == 400
    status, out = _call(
        p, "POST", "/api/v1/pipelines/pg_main/tables", {"table": "a.b.c"}
    )
    assert status == 400
    # catalog browse validates path identifiers too
    status, out = _call(p, "GET", "/api/v1/query/catalogs/spark_catalog/schemas/1bad/tables")
    assert status == 400 and "invalid identifier" in out["error"]


def test_catalog_browse_over_http(server, spark, sf_dir):
    from philotes_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    p = server.port
    status, out = _call(p, "GET", "/api/v1/query/catalogs")
    assert status == 200 and "spark_catalog" in out["catalogs"]
    status, out = _call(p, "GET", "/api/v1/query/catalogs/spark_catalog/schemas")
    assert status == 200 and "default" in out["schemas"]
    status, out = _call(
        p, "GET", "/api/v1/query/catalogs/spark_catalog/schemas/default/tables"
    )
    assert status == 200
    for t in ("lineitem", "orders", "events"):
        assert t in out["tables"]
    status, out = _call(
        p,
        "GET",
        "/api/v1/query/catalogs/spark_catalog/schemas/default/tables/lineitem",
    )
    assert status == 200
    cols = {c["name"]: c["type"] for c in out["columns"]}
    assert cols["l_orderkey"] == "bigint"


def test_http_lifecycle_runs_a_real_pipeline(server, spark, tmp_path):
    """POST start actually runs the streaming ingest (availableNow) and
    status reflects it — the HTTP twin of the registry lifecycle test."""
    import datetime as dt

    from philotes_spark.types import CDC_EVENT_SCHEMA

    p = server.port
    body = _pipe_body(tmp_path, name="live1")
    _call(p, "POST", "/api/v1/pipelines", body)

    # drop one CDC event parquet into the feed dir
    ev = spark.createDataFrame(
        [
            (
                "e1",
                "0/1",
                1,
                dt.datetime(2024, 1, 1),
                "public",
                "users",
                "INSERT",
                None,
                '{"id":1}',
                ["id"],
                {},
            )
        ],
        CDC_EVENT_SCHEMA,
    )
    ev.coalesce(1).write.parquet(body["config"]["source_dir"])

    status, out = _call(
        p, "POST", "/api/v1/pipelines/live1/start", {"available_now": True}
    )
    assert status == 200
    server.registry._running["live1"].query.awaitTermination(120)
    status, out = _call(p, "GET", "/api/v1/pipelines/live1/status")
    assert status == 200 and out["state"] == "running"
    # double start → 409
    assert _call(p, "POST", "/api/v1/pipelines/live1/start")[0] == 409
    assert _call(p, "POST", "/api/v1/pipelines/live1/stop")[0] == 200
    status, out = _call(p, "GET", "/api/v1/pipelines/live1/status")
    assert out["state"] == "stopped"


# --- statement execution (A34 over HTTP) -------------------------------------


def test_statements_select_paged(spark, tmp_path):
    spark.range(0, 25).withColumnRenamed("id", "v").createOrReplaceTempView(
        "stmt_t"
    )
    srv = ControlServer(spark).start()
    try:
        code, out = _call(
            srv.port, "POST", "/api/v1/statements",
            {"sql": "SELECT v FROM stmt_t ORDER BY v", "max_rows": 10},
        )
        assert code == 200
        assert out["columns"] == [{"name": "v", "type": "bigint"}]
        assert [r[0] for r in out["rows"]] == list(range(10))
        assert out["truncated"] is True and out["next_offset"] == 10
        # follow the pagination to the end
        code, out2 = _call(
            srv.port, "POST", "/api/v1/statements",
            {"sql": "SELECT v FROM stmt_t ORDER BY v", "max_rows": 10,
             "offset": 20},
        )
        assert code == 200
        assert [r[0] for r in out2["rows"]] == list(range(20, 25))
        assert out2["truncated"] is False and out2["next_offset"] is None
    finally:
        srv.stop()
        spark.catalog.dropTempView("stmt_t")


def test_statements_dml_and_time_travel(spark, tmp_path):
    from philotes_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 10).withColumnRenamed("id", "v"))
    srv = ControlServer(
        spark, snapshot_tables={"tbl": t}, dml_keys={"tbl": ["v"]}
    ).start()
    try:
        code, out = _call(
            srv.port, "POST", "/api/v1/statements",
            {"sql": "DELETE FROM tbl WHERE v >= 5"},
        )
        assert code == 200
        assert out["rows"] == [["tbl", "delete", 2]]
        code, out = _call(
            srv.port, "POST", "/api/v1/statements",
            {"sql": "SELECT COUNT(*) AS n FROM tbl VERSION AS OF 1"},
        )
        assert code == 200 and out["rows"] == [[10]]
        assert t.read().count() == 5
    finally:
        srv.stop()


def test_statements_error_mapping(spark):
    srv = ControlServer(spark).start()
    try:
        code, out = _call(srv.port, "POST", "/api/v1/statements", {})
        assert code == 400 and "sql" in out["error"]
        code, out = _call(
            srv.port, "POST", "/api/v1/statements",
            {"sql": "SELECT 1", "max_rows": 0},
        )
        assert code == 400
        # Catalyst analysis error surfaces as a 400 with Spark's message
        code, out = _call(
            srv.port, "POST", "/api/v1/statements",
            {"sql": "SELECT * FROM definitely_not_a_table"},
        )
        assert code == 400 and "definitely_not_a_table" in out["error"]
        code, _ = _call(srv.port, "GET", "/api/v1/statements")
        assert code == 405
    finally:
        srv.stop()


def test_statements_endpoint_serves_ctas_and_drop(spark, tmp_path):
    """r08: CTAS + DROP TABLE as statement text over POST
    /api/v1/statements when the server is built with a table_root."""
    import json
    import urllib.request

    from philotes_spark.control_http import ControlServer

    tabs = {}
    srv = ControlServer(
        spark, snapshot_tables=tabs, dml_keys={},
        table_root=str(tmp_path),
    )
    srv.start()
    try:
        def post(stmt):
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/api/v1/statements",
                data=json.dumps({"sql": stmt}).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req) as resp:
                return json.loads(resp.read())

        out = post("CREATE TABLE http_t AS SELECT id AS k FROM range(3)")
        assert out["rows"][0][1] == "create-table-as"
        assert "http_t" in tabs
        out = post("SELECT COUNT(*) AS n FROM http_t VERSION AS OF 1")
        assert out["rows"][0][0] == 3
        out = post("DROP TABLE http_t")
        assert out["rows"][0][1] == "drop-table"
        assert "http_t" not in tabs
    finally:
        srv.stop()


def test_statements_write_order_and_maintenance(spark, tmp_path):
    """The r13 write-order / maintenance DDL works over the HTTP
    statements route like any other statement: WRITE ORDERED BY is a
    metadata-only commit, OPTIMIZE ZORDER BY reclusters row-identically,
    $sort_orders serves the history, and remove_orphan_files sweeps."""
    from pyspark.sql import functions as F

    from philotes_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("g")
        )
    )
    srv = ControlServer(spark, snapshot_tables={"tbl": t}).start()
    try:
        code, out = _call(
            srv.port, "POST", "/api/v1/statements",
            {"sql": "ALTER TABLE tbl WRITE ORDERED BY (k)"},
        )
        assert code == 200
        assert out["rows"] == [["tbl", "set-write-order", 2]]
        code, out = _call(
            srv.port, "POST", "/api/v1/statements",
            {"sql": "OPTIMIZE tbl ZORDER BY (k, g)"},
        )
        assert code == 200 and out["rows"][0][1] == "optimize-zorder"
        code, out = _call(
            srv.port, "POST", "/api/v1/statements",
            {"sql": 'SELECT order_id, kind FROM "tbl$sort_orders" '
                    "ORDER BY order_id"},
        )
        assert code == 200
        assert out["rows"] == [[0, "unsorted"], [1, "sort"], [2, "zorder"]]
        code, out = _call(
            srv.port, "POST", "/api/v1/statements",
            {"sql": "CALL remove_orphan_files(table => 'tbl')"},
        )
        assert code == 200 and out["rows"][0][1] == "remove_orphan_files"
        assert t.read().count() == 100
        # r14: DESC write orders are accepted end to end over HTTP
        # (canonical manifest spelling; Iceberg desc ⇒ nulls-last);
        # z-order direction keywords still map to a 400 with the reason
        code, out = _call(
            srv.port, "POST", "/api/v1/statements",
            {"sql": "ALTER TABLE tbl WRITE ORDERED BY (k DESC)"},
        )
        assert code == 200 and out["rows"][0][1] == "set-write-order"
        code, out = _call(
            srv.port, "POST", "/api/v1/statements",
            {"sql": 'SELECT sort_by FROM "tbl$sort_orders" '
                    "WHERE is_default"},
        )
        assert code == 200 and out["rows"] == [["k DESC"]]
        code, out = _call(
            srv.port, "POST", "/api/v1/statements",
            {"sql": "OPTIMIZE tbl ZORDER BY (k DESC)"},
        )
        assert code == 400 and "no per-column direction" in out["error"]
    finally:
        srv.stop()
