"""HTTP frame for the control plane (SURVEY §2A A32-A35's REST surface).

The reference serves pipeline CRUD + lifecycle and catalog browsing
through a Gin router (``internal/api/server.go:308-352``,
``handlers/query.go:32-40``); this module puts the same routes over the
in-process registries in :mod:`philotes_spark.control`, reusing the
stdlib ``http.server`` pattern proven by the health surface
(``streaming/health_http.py``):

    POST   /api/v1/pipelines                      create
    GET    /api/v1/pipelines                      list
    GET    /api/v1/pipelines/{name}               get
    PUT    /api/v1/pipelines/{name}               update
    DELETE /api/v1/pipelines/{name}               delete
    POST   /api/v1/pipelines/{name}/start         start
    POST   /api/v1/pipelines/{name}/stop          stop
    GET    /api/v1/pipelines/{name}/status        status
    POST   /api/v1/pipelines/{name}/tables        add table mapping
    DELETE /api/v1/pipelines/{name}/tables/{t}    remove table mapping
    GET    /api/v1/query/catalogs                              list catalogs
    GET    /api/v1/query/catalogs/{c}/schemas                  list schemas
    GET    /api/v1/query/catalogs/{c}/schemas/{s}/tables       list tables
    GET    /api/v1/query/catalogs/{c}/schemas/{s}/tables/{t}   describe
    POST   /api/v1/statements                                  execute SQL (paged)

The statements route (A34, the reference's ``POST /query`` →
``services/query.go`` → Trino path) runs the full
:mod:`philotes_spark.sql_frontend` surface — SELECT, time travel
(``VERSION/TIMESTAMP AS OF``), and the snapshot-table DML quartet —
with offset/max_rows paging (offset paging is deterministic only under
a total ORDER BY, the same contract Trino's paged fetch has).

Identifier validation matches the reference's rule (services/query.go:
18-53 → ``control.validate_identifier``): a bad identifier is a 400
before anything touches Spark. Error mapping: ValueError→400,
KeyError→404, RuntimeError→409.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from philotes_spark.control import (
    PipelineRegistry,
    PipelineSpec,
    describe_table,
    list_catalogs,
    list_schemas,
    list_tables,
    validate_identifier,
)
from philotes_spark.streaming.ingest import IngestConfig

_PIPE = re.compile(r"^/api/v1/pipelines(?:/([^/]+))?(?:/(start|stop|status|tables))?(?:/([^/]+))?$")


def _validate_mapping(mapping: str) -> str:
    """Table mappings are 1- or 2-part dotted names (``schema.table``,
    pipeline.go:196-236) — validate each part with the identifier rule."""
    parts = (mapping or "").split(".")
    if not 1 <= len(parts) <= 2:
        raise ValueError(f"invalid table mapping {mapping!r}")
    for p in parts:
        validate_identifier(p)
    return mapping
_QUERY = re.compile(
    r"^/api/v1/query/catalogs"
    r"(?:/([^/]+)/schemas"
    r"(?:/([^/]+)/tables"
    r"(?:/([^/]+))?)?)?$"
)


class ControlServer:
    """Control-plane REST server over a PipelineRegistry + spark.catalog.
    ``port=0`` binds an ephemeral port (tests); read ``.port`` after
    ``start()``."""

    def __init__(
        self,
        spark: SparkSession,
        registry: PipelineRegistry | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
        snapshot_tables: dict | None = None,
        dml_keys: dict | None = None,
        table_root: str | None = None,
    ) -> None:
        self.spark = spark
        self.registry = registry or PipelineRegistry(spark)
        self.host = host
        self._port = port
        # tables served to /statements with time travel + DML enabled;
        # table_root additionally enables CTAS over HTTP (new snapshot
        # tables materialize under it and self-register)
        self.snapshot_tables = (
            snapshot_tables if snapshot_tables is not None else {}
        )
        self.dml_keys = dml_keys or {}
        self.table_root = table_root
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        if self._server is not None:
            return self._server.server_address[1]
        return self._port

    # -- route implementations (return (status, payload)) --------------------

    def _spec_json(self, spec: PipelineSpec) -> dict:
        return {
            "name": spec.name,
            "table_mappings": spec.table_mappings,
            "paused": spec.paused,
            "config": {
                "source_dir": spec.config.source_dir,
                "lake_dir": spec.config.lake_dir,
                "checkpoint_dir": spec.config.checkpoint_dir,
                "dlq_dir": spec.config.dlq_dir,
                "trigger": spec.config.trigger,
                "max_files_per_trigger": spec.config.max_files_per_trigger,
            },
        }

    def _handle(self, method: str, path: str, body: dict) -> tuple[int, dict]:
        try:
            return self._route(method, path, body)
        except ValueError as e:
            # duplicate create is a conflict (the reference's 409), any
            # other ValueError (bad identifier, bad config) is a 400
            code = 409 if "already exists" in str(e) else 400
            return code, {"error": str(e)}
        except KeyError as e:
            return 404, {"error": str(e).strip("'\"")}
        except AttributeError as e:
            return 400, {"error": str(e)}
        except RuntimeError as e:
            return 409, {"error": str(e)}
        except Exception as e:
            # Catalyst parse/analysis errors from /statements surface as
            # a 400 with Spark's message, not a dropped connection
            from pyspark.errors import PySparkException

            if isinstance(e, PySparkException):
                return 400, {"error": str(e)}
            raise

    def _route(self, method: str, path: str, body: dict) -> tuple[int, dict]:
        m = _PIPE.match(path)
        if m:
            return self._route_pipelines(method, *m.groups(), body=body)
        m = _QUERY.match(path)
        if m:
            return self._route_query(method, *m.groups())
        if path == "/api/v1/statements":
            return self._route_statements(method, body)
        return 404, {"error": f"no route {path}"}

    def _route_statements(self, method: str, body: dict) -> tuple[int, dict]:
        """A34 statement execution, paged. Body: ``{"sql": str,
        "max_rows": int<=10000 (default 1000), "offset": int}``. Runs
        through sql_frontend (time travel + snapshot DML + plain SQL);
        fetches ``max_rows+1`` rows to set ``truncated`` honestly.
        Values are JSON-encoded with ``str()`` for non-JSON types
        (timestamps, decimals) — a wire format, not a type system."""
        if method != "POST":
            return 405, {"error": "method not allowed"}
        stmt = body.get("sql")
        if not stmt or not isinstance(stmt, str):
            return 400, {"error": "body must carry a non-empty 'sql' string"}
        max_rows = int(body.get("max_rows", 1000))
        if not 1 <= max_rows <= 10_000:
            return 400, {"error": "max_rows must be in [1, 10000]"}
        offset = int(body.get("offset", 0))
        if offset < 0:
            return 400, {"error": "offset must be >= 0"}

        from philotes_spark import sql_frontend

        df = sql_frontend.sql(
            self.spark, stmt,
            snapshot_tables=self.snapshot_tables, dml_keys=self.dml_keys,
            table_root=self.table_root,
        )
        page = df.offset(offset).limit(max_rows + 1).collect() if offset \
            else df.limit(max_rows + 1).collect()
        truncated = len(page) > max_rows
        page = page[:max_rows]

        def cell(v):
            if v is None or isinstance(v, (bool, int, float, str)):
                return v
            if isinstance(v, (bytes, bytearray)):
                return v.hex()
            return str(v)

        return 200, {
            "columns": [
                {"name": f.name, "type": f.dataType.simpleString()}
                for f in df.schema.fields
            ],
            "rows": [[cell(v) for v in r] for r in page],
            "row_count": len(page),
            "offset": offset,
            "truncated": truncated,
            "next_offset": offset + len(page) if truncated else None,
        }

    def _route_pipelines(
        self, method: str, name, action, sub, body: dict
    ) -> tuple[int, dict]:
        reg = self.registry
        if name is None:
            if method == "GET":  # list
                return 200, {"pipelines": reg.list()}
            if method == "POST":  # create
                spec = PipelineSpec(
                    name=validate_identifier(body.get("name", "")),
                    config=IngestConfig(**body["config"]),
                    table_mappings=list(body.get("table_mappings", [])),
                )
                reg.create(spec)
                return 201, self._spec_json(spec)
            return 405, {"error": "method not allowed"}
        validate_identifier(name)
        if action is None:
            if method == "GET":
                return 200, self._spec_json(reg.get(name))
            if method == "PUT":
                allowed = {k: v for k, v in body.items() if k in ("paused", "table_mappings")}
                return 200, self._spec_json(reg.update(name, **allowed))
            if method == "DELETE":
                reg.get(name)  # 404 before delete
                reg.delete(name)
                return 200, {"deleted": name}
            return 405, {"error": "method not allowed"}
        if action == "start" and method == "POST":
            reg.start(name, available_now=bool(body.get("available_now")))
            return 200, reg.status(name)
        if action == "stop" and method == "POST":
            reg.get(name)
            reg.stop(name)
            return 200, reg.status(name)
        if action == "status" and method == "GET":
            return 200, reg.status(name)
        if action == "tables":
            if method == "POST":
                table = _validate_mapping(body.get("table", ""))
                return 200, {"table_mappings": reg.add_mapping(name, table)}
            if method == "DELETE" and sub:
                _validate_mapping(sub)
                return 200, {"table_mappings": reg.remove_mapping(name, sub)}
        return 405, {"error": "method not allowed"}

    def _route_query(self, method: str, catalog, schema, table) -> tuple[int, dict]:
        if method != "GET":
            return 405, {"error": "method not allowed"}
        if catalog is None:
            return 200, {"catalogs": list_catalogs(self.spark)}
        validate_identifier(catalog)
        if schema is None:
            return 200, {"catalog": catalog, "schemas": list_schemas(self.spark)}
        validate_identifier(schema)
        if table is None:
            return 200, {
                "schema": schema,
                "tables": list_tables(self.spark, schema),
            }
        validate_identifier(table)
        # session-catalog engine: temp views and default-db tables both
        # resolve by bare name (the schema path segment is validated and
        # echoed, mirroring the reference's catalog/:c/schemas/:s nesting)
        rows = describe_table(self.spark, table).collect()
        return 200, {
            "table": table,
            "columns": [
                {"name": r.col_name, "type": r.data_type, "comment": r.comment}
                for r in rows
            ],
        }

    # -- server lifecycle -----------------------------------------------------

    def start(self) -> "ControlServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # noqa: A003
                pass

            def _dispatch(self, method: str) -> None:
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n) if n else b""
                try:
                    body = json.loads(raw) if raw else {}
                except ValueError:
                    body, status, payload = {}, 400, {"error": "invalid JSON body"}
                    self._send(status, payload)
                    return
                status, payload = outer._handle(method, self.path, body)
                self._send(status, payload)

            def _send(self, code: int, payload: dict) -> None:
                data = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):  # noqa: N802
                self._dispatch("GET")

            def do_POST(self):  # noqa: N802
                self._dispatch("POST")

            def do_PUT(self):  # noqa: N802
                self._dispatch("PUT")

            def do_DELETE(self):  # noqa: N802
                self._dispatch("DELETE")

        self._server = ThreadingHTTPServer((self.host, self._port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="philotes-control", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
