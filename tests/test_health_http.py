"""A25 HTTP health surface: endpoint semantics over a real socket
(reference: internal/cdc/health/health.go:230-293)."""

import json
import urllib.error
import urllib.request

import pytest

from philotes_spark.streaming.health_http import HealthServer


def _get(port: int, path: str):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def state():
    return {"healthy": True, "state": "running", "metrics": {"batches": 3}}


@pytest.fixture()
def server(state):
    srv = HealthServer(lambda: dict(state)).start()
    yield srv
    srv.stop()


def test_health_reflects_live_state(server, state):
    code, body = _get(server.port, "/health")
    assert code == 200 and body["state"] == "running"
    state["healthy"] = False  # no caching: next probe sees the flip
    code, body = _get(server.port, "/health")
    assert code == 503 and body["healthy"] is False


def test_liveness_always_200_while_serving(server, state):
    state["healthy"] = False
    code, body = _get(server.port, "/health/live")
    assert code == 200 and body["status"] == "alive"


def test_readiness_tracks_healthy_flag(server, state):
    code, body = _get(server.port, "/health/ready")
    assert code == 200 and body["status"] == "ready"
    state["healthy"] = False
    code, body = _get(server.port, "/health/ready")
    assert code == 503 and body["status"] == "not_ready"


def test_unknown_path_404(server):
    code, _ = _get(server.port, "/health/nope")
    assert code == 404


def test_health_fn_exception_is_503_not_crash(server, state):
    srv = HealthServer(lambda: (_ for _ in ()).throw(RuntimeError("boom"))).start()
    try:
        code, body = _get(srv.port, "/health")
        assert code == 503 and "boom" in body["error"]
    finally:
        srv.stop()


def test_pipeline_health_dict_shape_is_servable(tmp_path):
    # the real payload (CdcIngestPipeline.health) serializes as-is: a
    # stopped pipeline is healthy (deliberate shutdown) but not ready
    from philotes_spark.streaming.ingest import CdcIngestPipeline, IngestConfig

    pipe = CdcIngestPipeline(
        spark=None,
        config=IngestConfig(
            source_dir=str(tmp_path / "src"),
            lake_dir=str(tmp_path / "lake"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            dlq_dir=str(tmp_path / "dlq"),
        ),
    )
    srv = HealthServer(
        pipe.health, ready_fn=lambda: pipe.state.can_process()
    ).start()
    try:
        code, body = _get(srv.port, "/health")
        assert code == 200 and body["state"] == "stopped"
        code, _ = _get(srv.port, "/health/ready")
        assert code == 503  # stopped ⇒ not ready to process
    finally:
        srv.stop()


def test_readiness_guards_throwing_probe():
    # a throwing ready_fn is "not ready" (503), never a dropped connection
    srv = HealthServer(
        lambda: {"healthy": True},
        ready_fn=lambda: (_ for _ in ()).throw(RuntimeError("mid-restart")),
    ).start()
    try:
        code, body = _get(srv.port, "/health/ready")
        assert code == 503 and body["status"] == "not_ready"
    finally:
        srv.stop()
