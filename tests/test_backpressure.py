"""A24 backpressure: depth gauge + pause/resume hysteresis at the
reference watermarks (backpressure.go:26-33 defaults 8000/5000,
:101-165 control loop). Pure control-plane unit tests — no Spark query
needed to pin the transition semantics.
"""

import pytest

from philotes_spark.streaming.backpressure import (
    BackpressureConfig,
    BackpressureController,
    file_backlog_depth,
)
from philotes_spark.streaming.ingest import CdcIngestPipeline, IngestConfig


class _Target:
    def __init__(self):
        self.calls = []

    def pause(self):
        self.calls.append("pause")

    def resume(self):
        self.calls.append("resume")


def _controller(target, depth_values):
    it = iter(depth_values)
    return BackpressureController(
        BackpressureConfig(), lambda: next(it), target.pause, target.resume
    )


def test_hysteresis_at_reference_watermarks():
    t = _Target()
    # climb through the dead band, over high, sink back through it, under low
    c = _controller(t, [4000, 7000, 8001, 9000, 6000, 5500, 4999])
    actions = [c.check() for _ in range(7)]
    assert actions == [
        "noop",   # 4000 below both
        "noop",   # 7000 in dead band, not paused -> stay running
        "paused",  # 8001 > high
        "noop",   # 9000 already paused
        "noop",   # 6000 in dead band, paused -> stay paused (no flap)
        "noop",   # 5500 still >= low
        "resumed",  # 4999 < low
    ]
    assert t.calls == ["pause", "resume"]
    assert c.stats.pause_count == 1 and c.stats.resume_count == 1
    assert c.stats.last_size == 4999


def test_disabled_controller_never_acts():
    t = _Target()
    c = BackpressureController(
        BackpressureConfig(enabled=False), lambda: 10**9, t.pause, t.resume
    )
    assert c.check() == "noop" and t.calls == []


def test_invalid_watermarks_rejected():
    with pytest.raises(ValueError):
        BackpressureConfig(high_watermark=100, low_watermark=200)


def test_file_backlog_depth(tmp_path):
    d = tmp_path / "feed"
    d.mkdir()
    for name in ("a.parquet", "b.parquet", "_SUCCESS", ".hidden"):
        (d / name).touch()
    depth = file_backlog_depth(str(d), processed_files={"a.parquet"})
    assert depth() == 1  # only b.parquet is unprocessed visible data


def test_pipeline_wiring_and_health(spark, tmp_path):
    cfg = IngestConfig(
        source_dir=str(tmp_path / "feed"),
        lake_dir=str(tmp_path / "lake"),
        checkpoint_dir=str(tmp_path / "ck"),
        dlq_dir=str(tmp_path / "dlq"),
    )
    p = CdcIngestPipeline(spark, cfg)
    # avoid starting a real streaming query here (the E2E restart path is
    # covered in test_streaming_ingest): resume just drives the state
    # machine, exactly what the controller contract needs
    p.resume = lambda: p.state.transition("running")
    depths = iter([9000, 9000, 100])
    bp = p.attach_backpressure(lambda: next(depths))
    p.state.state = "running"
    assert bp.check() == "paused"
    assert p.state.state == "paused"
    assert p.health()["backpressure"]["is_paused"] is True
    assert bp.check() == "noop"
    assert bp.check() == "resumed"
    assert p.state.state == "running"
    h = p.health()["backpressure"]
    assert h["pause_count"] == 1 and h["resume_count"] == 1
