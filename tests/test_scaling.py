"""A30/A31 scaling decision logic: threshold/cooldown/scale-to-zero parity
with internal/scaling/query/policy.go:67-231, idle tracking with
detector.go:64-140, wake with trigger.go:120-300. Pure state machines —
no Spark session needed."""

import pytest

from philotes_spark.scaling import (
    ClusterStats,
    IdleDetector,
    QueryScalingEvaluator,
    ScalingPolicy,
    WakeTrigger,
)


def ev(**kw):
    return QueryScalingEvaluator(ScalingPolicy(**kw))


# --- A30 evaluator -----------------------------------------------------------


def test_scale_up_on_each_trigger():
    for stats, reason in [
        (ClusterStats(queued=5), "queued_queries"),
        (ClusterStats(running=10), "running_queries"),
        (ClusterStats(p95_latency_ms=30_000.0), "p95_latency"),
    ]:
        d = ev().evaluate(stats, current_replicas=2, now=0.0)
        assert d.action == "scale_up" and d.desired_replicas == 3, reason
        assert reason in d.reason


def test_scale_up_capped_at_max():
    d = ev(max_replicas=3).evaluate(ClusterStats(queued=99), 3, now=0.0)
    assert d.action == "none" and d.reason == "within thresholds"


def test_scale_down_needs_both_below_half():
    # thresholds 5/10 → halves 2/5 (floor). queued=2 is NOT below half.
    e = ev()
    assert e.evaluate(ClusterStats(queued=2, running=1), 4, 0.0).action == "none"
    d = ev().evaluate(ClusterStats(queued=1, running=4), 4, 0.0)
    assert d.action == "scale_down" and d.desired_replicas == 3


def test_scale_down_respects_min():
    d = ev(min_replicas=2).evaluate(ClusterStats(), 2, now=0.0)
    assert d.action == "none"  # at min, scale_to_zero off


def test_scale_to_zero_only_when_fully_quiet():
    # min_replicas=1: a blocked query holds the engine at min instead of
    # zeroing it (blocked gates ONLY the scale-to-zero branch)
    e = ev(scale_to_zero=True, min_replicas=1)
    assert e.evaluate(ClusterStats(blocked=1), 1, 0.0).action == "none"
    d = e.evaluate(ClusterStats(), 1, 1000.0)
    assert d.action == "scale_to_zero" and d.desired_replicas == 0


def test_cooldown_suppresses_next_action():
    e = ev(cooldown_s=300)
    assert e.evaluate(ClusterStats(queued=9), 1, now=0.0).action == "scale_up"
    d = e.evaluate(ClusterStats(queued=9), 2, now=100.0)
    assert d.action == "none" and d.reason == "in cooldown"
    assert e.evaluate(ClusterStats(queued=9), 2, now=301.0).action == "scale_up"


def test_disabled_and_missing_metrics():
    assert ev(enabled=False).evaluate(ClusterStats(queued=9), 1, 0.0).reason == "policy disabled"
    assert ev().evaluate(None, 1, 0.0).reason == "no metrics available"


# --- A31 idle detector -------------------------------------------------------


def test_idle_clock_accumulates_and_resets():
    d = IdleDetector(idle_timeout_s=600)
    assert d.observe("p1", ClusterStats(running=1), now=0.0) == 0.0
    assert d.observe("p1", ClusterStats(), now=100.0) == 100.0
    assert d.observe("p1", ClusterStats(), now=500.0) == 500.0
    assert not d.should_scale_to_zero("p1", now=500.0)
    assert d.should_scale_to_zero("p1", now=601.0)
    # activity resets
    d.observe("p1", ClusterStats(queued=1), now=700.0)
    assert not d.should_scale_to_zero("p1", now=9999.0) or d.observe(
        "p1", ClusterStats(), now=9999.0
    ) < 600


def test_wake_noop_when_running():
    t = WakeTrigger(scale_fn=lambda n: None)
    r = t.wake("p1", ScalingPolicy(), current_replicas=3, now=0.0)
    assert r.status == "completed" and r.target_replicas == 3


def test_wake_requests_min_replicas_and_tracks_cold_start():
    calls = []
    det = IdleDetector()
    det.observe("p1", ClusterStats(), now=0.0)
    t = WakeTrigger(scale_fn=calls.append, idle_detector=det, cold_start_timeout_s=120)
    r = t.wake("p1", ScalingPolicy(min_replicas=2), current_replicas=0, now=10.0)
    assert r.status == "in_progress" and calls == [2]
    assert t.check_pending("p1", workers_up=0, now=50.0) is None  # still booting
    assert t.check_pending("p1", workers_up=2, now=60.0) == "completed"
    # idle clock was reset by the wake
    assert det.observe("p1", ClusterStats(), now=60.0) < 60


def test_wake_cold_start_timeout():
    t = WakeTrigger(scale_fn=lambda n: None, cold_start_timeout_s=120)
    t.wake("p1", ScalingPolicy(), 0, now=0.0)
    assert t.check_pending("p1", workers_up=0, now=121.0) == "timed_out"
    assert t.check_pending("p1", workers_up=0, now=122.0) is None  # cleared


def test_wake_failure_reported():
    def boom(n):
        raise RuntimeError("k8s down")

    t = WakeTrigger(scale_fn=boom)
    r = t.wake("p1", ScalingPolicy(), 0, now=0.0)
    assert r.status == "failed" and "k8s down" in r.message
