"""Query-engine scaling policy + idle detection/wake (SURVEY §2A A30/A31).

The reference runs these as control loops against Trino's ``/v1/cluster``
and a Kubernetes scaler (``internal/scaling/query/policy.go:67-231``,
``internal/scaling/idle/detector.go:64-140``,
``internal/scaling/wake/trigger.go:120-300``). On a Spark cluster the
*executor* side of this is built in (``spark.dynamicAllocation.*`` +
cluster autoscaler — SURVEY maps A29/A30 there); what remains engine-side
is the DECISION LOGIC, implemented here as pure, injectable state
machines so the policies are testable and the semantics are parity-exact:

- :class:`QueryScalingEvaluator` — scale up one step when queued ≥ τq OR
  running ≥ τr OR p95 ≥ τlat; scale down one step when BOTH queued and
  running sit below half their thresholds (floor division, as the
  reference: τ=5 → down only under 2); scale to zero only when the
  cluster is fully quiet; every action starts a cooldown that suppresses
  further decisions.
- :class:`IdleDetector` — tracks continuous inactivity per policy;
  after ``idle_timeout_s`` of zero activity the policy is eligible for
  scale-to-zero. Activity resets the clock.
- :class:`WakeTrigger` — wake a scaled-to-zero engine on demand: no-op
  if already running, otherwise request min replicas through the
  injected executor and track the pending operation against a cold-start
  timeout.

No wall-clock reads inside the logic — callers pass ``now`` (seconds),
so behavior is deterministic under test and under replay.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ClusterStats:
    """One poll of the query engine (collector.go:55-137 shape)."""

    queued: int = 0
    running: int = 0
    blocked: int = 0
    workers: int = 0
    p95_latency_ms: float | None = None


@dataclass
class ScalingPolicy:
    """policy.go defaults: queued ≥ 5, running ≥ 10, p95 ≥ 30 s,
    cooldown 300 s (internal/config/config.go:917-926)."""

    queued_threshold: int = 5
    running_threshold: int = 10
    latency_threshold_s: float = 30.0
    cooldown_s: float = 300.0
    min_replicas: int = 1
    max_replicas: int = 10
    scale_to_zero: bool = False
    enabled: bool = True


@dataclass
class ScaleDecision:
    action: str  # scale_up | scale_down | scale_to_zero | none
    current_replicas: int
    desired_replicas: int
    reason: str
    trigger_value: float | None = None


class QueryScalingEvaluator:
    """A30 decision logic (policy.go:67-231), one policy instance."""

    def __init__(self, policy: ScalingPolicy) -> None:
        self.policy = policy
        self._last_action_ts: float | None = None

    def evaluate(
        self, stats: ClusterStats | None, current_replicas: int, now: float
    ) -> ScaleDecision:
        p = self.policy

        def hold(reason: str) -> ScaleDecision:
            return ScaleDecision("none", current_replicas, current_replicas, reason)

        if not p.enabled:
            return hold("policy disabled")
        if (
            self._last_action_ts is not None
            and now - self._last_action_ts < p.cooldown_s
        ):
            return hold("in cooldown")
        if stats is None:
            return hold("no metrics available")

        up = self._scale_up(stats, current_replicas)
        if up is not None:
            self._last_action_ts = now
            return up
        down = self._scale_down(stats, current_replicas)
        if down is not None:
            self._last_action_ts = now
            return down
        return hold("within thresholds")

    def _scale_up(self, s: ClusterStats, cur: int) -> ScaleDecision | None:
        p = self.policy
        if cur >= p.max_replicas:
            return None
        desired = min(cur + 1, p.max_replicas)
        if s.queued >= p.queued_threshold:
            return ScaleDecision(
                "scale_up", cur, desired,
                f"queued_queries >= {p.queued_threshold}", float(s.queued),
            )
        if s.running >= p.running_threshold:
            return ScaleDecision(
                "scale_up", cur, desired,
                f"running_queries >= {p.running_threshold}", float(s.running),
            )
        if s.p95_latency_ms is not None and p.latency_threshold_s > 0:
            if s.p95_latency_ms >= p.latency_threshold_s * 1000:
                return ScaleDecision(
                    "scale_up", cur, desired,
                    f"p95_latency >= {int(p.latency_threshold_s * 1000)}ms",
                    s.p95_latency_ms,
                )
        return None

    def _scale_down(self, s: ClusterStats, cur: int) -> ScaleDecision | None:
        p = self.policy
        if cur <= p.min_replicas and not p.scale_to_zero:
            return None
        # floor division intentionally (policy.go:198-201): threshold 5
        # scales down only under 2 — significant load reduction required
        if not (s.queued < p.queued_threshold // 2 and s.running < p.running_threshold // 2):
            return None
        if p.scale_to_zero and s.queued == 0 and s.running == 0 and s.blocked == 0:
            return ScaleDecision(
                "scale_to_zero", cur, 0, "no active queries", 0.0
            )
        if cur > p.min_replicas:
            return ScaleDecision(
                "scale_down", cur, max(cur - 1, p.min_replicas),
                "low query load", float(s.running),
            )
        return None


# --- A31: idle detection + wake ---------------------------------------------


@dataclass
class IdleState:
    last_activity_ts: float
    idle_since: float | None = None


class IdleDetector:
    """Tracks continuous inactivity per policy (detector.go:64-140).
    ``observe`` is the poll tick; activity (any queued/running/blocked
    query) resets the clock."""

    def __init__(self, idle_timeout_s: float = 1800.0) -> None:
        self.idle_timeout_s = idle_timeout_s
        self._states: dict[str, IdleState] = {}

    def observe(self, policy_id: str, stats: ClusterStats, now: float) -> float:
        """Update the policy's idle clock; returns current idle seconds."""
        active = stats.queued > 0 or stats.running > 0 or stats.blocked > 0
        st = self._states.setdefault(policy_id, IdleState(last_activity_ts=now))
        if active:
            st.last_activity_ts = now
            st.idle_since = None
            return 0.0
        if st.idle_since is None:
            st.idle_since = st.last_activity_ts
        return now - st.idle_since

    def should_scale_to_zero(self, policy_id: str, now: float) -> bool:
        st = self._states.get(policy_id)
        if st is None or st.idle_since is None:
            return False
        return now - st.idle_since >= self.idle_timeout_s

    def mark_woken(self, policy_id: str, now: float) -> None:
        self._states[policy_id] = IdleState(last_activity_ts=now)


@dataclass
class WakeResult:
    status: str  # completed | in_progress | failed
    previous_replicas: int
    target_replicas: int
    message: str


class WakeTrigger:
    """On-demand wake for a scaled-to-zero engine (trigger.go:120-300).
    ``scale_fn(target) -> None`` is the injected executor (the reference
    calls Kubernetes; a Spark deployment requests executors)."""

    def __init__(
        self,
        scale_fn,
        idle_detector: IdleDetector | None = None,
        default_replicas: int = 1,
        cold_start_timeout_s: float = 120.0,
    ) -> None:
        self.scale_fn = scale_fn
        self.idle_detector = idle_detector
        self.default_replicas = default_replicas
        self.cold_start_timeout_s = cold_start_timeout_s
        self.pending: dict[str, float] = {}  # policy_id → wake deadline

    def wake(
        self,
        policy_id: str,
        policy: ScalingPolicy,
        current_replicas: int,
        now: float,
    ) -> WakeResult:
        if current_replicas > 0:
            return WakeResult(
                "completed", current_replicas, current_replicas,
                "Policy is already running",
            )
        target = policy.min_replicas if policy.min_replicas > 0 else self.default_replicas
        try:
            self.scale_fn(target)
        except Exception as exc:
            return WakeResult("failed", 0, target, f"Failed to wake policy: {exc}")
        self.pending[policy_id] = now + self.cold_start_timeout_s
        if self.idle_detector is not None:
            self.idle_detector.mark_woken(policy_id, now)
        return WakeResult("in_progress", 0, target, "Wake requested")

    def check_pending(self, policy_id: str, workers_up: int, now: float) -> str | None:
        """completed | timed_out | None (still waiting / nothing pending)."""
        deadline = self.pending.get(policy_id)
        if deadline is None:
            return None
        if workers_up > 0:
            del self.pending[policy_id]
            return "completed"
        if now > deadline:
            del self.pending[policy_id]
            return "timed_out"
        return None
