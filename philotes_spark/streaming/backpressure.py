"""Backpressure controller (SURVEY §2A A24) — observable depth gauge +
pause/resume hysteresis, mirroring the reference's semantics
(``internal/cdc/pipeline/backpressure.go:26-33`` defaults 8000/5000,
``:101-165`` check loop).

In Spark the hard rate limiting already lives at the source
(``maxFilesPerTrigger`` / ``maxLsnPerBatch``); what the reference adds on
top — and what round 1 lacked — is the *observable* control loop: a
buffer-depth gauge, explicit pause/resume transitions at the watermarks,
and stats (pause counts, last depth) surfaced through pipeline health.

The depth function is injectable like the reference's ``BufferSizeFunc``:
for the file/WAL sources the natural depth is the unprocessed backlog
(rows or LSN distance between what's on disk and what the last batch
committed). ``check()`` is a synchronous tick — callers decide cadence
(the reference uses a 1 s ticker; tests tick it directly).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class BackpressureConfig:
    """Defaults mirror DefaultBackpressureConfig (backpressure.go:26-33)."""

    enabled: bool = True
    high_watermark: int = 8000
    low_watermark: int = 5000
    check_interval_s: float = 1.0

    def __post_init__(self) -> None:
        if self.low_watermark > self.high_watermark:
            raise ValueError("low_watermark must be <= high_watermark")


@dataclass
class BackpressureStats:
    is_paused: bool = False
    paused_at: float = 0.0
    resumed_at: float = 0.0
    pause_count: int = 0
    resume_count: int = 0
    last_size: int = 0
    history: list = field(default_factory=list)  # (ts, event, size)


class BackpressureController:
    """Hysteresis: pause when depth > high, resume when depth < low; the
    dead band between the watermarks prevents flapping
    (backpressure.go:118-138)."""

    def __init__(self, config, get_size, pause, resume) -> None:
        self.config = config
        self.get_size = get_size
        self._pause = pause
        self._resume = resume
        self.stats = BackpressureStats()

    def check(self) -> str:
        """One control tick. Returns the action taken:
        'paused' | 'resumed' | 'noop'."""
        if not self.config.enabled:
            return "noop"
        size = int(self.get_size())
        self.stats.last_size = size
        now = time.time()
        if not self.stats.is_paused and size > self.config.high_watermark:
            self._pause()
            self.stats.is_paused = True
            self.stats.paused_at = now
            self.stats.pause_count += 1
            self.stats.history.append((now, "pause", size))
            return "paused"
        if self.stats.is_paused and size < self.config.low_watermark:
            self._resume()
            self.stats.is_paused = False
            self.stats.resumed_at = now
            self.stats.resume_count += 1
            self.stats.history.append((now, "resume", size))
            return "resumed"
        return "noop"


def file_backlog_depth(source_dir: str, processed_files: set[str]):
    """A depth gauge for the file source: files on disk not yet committed
    by the stream (the buffer-row-count analogue, sized in files because
    that is the file source's admission unit)."""
    import os

    def depth() -> int:
        if not os.path.isdir(source_dir):
            return 0
        return sum(
            1 for f in os.listdir(source_dir)
            if f not in processed_files and not f.startswith(("_", "."))
        )

    return depth
