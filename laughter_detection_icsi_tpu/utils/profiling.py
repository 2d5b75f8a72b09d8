"""Profiling & observability: XLA traces and throughput counters.

The reference has no structured tracing — only ad-hoc wall-clock prints
(reference segment_laughter.py:178-197, train.py:517-535; SURVEY.md §5.1).
Here: a ``jax.profiler`` trace context that any CLI can enable with
``--trace_dir`` (view in TensorBoard/XProf or Perfetto), and a throughput
meter in the unit the north star is measured in, audio-hours/sec/chip.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Iterator, Optional, Tuple


@contextlib.contextmanager
def trace(trace_dir: Optional[str]) -> Iterator[None]:
    """``with trace('/tmp/xprof'):`` captures an XLA device trace (no-op when
    ``trace_dir`` is falsy)."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside an active trace (shows up in the timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@dataclasses.dataclass
class ThroughputMeter:
    """Accumulates (audio seconds processed, wall seconds) and reports the
    north-star metric (BASELINE.json: audio-hours/sec/chip)."""

    n_chips: int = 1
    audio_seconds: float = 0.0
    wall_seconds: float = 0.0
    _t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, audio_seconds: float) -> float:
        """Stop the current span, credit ``audio_seconds``; returns the
        span's realtime factor."""
        assert self._t0 is not None, "stop() without start()"
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self.audio_seconds += audio_seconds
        self.wall_seconds += dt
        return audio_seconds / dt if dt > 0 else float("inf")

    @contextlib.contextmanager
    def span(self, audio_seconds: float) -> Iterator[None]:
        self.start()
        try:
            yield
            self.stop(audio_seconds)
        except BaseException:
            # Body failed: reset without crediting the span, so a later
            # start()/stop() pair doesn't absorb this span's elapsed time.
            self._t0 = None
            raise

    @property
    def x_realtime_per_chip(self) -> float:
        if self.wall_seconds == 0:
            return 0.0
        return self.audio_seconds / self.wall_seconds / self.n_chips

    @property
    def audio_hours_per_sec_per_chip(self) -> float:
        return self.x_realtime_per_chip / 3600.0

    def report(self) -> str:
        return (
            f"{self.audio_seconds / 3600:.2f} audio-h in {self.wall_seconds:.1f}s"
            f" = {self.x_realtime_per_chip:.1f}x realtime/chip"
            f" ({self.audio_hours_per_sec_per_chip:.4f} audio-h/s/chip)"
        )


def epoch_time(start: float, end: float) -> Tuple[int, int]:
    """(minutes, seconds) of an interval (reference utils/torch_utils.py:98-102)."""
    elapsed = end - start
    mins = int(elapsed / 60)
    return mins, int(elapsed - mins * 60)
