"""Tracing / profiling / memory observability (SURVEY.md section 5.1).

The reference's only observability is ``mem_report()`` — CPU/GPU free-memory
prints at four pipeline milestones (CLIP-DDPM.py:31-38,223,447,563). This
module provides the TPU equivalents plus what the reference lacks:

  * ``mem_report(tag)`` — host memory + per-device HBM stats at a milestone;
  * ``trace(dir)`` — a jax.profiler trace context manager (view in
    TensorBoard / xprof);
  * ``StepTimer`` — rolling per-step wall-time stats for the train loop;
  * ``debug_nans(on)`` — toggles jax's NaN checker (SURVEY.md section 5.2's
    "sanitizer" equivalent), flag-gated because it forces synchronous
    dispatch.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


def mem_report(tag: str = "", printer=print) -> dict:
    """Host + device memory snapshot, printed and returned."""
    out: dict = {"tag": tag}
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    out["host_available_kb"] = int(line.split()[1])
                    printer(
                        f"[mem:{tag}] host available: "
                        f"{out['host_available_kb'] // 1024} MB"
                    )
                    break
    except OSError:
        pass
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            used = s.get("bytes_in_use", 0)
            limit = s.get("bytes_limit", 0)
            peak = s.get("peak_bytes_in_use", 0)
            out[str(d)] = {"bytes_in_use": used, "bytes_limit": limit, "peak": peak}
            printer(
                f"[mem:{tag}] {d}: {used / 2**20:.0f} MB used"
                f" / {limit / 2**20:.0f} MB (peak {peak / 2**20:.0f} MB)"
            )
    return out


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timing: call ``tick()`` once per optimizer step."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.count += 1
            if self.count > self.warmup:
                self.total += now - self._last
        self._last = now

    def pause(self) -> None:
        """Drop the pending interval: the next tick starts a fresh one.
        Call at epoch boundaries so validation/checkpoint time between
        train steps doesn't pollute the step-rate estimate."""
        self._last = None

    def drain(self, value=None) -> None:
        """Block until ``value`` (the last dispatched step's outputs) is
        ready, charge the wait to the accumulated step time, then pause.

        REQUIRED before reading ``steps_per_sec`` when steps are
        dispatched asynchronously (jax.jit): plain ticks then measure
        host ENQUEUE rate, not device step rate — the queued device work
        all drains here. (Found via the checked-in run log recording
        228 'steps/s' for a run bench.py measures at ~20.)"""
        if value is not None:
            jax.block_until_ready(value)
        now = time.perf_counter()
        if self._last is not None and self.count > self.warmup:
            self.total += now - self._last
        self._last = None

    @property
    def steps_per_sec(self) -> float:
        timed = self.count - self.warmup
        return timed / self.total if timed > 0 and self.total > 0 else 0.0


class StallWatchdog:
    """Detects a wedged training loop and says so on stderr.

    Motivated by a real incident (2026-08-17): a 192-epoch run froze
    mid-run — the host thread futex-waiting forever on a remote device
    result — and was silent for 15 minutes until noticed externally. A
    daemon thread checks the gap since the last ``poke()``; past
    ``timeout_s`` it emits a warning (and re-emits once per further
    timeout while the stall persists, so a log tail shows it clearly).

    It cannot unblock the device call — JAX offers no cancellation — but
    it turns an invisible hang into an actionable message (kill the
    process; ``continue_train`` resumes from the last checkpoint).

    ``timeout_s <= 0`` disables (``start()`` becomes a no-op); the train
    loop reads the ``DIC_STALL_TIMEOUT_S`` env var (default 600).
    """

    def __init__(self, timeout_s: float = 600.0, label: str = "train",
                 emit=None):
        import sys
        import threading

        self.timeout = float(timeout_s)
        self.label = label
        self._emit = emit or (
            lambda msg: print(msg, file=sys.stderr, flush=True)
        )
        self._threading = threading
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread = None
        self.stall_count = 0

    def start(self) -> "StallWatchdog":
        if self.timeout <= 0 or self._thread is not None:
            return self
        self._stop.clear()
        self._thread = self._threading.Thread(target=self._watch, daemon=True)
        self._thread.start()
        return self

    def poke(self) -> None:
        self._last = time.monotonic()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def _watch(self) -> None:
        warned_gap = 0.0
        poll = min(self.timeout / 4, 10.0)
        while not self._stop.wait(poll):
            gap = time.monotonic() - self._last
            if gap < self.timeout:
                warned_gap = 0.0
            elif gap >= warned_gap + self.timeout:
                warned_gap = gap
                self.stall_count += 1
                self._emit(
                    f"WARNING: {self.label} loop has made no progress for "
                    f"{gap:.0f} s — a device call is likely wedged (remote "
                    f"tunnel). Kill this process and resume from the last "
                    f"checkpoint (continue_train)."
                )


def debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
