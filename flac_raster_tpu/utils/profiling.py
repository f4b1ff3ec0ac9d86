"""Per-stage timers, throughput counters, and jax.profiler integration.

The reference has no tracing at all (SURVEY.md §5 -- only ad-hoc time.time()
deltas in one integration test); this module is the rebuild's first-class
observability layer:

  * ``StageTimer`` -- nested named stages with wall time and MB/s, logged
    through the package logger and queryable as a dict (the bench harness
    and the converter's verbose mode both use it).
  * ``device_trace`` -- context manager around ``jax.profiler.trace`` for
    capturing TensorBoard-viewable TPU traces of the encode pipeline.

Costs nothing when disabled: the default StageTimer is a no-op unless
explicitly enabled or the package logger is at DEBUG.
"""

from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field

logger = logging.getLogger("flac_raster_tpu.profiling")

__all__ = ["StageTimer", "device_trace", "timed_stage"]


@dataclass
class StageRecord:
    name: str
    seconds: float
    bytes: int = 0

    @property
    def mb_per_s(self) -> float:
        return self.bytes / 1e6 / self.seconds if self.seconds > 0 else 0.0


@dataclass
class StageTimer:
    """Collects (stage, seconds, MB/s) records.

    Usage::

        timer = StageTimer(enabled=True)
        with timer.stage("normalize", nbytes=data.nbytes):
            ...
        timer.report()   # logs one line per stage
    """

    enabled: bool = False
    records: list[StageRecord] = field(default_factory=list)

    @contextlib.contextmanager
    def stage(self, name: str, nbytes: int = 0):
        if not self.enabled:
            yield self
            return
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            dt = time.perf_counter() - t0
            rec = StageRecord(name, dt, nbytes)
            self.records.append(rec)
            if nbytes:
                logger.debug("%s: %.3fs (%.1f MB/s)", name, dt, rec.mb_per_s)
            else:
                logger.debug("%s: %.3fs", name, dt)

    def as_dict(self) -> dict[str, dict[str, float]]:
        return {
            r.name: {"seconds": r.seconds, "mb_per_s": r.mb_per_s}
            for r in self.records
        }

    def total_seconds(self) -> float:
        return sum(r.seconds for r in self.records)

    def report(self, level: int = logging.INFO) -> None:
        for r in self.records:
            if r.bytes:
                logger.log(level, "%-20s %8.3fs %10.1f MB/s", r.name, r.seconds, r.mb_per_s)
            else:
                logger.log(level, "%-20s %8.3fs", r.name, r.seconds)


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """Capture a jax.profiler trace (TensorBoard format) when log_dir given."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
    logger.info("device trace written to %s", log_dir)


@contextlib.contextmanager
def timed_stage(name: str, nbytes: int = 0, level: int = logging.DEBUG):
    """Standalone one-shot stage timer (module-logger output)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if nbytes:
            logger.log(level, "%s: %.3fs (%.1f MB/s)", name, dt, nbytes / 1e6 / max(dt, 1e-9))
        else:
            logger.log(level, "%s: %.3fs", name, dt)


def restore_cpu_affinity() -> int:
    """Undo the axon TPU client's 1-core CPU pinning.

    The tunneled-TPU PJRT plugin pins the whole process to a single core at
    init (observed: ``len(os.sched_getaffinity(0)) == 1`` after first device
    use), which slows every host-side numpy stage 5-20x.  Called at the top
    of the hot host entry points; a no-op elsewhere.  Returns the number of
    usable CPUs afterwards.
    """
    import os

    try:
        have = os.sched_getaffinity(0)
        total = os.cpu_count() or 1
        if len(have) < total:
            os.sched_setaffinity(0, range(total))
            logger.debug("restored CPU affinity: %d -> %d cores", len(have), total)
        return len(os.sched_getaffinity(0))
    except (AttributeError, OSError):  # pragma: no cover - non-Linux
        return 1


_tamed = False


_protected_tids: set[int] = set()


def protect_current_thread() -> None:
    """Exclude the calling thread from tame_device_client_threads' renice.

    Framework pipeline workers (e.g. the device encoder's upload stager)
    call this first thing so they are not deprioritized alongside the
    device client's busy-poll spinners; also resets the thread's priority
    in case a renice raced its registration.
    """
    import os
    import threading

    _protected_tids.add(threading.get_native_id())
    try:
        os.setpriority(os.PRIO_PROCESS, threading.get_native_id(), 0)
    except OSError:  # pragma: no cover - best-effort
        pass


def tame_device_client_threads() -> int:
    """Deprioritize the TPU client's busy-polling threads on tiny hosts.

    The tunneled-TPU (axon) PJRT client spins several threads that saturate
    the core even while the device is idle; on a 1-CPU container that slows
    every host numpy stage 10-100x (measured: 0.4s -> 69s for one normalize
    pass).  Renicing those threads to 19 restores host throughput while the
    spinners still get the core whenever Python blocks on a transfer.

    Re-applied on every hot entry point (microseconds) because the client
    spawns threads lazily; only active when the host has a single CPU and a
    non-CPU jax backend -- on real multi-core hosts the client threads are
    harmless.  Returns the number of threads reniced.
    """
    import os

    try:
        if (os.cpu_count() or 1) > 1:
            return 0
        import jax

        if jax.default_backend() == "cpu":
            return 0
        import threading

        me = threading.get_native_id()
        n = 0
        for tid_s in os.listdir("/proc/self/task"):
            tid = int(tid_s)
            # skip the framework's own registered pipeline workers (upload
            # staging etc.) -- only the client's spinners should yield.
            # (An OS-comm check does not work here: CPython only names OS
            # threads from 3.14.)
            if tid == me or tid in _protected_tids:
                continue
            try:
                os.setpriority(os.PRIO_PROCESS, tid, 19)
                n += 1
            except OSError:
                pass
        _disable_thp()
        global _tamed
        if n and not _tamed:
            _tamed = True
            logger.debug("reniced %d device-client threads to 19", n)
        return n
    except Exception:  # pragma: no cover - scheduling is best-effort
        return 0


_thp_disabled = False


def _disable_thp() -> None:
    """Disable transparent hugepages for this process (PR_SET_THP_DISABLE).

    With the TPU client resident, first-touch faults on large numpy buffers
    stall in THP compaction on this kernel (measured: 19-40s of CPU for one
    134MB normalize pass vs 0.8s with THP off).  Per-process prctl keeps the
    fix scoped -- no system state is touched.
    """
    global _thp_disabled
    if _thp_disabled:
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        if libc.prctl(41, 1, 0, 0, 0) == 0:  # PR_SET_THP_DISABLE
            _thp_disabled = True
            logger.debug("transparent hugepages disabled for this process")
    except Exception:  # pragma: no cover
        pass
