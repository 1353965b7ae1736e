"""Structured logging + stage timing.

Replaces the reference's ad-hoc ANSI ``ROS_INFO_STREAM`` logs and the mostly
disabled ``TicToc`` stopwatch (``ltslam/include/ltslam/tictoc.h:12-47``) with
a standard logger and a context-manager stage timer that records wall-clock
per pipeline stage (keyframes/s observability hooks for the benchmarks).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Dict, Optional

_STAGE_TIMES: Dict[str, float] = {}
_STAGE_STACK: list = []
_SLOT_COUNTS: Dict[str, int] = {}  # map-slots touched per stage (roofline)


def current_stage() -> str:
    return _STAGE_STACK[-1] if _STAGE_STACK else "<none>"


def count_slots(n: int) -> None:
    """Accumulate ``n`` map-slot touches (scatter/gather elements) against
    the innermost active stage — host-side integers only, no device cost.
    The per-stage totals feed the roofline table (slots x measured
    ns/slot ceiling vs stage wall; see tools/roofline.py)."""
    s = current_stage()
    _SLOT_COUNTS[s] = _SLOT_COUNTS.get(s, 0) + int(n)


def slot_counts() -> Dict[str, int]:
    return dict(_SLOT_COUNTS)


def reset_slot_counts() -> None:
    _SLOT_COUNTS.clear()


def get_logger(name: str = "ltm") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("[%(asctime)s %(name)s %(levelname)s] %(message)s", "%H:%M:%S"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


@contextlib.contextmanager
def stage_timer(stage: str, logger: Optional[logging.Logger] = None):
    """Context manager: times a pipeline stage and records it globally.

    Stage boundaries do NOT force device sync (stages overlap under the
    async backend, keeping the pipeline fast); set LTM_SYNC_STAGES=1 to
    drain all device work at each boundary for accurate attribution when
    profiling (totals then exceed the async end-to-end wall clock).
    """
    sync = os.environ.get("LTM_SYNC_STAGES") == "1"
    if sync:
        _drain_devices()
    t0 = time.perf_counter()
    _STAGE_STACK.append(stage)
    try:
        yield
    finally:
        _STAGE_STACK.pop()
        if sync:
            _drain_devices()
        dt = time.perf_counter() - t0
        _STAGE_TIMES[stage] = _STAGE_TIMES.get(stage, 0.0) + dt
        (logger or get_logger()).info("stage %-32s %8.3f s", stage, dt)


def _drain_devices() -> None:
    import jax
    import jax.numpy as jnp

    try:
        # in-order barrier at ONE host round-trip PER DEVICE: a tiny
        # program enqueued behind all outstanding work on each local
        # device, its result fetched (a TPU executes one program at a time
        # in enqueue order, so the fetch returns only once that device's
        # queue has drained).  Per-array block_until_ready over thousands
        # of live buffers costs a round trip EACH on the tunnel-attached
        # dev chip (measured ~60 s per drain mid-pipeline) — and returns
        # early on the remote-execution backend anyway; the fetch does
        # not.  On mesh runs every local device gets its own probe so
        # sharded-stage walls attribute correctly (single-probe drains
        # only covered the default device's queue).
        devs = jax.local_devices()
        probes = [jax.device_put(jnp.ones((1,), jnp.float32), d) for d in devs]
        sums = [jnp.sum(p) for p in probes]
        for s in sums:
            float(s)
    except Exception:  # pragma: no cover — profiling aid only
        pass


def stage_times() -> Dict[str, float]:
    return dict(_STAGE_TIMES)


def reset_stage_times() -> None:
    _STAGE_TIMES.clear()
