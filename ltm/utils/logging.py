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
    try:
        yield
    finally:
        if sync:
            _drain_devices()
        dt = time.perf_counter() - t0
        _STAGE_TIMES[stage] = _STAGE_TIMES.get(stage, 0.0) + dt
        (logger or get_logger()).info("stage %-32s %8.3f s", stage, dt)


def _drain_devices() -> None:
    import jax

    try:
        for d in jax.live_arrays():
            d.block_until_ready()
    except Exception:  # pragma: no cover — profiling aid only
        pass


def stage_times() -> Dict[str, float]:
    return dict(_STAGE_TIMES)


def reset_stage_times() -> None:
    _STAGE_TIMES.clear()
