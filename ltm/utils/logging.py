"""Structured logging + stage timing.

Replaces the reference's ad-hoc ANSI ``ROS_INFO_STREAM`` logs and the mostly
disabled ``TicToc`` stopwatch (``ltslam/include/ltslam/tictoc.h:12-47``) with
a standard logger and a context-manager stage timer that records wall-clock
per pipeline stage (keyframes/s observability hooks for the benchmarks).
"""

from __future__ import annotations

import contextlib
import logging
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
    """Context manager: times a pipeline stage and records it globally."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _STAGE_TIMES[stage] = _STAGE_TIMES.get(stage, 0.0) + dt
        (logger or get_logger()).info("stage %-32s %8.3f s", stage, dt)


def stage_times() -> Dict[str, float]:
    return dict(_STAGE_TIMES)


def reset_stage_times() -> None:
    _STAGE_TIMES.clear()
