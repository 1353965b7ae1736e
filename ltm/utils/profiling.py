"""Profiling hooks: XLA traces + stage wall-clock.

Replaces the reference's ``TicToc`` stopwatch (mostly disabled,
``ltslam/include/ltslam/tictoc.h``) with ``jax.profiler`` traces viewable in
TensorBoard/Perfetto plus the stage timers in ``ltm.utils.logging``.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture an XLA profiler trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
