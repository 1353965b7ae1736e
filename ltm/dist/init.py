"""Multi-host initialization for pod-slice runs.

Single-host multi-chip needs nothing; across hosts, call
:func:`initialize_multihost` once per process before any jax op (wraps
``jax.distributed.initialize``; coordinates are taken from the standard env
vars or passed explicitly).  The keyframe/factor shardings in ``ltm.dist``
then span the global device set, with psum/all_gather riding ICI within a
slice and DCN across hosts.
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["initialize_multihost", "is_multihost"]

_initialized = False


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Idempotent ``jax.distributed.initialize`` wrapper.

    Returns True when running as part of a multi-process job (and
    initialization happened), False for single-process runs.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get("LTM_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("LTM_NUM_PROCESSES", "1"))
    if num_processes <= 1 and not coordinator_address:
        return False

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id if process_id is not None else int(os.environ.get("LTM_PROCESS_ID", "0")),
    )
    _initialized = True
    return True


def is_multihost() -> bool:
    import jax

    return jax.process_count() > 1
