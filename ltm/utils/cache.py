"""Persistent XLA compilation cache.

Pipeline kernels take tens of seconds to minutes to compile per shape; the
CLIs enable JAX's persistent cache so repeat runs (and the LT-SLAM →
LT-removert chain) skip recompilation.  Opt out with LTM_COMPILE_CACHE=0.
"""

from __future__ import annotations

import os


def enable_compilation_cache(directory: str | None = None) -> bool:
    if os.environ.get("LTM_COMPILE_CACHE", "1") == "0":
        return False
    import jax

    directory = directory or os.environ.get(
        "LTM_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "ltm-jax"),
    )
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    return True
