"""Test harness config: force CPU with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual CPU mesh (no pod
needed), per the project test strategy (SURVEY.md §4).

Note: the environment's sitecustomize registers an experimental remote-TPU
PJRT plugin ("axon") at interpreter boot and pre-imports jax, so env vars
are too late here — we must override via ``jax.config`` and deregister the
remote platform factory before the first backend initialization (otherwise
the first host transfer stalls for minutes initializing the tunnel).
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # pragma: no cover - older jax
    pass

# persistent compilation cache, shared across xdist workers and runs: the
# suite re-compiles the same pipeline kernels in several files (removert,
# dist, cli, lifelong) — the file cache turns all but the first into loads
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax._src.xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8, devs
    return devs
