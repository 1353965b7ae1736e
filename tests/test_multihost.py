"""Two-process ``jax.distributed`` bring-up of ``initialize_multihost``.

The pod-slice path (``ltm.dist.init``) must actually initialize a
multi-process runtime and run a cross-process collective — exercised here
with two CPU subprocesses on localhost (the same wrapper call a TPU pod
worker makes; only the transport differs).
"""

import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax._src.xla_bridge as _xb
    _xb._backend_factories.pop("axon", None)

    from ltm.dist.init import initialize_multihost, is_multihost

    coord, pid = sys.argv[1], int(sys.argv[2])
    ok = initialize_multihost(coordinator_address=coord, num_processes=2,
                              process_id=pid)
    assert ok, "initialize_multihost returned False for a 2-process job"
    assert jax.process_count() == 2, jax.process_count()
    assert is_multihost()

    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    import numpy as np

    mesh = Mesh(np.array(jax.devices()), ("kf",))
    n_dev = len(jax.devices())

    def local(x):
        return jax.lax.psum(x, "kf")

    fn = shard_map(local, mesh=mesh, in_specs=P("kf"), out_specs=P("kf"),
                   check_vma=False)
    x = jnp.ones((n_dev, 4), jnp.float32) * (pid + 1)
    out = fn(x)
    # psum over the global axis: every shard sums contributions of all devs
    total = float(jnp.sum(out[0]))
    print("PSUM_OK", total, flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_initialize_and_psum(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    import os
    import sysconfig

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    # -S skips this container's sitecustomize, which initializes the XLA
    # backend at interpreter boot — jax.distributed.initialize must run
    # first; site-packages is re-added explicitly
    env["PYTHONPATH"] = "/root/repo:" + sysconfig.get_paths()["purelib"]
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "2"  # 2 local devices per process -> 4 global
    procs = [
        subprocess.Popen([sys.executable, "-S", str(script), coord, str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, cwd="/root/repo", env=env)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker hung")
        assert p.returncode == 0, err[-2000:]
        outs.append(out)
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("PSUM_OK")]
        assert line, out
        # x rows are pid+1; psum over 4 global devices = 2*(1) + 2*(2) = 6
        # per element, 4 elements per row
        assert float(line[0].split()[1]) == 24.0, line
