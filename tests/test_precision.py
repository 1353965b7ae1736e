"""Guard the TPU bf16-matmul fix (round 3).

The TPU's default f32 matmul truncates operands to bfloat16 (measured
4-7.5 m absolute error transforming km-scale coordinates — see PERF.md
"Round-3 correctness findings").  These tests pin the fix structurally:
every geometry matmul must carry Precision.HIGHEST in its jaxpr, so a
refactor that silently reverts to the default precision fails here even
on CPU (where the numerical difference is invisible).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ltm.core import se3
from ltm.kernels.projection import apply_pose


def _jaxpr_of(fn, *args):
    return str(jax.make_jaxpr(fn)(*args))


def _assert_all_dots_highest(jaxpr: str, where):
    """Every dot_general in the jaxpr must be annotated HIGHEST (the
    annotation prints on a separate line of the op's bracket block, so
    count ops vs annotations rather than scanning single lines)."""
    n_dots = jaxpr.count("dot_general")
    n_high = jaxpr.count("precision=(Precision.HIGHEST")
    assert n_dots > 0, (where, "no matmul found — test is vacuous")
    assert n_dots == n_high, (where, n_dots, n_high)


def test_apply_pose_is_full_precision():
    xyz = jnp.zeros((128, 3))
    Tinv = jnp.eye(4)
    _assert_all_dots_highest(_jaxpr_of(apply_pose, xyz, Tinv), "apply_pose")


def test_se3_geometry_is_full_precision():
    T = jnp.eye(4)[None].repeat(4, 0)
    xi = jnp.zeros((4, 6))
    pts = jnp.zeros((4, 64, 3))
    for fn, args in ((se3.compose, (T, T)),
                     (se3.between, (T, T)),
                     (se3.inverse, (T,)),
                     (se3.exp, (xi,)),
                     (se3.log, (T,)),
                     (se3.transform_points, (T, pts))):
        _assert_all_dots_highest(_jaxpr_of(fn, *args), fn.__name__)


def test_apply_pose_matches_reference():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(900, 1200, (256, 3)).astype(np.float32)
    th = 0.3
    c, s = np.cos(th), np.sin(th)
    Tinv = np.eye(4, dtype=np.float32)
    Tinv[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    Tinv[:3, 3] = [1.0, -2.0, 0.5]
    got = np.asarray(apply_pose(jnp.asarray(xyz), jnp.asarray(Tinv)))
    ref = xyz @ Tinv[:3, :3].T + Tinv[:3, 3]
    np.testing.assert_allclose(got, ref, atol=2e-3)
