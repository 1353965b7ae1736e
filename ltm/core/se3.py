"""Batched SO(3)/SE(3) Lie-group operations for the TPU-native LT-mapper engine.

Design notes
------------
All functions are pure, shape-polymorphic over leading batch dimensions, and
safe under ``jax.jit`` / ``jax.vmap``.  Poses are represented as homogeneous
``(..., 4, 4)`` matrices (row-major, acting on column vectors), the densest
representation for TPU matmul units.  Tangent vectors follow the GTSAM
convention ``[wx, wy, wz, vx, vy, vz]`` (rotation first), so that the noise
variance vectors of the reference system map 1:1 onto whitening weights
(cf. reference ``ltslam/src/LTslam.cpp:100-133`` noise constants).

Reference parity targets:
  * ``compose``/``between``/``local`` mirror ``gtsam::traits<Pose3>``
    Compose/Between/Local used by the anchored between factor
    (``ltslam/include/ltslam/BetweenFactorWithAnchoring.h:86-100``).
  * ``exp``/``log`` are the full SE(3) exponential/logarithm (GTSAM
    ``Pose3::Expmap/Logmap``), with Taylor fallbacks near the identity so the
    maps stay finite and differentiable in float32.
  * ``from_rpy``/``to_rpy`` follow ``gtsam::Rot3::RzRyRx(roll, pitch, yaw)``
    = Rz(yaw) @ Ry(pitch) @ Rx(roll), the convention used for ICP result
    conversion (``ltslam/src/LTslam.cpp:234-241``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "hat",
    "vee",
    "exp_so3",
    "log_so3",
    "quat_to_mat",
    "mat_to_quat",
    "from_rot_trans",
    "rotation",
    "translation",
    "identity",
    "compose",
    "inverse",
    "between",
    "exp",
    "log",
    "local",
    "retract",
    "from_rpy",
    "to_rpy",
    "from_quat_trans",
    "to_quat_trans",
    "transform_points",
    "pose_distance",
]

_EPS = 1e-8



# TPU numerics: the default f32 matmul truncates operands to bfloat16 on the
# MXU (measured: 4-7.5 m absolute error transforming km-scale coordinates,
# even through an identity rotation).  Every geometric product here is tiny
# ((...,4,4) or (N,3)x(3,3) — bandwidth-bound, measured zero cost difference),
# so they all run at HIGHEST (true f32) precision.
_PREC = jax.lax.Precision.HIGHEST


def _mm(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.matmul(a, b, precision=_PREC)


def hat(w: jax.Array) -> jax.Array:
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of :func:`hat`: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta2: jax.Array):
    """Float32-stable A = sin(t)/t, B = (1-cos(t))/t^2, C = (1-A)/t^2.

    B uses the half-angle identity 1-cos(t) = 2 sin²(t/2) (the naive form
    loses ALL precision below t≈1e-3 in float32); A and C switch to Taylor
    below t=0.1 where their direct forms cancel.  Computed from theta² with
    the double-where pattern so autodiff stays NaN-free at t = 0.
    """
    small = theta2 < 1e-2
    t2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(t2_safe)
    a = jnp.where(small, 1.0 - theta2 / 6.0 + theta2 * theta2 / 120.0, jnp.sin(theta) / theta)
    half_sinc = jnp.sin(theta / 2.0) / (theta / 2.0)
    b = jnp.where(small, 0.5 - theta2 / 24.0 + theta2 * theta2 / 720.0, 0.5 * half_sinc * half_sinc)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0 + theta2 * theta2 / 5040.0, (1.0 - a) / t2_safe)
    return a, b, c


def exp_so3(w: jax.Array) -> jax.Array:
    """SO(3) exponential map (Rodrigues), (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, _ = _sinc_coeffs(theta2)
    W = hat(w)
    W2 = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def log_so3(R: jax.Array) -> jax.Array:
    """SO(3) logarithm, (..., 3, 3) -> (..., 3).

    Uses the quaternion route, which stays accurate in float32 near pi where
    the classic trace formula blows up.
    """
    q = mat_to_quat(R)
    # q = [w, xyz]; w_vec = f(n^2) * xyz with f = 2*atan2(n, qw)/n.
    # Double-where keeps the derivative finite at the identity (norm() is
    # non-differentiable at 0 — the naive form poisons autodiff with NaNs).
    qw = q[..., 0]
    xyz = q[..., 1:]
    n2 = jnp.sum(xyz * xyz, axis=-1)
    small = n2 < 1e-10
    n2_safe = jnp.where(small, 1.0, n2)
    n_safe = jnp.sqrt(n2_safe)
    f_large = 2.0 * jnp.arctan2(n_safe, qw) / n_safe
    qw_safe = jnp.maximum(qw, _EPS)
    f_small = 2.0 / qw_safe - 2.0 * n2 / (3.0 * qw_safe**3)
    scale = jnp.where(small, f_small, f_large)
    return scale[..., None] * xyz


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Unit quaternion [w, x, y, z] -> rotation matrix, (..., 4) -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def mat_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion [w, x, y, z], branch-free (Shepperd).

    Evaluates all four branch candidates and selects by the largest pivot, so
    the function is vmappable and stable for any rotation.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate (unnormalized) quaternions, one per pivot
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    case = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., component, case)
    q = jnp.take_along_axis(cands, case[..., None, None].astype(jnp.int32), axis=-1)[..., 0]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return jnp.where(q[..., :1] < 0, -q, q)


# ---------------------------------------------------------------------------
# SE(3) as homogeneous 4x4 matrices
# ---------------------------------------------------------------------------

def from_rot_trans(R: jax.Array, t: jax.Array) -> jax.Array:
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def rotation(T: jax.Array) -> jax.Array:
    return T[..., :3, :3]


def translation(T: jax.Array) -> jax.Array:
    return T[..., :3, 3]


def identity(batch_shape=(), dtype=jnp.float32) -> jax.Array:
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), tuple(batch_shape) + (4, 4))


def compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """Group composition a∘b (matmul)."""
    return _mm(a, b)


def inverse(T: jax.Array) -> jax.Array:
    """Closed-form SE(3) inverse (no linear solve)."""
    R = rotation(T)
    t = translation(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return from_rot_trans(Rt, -_mm(Rt, t[..., None])[..., 0])


def between(a: jax.Array, b: jax.Array) -> jax.Array:
    """gtsam traits Between: a^{-1} ∘ b."""
    return compose(inverse(a), b)


def exp(xi: jax.Array) -> jax.Array:
    """SE(3) exponential map; xi = [w, v] (..., 6) -> (..., 4, 4)."""
    w = xi[..., :3]
    v = xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, c = _sinc_coeffs(theta2)
    W = hat(w)
    W2 = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * W2
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = _mm(V, v[..., None])[..., 0]
    return from_rot_trans(R, t)


def log(T: jax.Array) -> jax.Array:
    """SE(3) logarithm -> [w, v] (..., 6); inverse of :func:`exp`."""
    R = rotation(T)
    t = translation(T)
    w = log_so3(R)
    theta2 = jnp.sum(w * w, axis=-1)
    W = hat(w)
    W2 = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    # V^{-1} = I - W/2 + coeff * W², coeff = (1 - (t/2)·cot(t/2)) / t².
    # Taylor below t=0.1: the direct form is a catastrophic f32 cancellation
    # (it once produced 1e8× translation errors on near-identity poses).
    small = theta2 < 1e-2
    t2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(t2_safe)
    half = theta / 2.0
    coeff_large = (1.0 - half * jnp.cos(half) / jnp.sin(half)) / t2_safe
    coeff_small = 1.0 / 12.0 + theta2 / 720.0 + theta2 * theta2 / 30240.0
    coeff = jnp.where(small, coeff_small, coeff_large)
    Vinv = eye - 0.5 * W + coeff[..., None, None] * W2
    v = _mm(Vinv, t[..., None])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def local(a: jax.Array, b: jax.Array) -> jax.Array:
    """gtsam traits Local(a, b) = Logmap(a^{-1} b): tangent of b seen from a.

    This is the residual form of every factor in the reference graph
    (``BetweenFactorWithAnchoring.h:99``).
    """
    return log(between(a, b))


def retract(T: jax.Array, xi: jax.Array) -> jax.Array:
    """Right-multiplicative retraction T * Exp(xi) (GTSAM Pose3::retract)."""
    return compose(T, exp(xi))


def from_rpy(roll, pitch, yaw, t=None, dtype=jnp.float32) -> jax.Array:
    """Rz(yaw) @ Ry(pitch) @ Rx(roll) (gtsam Rot3::RzRyRx / pcl getTransformation)."""
    roll = jnp.asarray(roll, dtype)
    pitch = jnp.asarray(pitch, dtype)
    yaw = jnp.asarray(yaw, dtype)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    R = jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1),
            jnp.stack([-sp, cp * sr, cp * cr], axis=-1),
        ],
        axis=-2,
    )
    if t is None:
        t = jnp.zeros(R.shape[:-2] + (3,), dtype)
    return from_rot_trans(R, jnp.asarray(t, dtype))


def to_rpy(T: jax.Array):
    """Matrix -> (roll, pitch, yaw) with the :func:`from_rpy` convention."""
    R = rotation(T)
    pitch = -jnp.arcsin(jnp.clip(R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return roll, pitch, yaw


def from_quat_trans(q_xyzw: jax.Array, t: jax.Array) -> jax.Array:
    """g2o VERTEX_SE3:QUAT order [x, y, z, w] + translation -> 4x4.

    (The reference reads g2o quats as xyzw and reorders to wxyz,
    ``ltslam/src/Session.cpp:231-233``.)
    """
    q_wxyz = jnp.concatenate([q_xyzw[..., 3:4], q_xyzw[..., 0:3]], axis=-1)
    return from_rot_trans(quat_to_mat(q_wxyz), t)


def to_quat_trans(T: jax.Array):
    """4x4 -> (q_xyzw, t)."""
    q_wxyz = mat_to_quat(rotation(T))
    q_xyzw = jnp.concatenate([q_wxyz[..., 1:4], q_wxyz[..., 0:1]], axis=-1)
    return q_xyzw, translation(T)


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) to (..., N, 3) points: R @ p + t (a single matmul)."""
    R = rotation(T)
    t = translation(T)
    return _mm(pts, jnp.swapaxes(R, -1, -2)) + t[..., None, :]


def pose_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """Euclidean translation distance (reference ``poseDistance``,
    ``ltslam/src/utility.cpp:248-258``)."""
    return jnp.linalg.norm(translation(a) - translation(b), axis=-1)
