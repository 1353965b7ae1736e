import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltm.core import se3


def random_tangents(rng, n, max_angle=2.9, trans_scale=5.0):
    w = rng.normal(size=(n, 3))
    norm = np.linalg.norm(w, axis=-1, keepdims=True)
    w = w / norm * np.minimum(norm, max_angle)
    v = rng.normal(size=(n, 3)) * trans_scale
    return jnp.asarray(np.concatenate([w, v], -1), jnp.float32)


def random_poses(rng, n):
    return se3.exp(random_tangents(rng, n))


def test_exp_log_roundtrip(rng):
    xi = random_tangents(rng, 64)
    T = se3.exp(xi)
    xi2 = se3.log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=5e-5)


def test_exp_log_small_angle():
    xi = jnp.asarray([[1e-9, 0, 0, 0.5, -0.2, 0.1], [0.0] * 6], jnp.float32)
    T = se3.exp(xi)
    xi2 = se3.log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-6)
    assert np.all(np.isfinite(np.asarray(jax.jacfwd(se3.exp)(xi[0]))))


def test_exp_log_near_pi(rng):
    axis = rng.normal(size=(16, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    w = axis * (np.pi - 1e-3)
    xi = jnp.asarray(np.concatenate([w, rng.normal(size=(16, 3))], -1), jnp.float32)
    T = se3.exp(xi)
    xi2 = se3.log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-3)


def test_compose_inverse(rng):
    a = random_poses(rng, 8)
    b = random_poses(rng, 8)
    eye = np.broadcast_to(np.eye(4), (8, 4, 4))
    np.testing.assert_allclose(np.asarray(se3.compose(a, se3.inverse(a))), eye, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(se3.between(a, b)), np.asarray(se3.compose(se3.inverse(a), b)), atol=1e-6
    )


def test_quat_mat_roundtrip(rng):
    R = se3.rotation(random_poses(rng, 100))
    q = se3.mat_to_quat(R)
    R2 = se3.quat_to_mat(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    # includes rotations near pi
    Rpi = se3.exp_so3(jnp.asarray([[np.pi - 1e-4, 0, 0]], jnp.float32))
    np.testing.assert_allclose(np.asarray(se3.quat_to_mat(se3.mat_to_quat(Rpi))), np.asarray(Rpi), atol=1e-5)


def test_rpy_convention():
    # Rz(yaw) Ry(pitch) Rx(roll): pure yaw rotates x into y
    T = se3.from_rpy(0.0, 0.0, np.pi / 2)
    p = se3.transform_points(T, jnp.asarray([[1.0, 0, 0]]))
    np.testing.assert_allclose(np.asarray(p), [[0, 1, 0]], atol=1e-6)
    r, p_, y = se3.to_rpy(se3.from_rpy(0.3, -0.2, 1.1))
    np.testing.assert_allclose([float(r), float(p_), float(y)], [0.3, -0.2, 1.1], atol=1e-6)


def test_local_residual_zero(rng):
    a = random_poses(rng, 4)
    np.testing.assert_allclose(np.asarray(se3.local(a, a)), np.zeros((4, 6)), atol=1e-5)


def test_retract_local_inverse(rng):
    a = random_poses(rng, 4)
    xi = jnp.asarray(rng.normal(size=(4, 6)) * 0.3, jnp.float32)
    np.testing.assert_allclose(np.asarray(se3.local(a, se3.retract(a, xi))), np.asarray(xi), atol=1e-5)


def test_transform_points_matches_manual(rng):
    T = random_poses(rng, 1)[0]
    pts = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    out = se3.transform_points(T, pts)
    R = np.asarray(se3.rotation(T))
    t = np.asarray(se3.translation(T))
    np.testing.assert_allclose(np.asarray(out), pts @ R.T + t, atol=1e-5)


def test_quat_trans_g2o_order():
    q_xyzw = jnp.asarray([0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)], jnp.float32)
    T = se3.from_quat_trans(q_xyzw, jnp.asarray([1.0, 2.0, 3.0]))
    r, p_, y = se3.to_rpy(T)
    np.testing.assert_allclose(float(y), np.pi / 2, atol=1e-6)
    q2, t2 = se3.to_quat_trans(T)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q_xyzw), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2), [1, 2, 3], atol=1e-6)


def test_pointcloud_roundtrip(rng):
    from ltm.core.pointcloud import from_numpy, concat, compact

    pts = rng.normal(size=(100, 3)).astype(np.float32)
    pc = from_numpy(pts, capacity=128)
    assert pc.capacity == 128
    assert int(pc.count()) == 100
    np.testing.assert_allclose(pc.to_numpy(), pts)

    both = concat([pc, pc])
    assert both.capacity == 256
    assert int(both.count()) == 200

    # knock out half the mask, compact
    half = pc.and_mask(jnp.arange(128) % 2 == 0)
    comp = compact(half, 64)
    assert int(comp.count()) == 50
    np.testing.assert_allclose(comp.to_numpy(), pts[::2])
