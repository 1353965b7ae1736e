"""Cross-validation of the pose-graph solver against an independent oracle.

SURVEY.md §4 level 2 planned GTSAM-generated fixtures; gtsam has no wheel in
this image and the environment has zero egress, so the trusted third-party
optimizer here is SciPy: ``scipy.optimize.least_squares`` (quadratic graphs)
and ``scipy.optimize.minimize`` (the true robust objective), both in float64
over an INDEPENDENT SE(3) implementation (scipy.spatial.transform.Rotation
for SO(3), textbook V/V⁻¹ for the translation coupling) — no ltm code in the
oracle's math.  Marginal covariances are checked against a dense
finite-difference (JᵀJ)⁻¹.  Conventions under test match GTSAM exactly
(tangent [w, v], Local/retract right-multiplicative; reference factors at
``ltslam/include/ltslam/BetweenFactorWithAnchoring.h:86-100``).

Acceptance bars per VERDICT/BASELINE: pose error < 1e-3 (solver runs f32),
covariance rtol <= 5%.
"""

import numpy as np
import pytest
from scipy.optimize import least_squares, minimize
from scipy.spatial.transform import Rotation

from ltm.core.config import SolverConfig
from ltm.graph import build_graph_data, marginal_covariance, solve

# ---------------------------------------------------------------------------
# independent float64 SE(3) (oracle side — deliberately NOT ltm.core.se3)
# ---------------------------------------------------------------------------


def _hat(w):
    return np.array([[0.0, -w[2], w[1]], [w[2], 0.0, -w[0]], [-w[1], w[0], 0.0]])


def _exp_se3(xi):
    """GTSAM Pose3::Expmap, xi = [w, v]."""
    w, v = xi[:3], xi[3:]
    th = np.linalg.norm(w)
    R = Rotation.from_rotvec(w).as_matrix()
    W = _hat(w)
    if th < 1e-8:
        V = np.eye(3) + 0.5 * W
    else:
        B = (1.0 - np.cos(th)) / th**2
        C = (th - np.sin(th)) / th**3
        V = np.eye(3) + B * W + C * (W @ W)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = V @ v
    return T


def _log_se3(T):
    """GTSAM Pose3::Logmap -> [w, v]."""
    w = Rotation.from_matrix(T[:3, :3]).as_rotvec()
    th = np.linalg.norm(w)
    W = _hat(w)
    if th < 1e-8:
        Vinv = np.eye(3) - 0.5 * W
    else:
        half = th / 2.0
        coeff = (1.0 - half * np.cos(half) / np.sin(half)) / th**2
        Vinv = np.eye(3) - 0.5 * W + coeff * (W @ W)
    return np.concatenate([w, Vinv @ T[:3, 3]])


def _local(a, b):
    return _log_se3(np.linalg.inv(a) @ b)


def _pose(yaw, x, y, z=0.0):
    T = np.eye(4)
    T[:3, :3] = Rotation.from_euler("z", yaw).as_matrix()
    T[:3, 3] = [x, y, z]
    return T


def _pose_err(A, B):
    return max(
        np.linalg.norm(_local(np.asarray(A, np.float64), np.asarray(B, np.float64)))
        for A, B in zip(A, B)
    )


# ---------------------------------------------------------------------------
# fixture graph: noisy chain with priors + a loop (all non-robust)
# ---------------------------------------------------------------------------

N = 8
SIG_ODOM = (1e-2,) * 6          # loose enough that priors genuinely pull
SIG_PRIOR = (1e-3,) * 6
SIG_LOOP = (1e-2,) * 6


def _quadratic_graph(seed=0):
    rng = np.random.default_rng(seed)
    gt = [_pose(2 * np.pi * i / N, 5 * np.cos(2 * np.pi * i / N),
                5 * np.sin(2 * np.pi * i / N)) for i in range(N)]
    # noisy measurements -> the optimum is a genuine least-squares balance,
    # not the zero-residual ground truth
    meas_noise = lambda s: _exp_se3(rng.normal(scale=s, size=6))
    betweens = [
        (i, i + 1, np.linalg.inv(gt[i]) @ gt[i + 1] @ meas_noise(0.02),
         SIG_ODOM, False)
        for i in range(N - 1)
    ]
    betweens.append((0, N - 1, np.linalg.inv(gt[0]) @ gt[N - 1] @ meas_noise(0.02),
                     SIG_LOOP, False))
    priors = [(3, gt[3] @ meas_noise(0.01), SIG_PRIOR),
              (6, gt[6] @ meas_noise(0.01), SIG_PRIOR)]
    init = [gt[i] @ _exp_se3(rng.normal(scale=0.03, size=6)) for i in range(N)]
    init[0] = gt[0]
    fixed = np.zeros(N, bool)
    fixed[0] = True
    return gt, init, fixed, priors, betweens


def _oracle_residuals(x, init, fixed, priors, betweens):
    """Whitened residual stack, poses_i = init_i · Exp(x_i) (free vars only)."""
    poses = []
    k = 0
    for i in range(len(init)):
        if fixed[i]:
            poses.append(init[i])
        else:
            poses.append(init[i] @ _exp_se3(x[6 * k: 6 * k + 6]))
            k += 1
    r = []
    for (i, T, sig) in priors:
        r.append(_local(T, poses[i]) / np.sqrt(np.asarray(sig)))
    for (i, j, T, sig, _rob) in betweens:
        r.append(_local(T, np.linalg.inv(poses[i]) @ poses[j]) / np.sqrt(np.asarray(sig)))
    return np.concatenate(r)


@pytest.fixture(scope="module")
def quadratic_solution():
    gt, init, fixed, priors, betweens = _quadratic_graph()
    n_free = int((~fixed).sum())
    fun = lambda x: _oracle_residuals(x, init, fixed, priors, betweens)
    res = least_squares(fun, np.zeros(6 * n_free), method="lm", xtol=1e-14, ftol=1e-14)
    assert res.success or res.status > 0
    oracle_poses = []
    k = 0
    for i in range(N):
        if fixed[i]:
            oracle_poses.append(init[i])
        else:
            oracle_poses.append(init[i] @ _exp_se3(res.x[6 * k: 6 * k + 6]))
            k += 1

    g = build_graph_data(np.asarray(init, np.float32), fixed,
                         priors=priors, betweens=betweens)
    poses, info = solve(g, SolverConfig(max_outer_iterations=50))
    return g, np.asarray(poses, np.float64), oracle_poses, res, init, fixed, priors, betweens


def test_solve_matches_scipy_lm(quadratic_solution):
    _, ltm_poses, oracle_poses, res, *_ = quadratic_solution
    err = _pose_err(ltm_poses, oracle_poses)
    assert err < 1e-3, err
    # costs agree too (0.5 ||r||² convention on both sides)
    ltm_cost = 0.5 * np.sum(
        _oracle_residuals(np.zeros(0), list(ltm_poses), np.ones(N, bool),
                          *quadratic_solution[6:8]) ** 2)
    assert abs(ltm_cost - res.cost) / res.cost < 1e-4, (ltm_cost, res.cost)


def test_marginal_covariance_matches_dense_inverse(quadratic_solution):
    """Σ_v from batched CG == dense (JᵀJ)⁻¹ blocks at the same linearization
    (J by central finite differences of the independent f64 residuals around
    the ltm solution, same right-retraction chart)."""
    import jax.numpy as jnp

    g, ltm_poses, *_ , init, fixed, priors, betweens = quadratic_solution
    base = list(ltm_poses)
    free_idx = [i for i in range(N) if not fixed[i]]
    n_free = len(free_idx)

    fun = lambda x: _oracle_residuals(x, base, fixed, priors, betweens)
    eps = 1e-6
    cols = []
    for k in range(6 * n_free):
        e = np.zeros(6 * n_free)
        e[k] = eps
        cols.append((fun(e) - fun(-e)) / (2 * eps))
    J = np.stack(cols, axis=1)
    Sigma = np.linalg.inv(J.T @ J)

    var_indices = jnp.asarray(free_idx, jnp.int32)
    got = np.asarray(marginal_covariance(
        g, jnp.asarray(ltm_poses, jnp.float32), var_indices,
        cg_iterations=400, damping=1e-8))
    for m, i in enumerate(free_idx):
        k = free_idx.index(i)
        ref_blk = Sigma[6 * k: 6 * k + 6, 6 * k: 6 * k + 6]
        scale = np.abs(ref_blk).max()
        np.testing.assert_allclose(got[m], ref_blk, atol=0.05 * scale,
                                   err_msg=f"var {i}")


# ---------------------------------------------------------------------------
# robust anchored two-session graph vs scipy.optimize.minimize on the TRUE
# objective (Gaussian + per-factor Cauchy, k=1 — gtsam mEstimator::Cauchy)
# ---------------------------------------------------------------------------


def _anchored_graph(seed=1):
    rng = np.random.default_rng(seed)
    n = 6
    gt = [_pose(0.4 * i, 2.0 * i, 0.3 * i) for i in range(n)]
    anchor_gt = _pose(0.3, 4.0, -2.0)
    meas_noise = lambda s: _exp_se3(rng.normal(scale=s, size=6))

    # variables: [anchor0, anchor1, s0 nodes, s1 nodes]
    V = 2 + 2 * n
    init = [np.eye(4) for _ in range(V)]
    fixed = np.zeros(V, bool)
    fixed[0] = True
    fixed[2] = True
    fixed[2 + n] = True
    s1_local = [np.linalg.inv(anchor_gt) @ g_ for g_ in gt]
    for i in range(n):
        init[2 + i] = gt[i]
        init[2 + n + i] = s1_local[i]

    large = (9.8696044,) * 3 + (1e8,) * 3
    robustv = (0.5,) * 6
    priors = [(1, np.eye(4), large)]
    betweens = []
    for s, base in ((0, 2), (1, 2 + n)):
        loc = gt if s == 0 else s1_local
        for i in range(n - 1):
            betweens.append((base + i, base + i + 1,
                             np.linalg.inv(loc[i]) @ loc[i + 1] @ meas_noise(0.01),
                             (1e-4,) * 6, False))
    anchored = []
    for i in range(n):
        # measured = Between(central pose, query central pose) + noise
        anchored.append((2 + i, 2 + n + i, 0, 1,
                         np.linalg.inv(gt[i]) @ anchor_gt @ s1_local[i] @ meas_noise(0.02),
                         robustv))
    return init, fixed, priors, betweens, anchored


def _oracle_cost(x, init, fixed, priors, betweens, anchored, k2=1.0):
    poses = []
    k = 0
    for i in range(len(init)):
        if fixed[i]:
            poses.append(init[i])
        else:
            poses.append(init[i] @ _exp_se3(x[6 * k: 6 * k + 6]))
            k += 1
    cost = 0.0
    for (i, T, sig) in priors:
        r = _local(T, poses[i]) / np.sqrt(np.asarray(sig))
        cost += 0.5 * r @ r
    for (i, j, T, sig, _rob) in betweens:
        r = _local(T, np.linalg.inv(poses[i]) @ poses[j]) / np.sqrt(np.asarray(sig))
        cost += 0.5 * r @ r
    for (i, j, ai, aj, T, sig) in anchored:
        hi = poses[ai] @ poses[i]
        hj = poses[aj] @ poses[j]
        r = _local(T, np.linalg.inv(hi) @ hj) / np.sqrt(np.asarray(sig))
        cost += 0.5 * k2 * np.log1p(r @ r / k2)
    return cost


def test_robust_anchored_matches_scipy_minimize():
    init, fixed, priors, betweens, anchored = _anchored_graph()
    n_free = int((~np.asarray(fixed)).sum())
    fun = lambda x: _oracle_cost(x, init, fixed, priors, betweens, anchored)
    res = minimize(fun, np.zeros(6 * n_free), method="BFGS",
                   options={"gtol": 1e-10, "maxiter": 2000})
    oracle_cost = res.fun

    g = build_graph_data(np.asarray(init, np.float32), fixed,
                         priors=priors, betweens=betweens, anchored=anchored)
    poses, info = solve(g, SolverConfig(max_outer_iterations=60))
    ltm_cost = fun(_pack_tangent(np.asarray(poses, np.float64), init, fixed))

    # same basin, same objective value (both at the minimum)
    assert abs(ltm_cost - oracle_cost) / max(oracle_cost, 1e-9) < 1e-3, \
        (ltm_cost, oracle_cost)

    oracle_poses = _unpack(res.x, init, fixed)
    err = _pose_err(np.asarray(poses, np.float64), oracle_poses)
    assert err < 2e-3, err


def _pack_tangent(poses, init, fixed):
    x = []
    for i in range(len(init)):
        if not fixed[i]:
            x.append(_local(init[i], poses[i]))
    return np.concatenate(x) if x else np.zeros(0)


def _unpack(x, init, fixed):
    poses = []
    k = 0
    for i in range(len(init)):
        if fixed[i]:
            poses.append(init[i])
        else:
            poses.append(init[i] @ _exp_se3(x[6 * k: 6 * k + 6]))
            k += 1
    return poses
