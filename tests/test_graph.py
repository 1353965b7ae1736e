import jax
import jax.numpy as jnp
import numpy as np

from ltm.core import se3
from ltm.core.config import SolverConfig
from ltm.graph import build_graph_data, marginal_covariance, solve


def _pose(yaw, x, y, z=0.0):
    return np.asarray(se3.from_rpy(0.0, 0.0, yaw, t=[x, y, z]))


def make_chain(n=10, noise=0.05, seed=0):
    """Ground-truth circle chain; noisy initials; exact odometry measurements."""
    rng = np.random.default_rng(seed)
    gt = np.stack([_pose(2 * np.pi * i / n, np.cos(2 * np.pi * i / n) * 5, np.sin(2 * np.pi * i / n) * 5) for i in range(n)])
    odo = [np.linalg.inv(gt[i]) @ gt[i + 1] for i in range(n - 1)]
    init = gt.copy()
    for i in range(1, n):
        xi = rng.normal(scale=noise, size=6).astype(np.float32)
        init[i] = np.asarray(se3.retract(jnp.asarray(gt[i], jnp.float32), jnp.asarray(xi)))
    return gt, odo, init


def test_chain_converges_to_ground_truth():
    n = 12
    gt, odo, init = make_chain(n)
    fixed = np.zeros(n, bool)
    fixed[0] = True
    betweens = [(i, i + 1, odo[i], (1e-4,) * 6, False) for i in range(n - 1)]
    # loop closure first-last (exact)
    rel = np.linalg.inv(gt[0]) @ gt[n - 1]
    betweens.append((0, n - 1, rel, (1e-4,) * 6, False))
    g = build_graph_data(init, fixed, betweens=betweens)
    poses, info = solve(g)
    err = np.asarray(se3.log(se3.between(jnp.asarray(gt, jnp.float32), poses)))
    assert float(info.cost_final) < float(info.cost_initial)
    assert np.abs(err).max() < 1e-3, np.abs(err).max()


def test_anchored_two_sessions():
    """Recover the GT anchor of a second session from anchored loop factors."""
    n = 8
    gt, odo, init = make_chain(n, noise=0.02)
    anchor_gt = _pose(0.3, 4.0, -2.0)

    # variables: [anchor1, anchor2, s1 nodes 0..n-1, s2 nodes 0..n-1]
    V = 2 + 2 * n
    poses0 = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    fixed = np.zeros(V, bool)
    fixed[0] = True      # base anchor pinned at origin
    fixed[2] = True      # first node of session 1
    fixed[2 + n] = True  # first node of session 2 (in its local frame)

    # session local poses: s1 local == site; s2 local = anchor^{-1} site
    s2_local = np.einsum("ij,kjl->kil", np.linalg.inv(anchor_gt), gt)
    poses0[2 : 2 + n] = gt
    poses0[2 + n :] = s2_local

    betweens = []
    for s, base in ((0, 2), (1, 2 + n)):
        local = gt if s == 0 else s2_local
        for i in range(n - 1):
            rel = np.linalg.inv(local[i]) @ local[i + 1]
            betweens.append((base + i, base + i + 1, rel, (1e-4,) * 6, False))

    # anchored loops: node i of s1 matches node i of s2 at the same site pose
    anchored = []
    for i in range(0, n, 2):
        # measured = Between(anchor1*p1, anchor2*p2) = I at ground truth
        anchored.append((2 + i, 2 + n + i, 0, 1, np.eye(4), (0.5,) * 6))

    # weak prior keeps anchor2 observable direction defined (largeNoise analogue)
    priors = [(1, np.eye(4), (np.pi**2,) * 3 + (1e8,) * 3)]

    g = build_graph_data(poses0, fixed, priors=priors, betweens=betweens, anchored=anchored)
    poses, info = solve(g, SolverConfig(max_outer_iterations=50))
    anchor_est = np.asarray(poses[1])
    err = np.asarray(se3.log(se3.between(jnp.asarray(anchor_gt, jnp.float32), jnp.asarray(anchor_est))))
    assert np.abs(err).max() < 5e-3, (err, np.asarray(info))


def test_cauchy_outlier_rejection():
    n = 12
    gt, odo, init = make_chain(n, noise=0.03)
    fixed = np.zeros(n, bool)
    fixed[0] = True
    betweens = [(i, i + 1, odo[i], (1e-4,) * 6, False) for i in range(n - 1)]
    # grossly wrong loop with robust noise (variance 0.5, Cauchy)
    bogus = _pose(2.0, 30.0, -20.0)
    betweens.append((0, n - 1, bogus, (0.5,) * 6, True))
    # a correct robust loop too
    rel = np.linalg.inv(gt[0]) @ gt[n - 1]
    betweens.append((0, n - 1, rel, (0.5,) * 6, True))
    g = build_graph_data(init, fixed, betweens=betweens)
    poses, info = solve(g)
    err = np.asarray(se3.log(se3.between(jnp.asarray(gt, jnp.float32), poses)))
    assert np.abs(err).max() < 0.05, np.abs(err).max()


def test_marginal_covariance_matches_dense():
    n = 5
    gt, odo, init = make_chain(n, noise=0.0)
    fixed = np.zeros(n, bool)
    fixed[0] = True
    sig = (1e-2,) * 6
    betweens = [(i, i + 1, odo[i], sig, False) for i in range(n - 1)]
    g = build_graph_data(np.asarray(gt, np.float32), fixed, betweens=betweens)
    poses = g.poses0

    # dense reference: J via jacfwd of flat residual, H = J^T J, invert free block
    from ltm.graph.factors import whitened_residuals
    from ltm.core import se3 as s3

    def f(delta):
        delta = jnp.where(g.fixed[:, None], 0.0, delta)
        p = s3.retract(poses, delta)
        rp, rb, ra = whitened_residuals(p, g)
        return jnp.concatenate([rp.ravel(), rb.ravel(), ra.ravel()])

    J = jax.jacfwd(f)(jnp.zeros((n, 6), jnp.float32)).reshape(-1, n * 6)
    free = ~np.repeat(np.asarray(g.fixed), 6)
    Jf = np.asarray(J)[:, free]
    H = Jf.T @ Jf + 1e-6 * np.eye(free.sum())
    S = np.linalg.inv(H)

    # one batched call (a second call with a different M re-jits the whole
    # 6-column-CG program — ~40 s of duplicate XLA-CPU compile)
    Sig_all = np.asarray(marginal_covariance(g, poses, jnp.asarray([1, 2, 3, 4])))

    var = 3
    # block of var in free coords: free vars start at var 1
    off = (var - 1) * 6
    np.testing.assert_allclose(Sig_all[var - 1], S[off : off + 6, off : off + 6],
                               rtol=0.05, atol=1e-6)

    # covariance grows along the chain
    traces = [np.trace(Sig_all[i]) for i in range(4)]
    assert traces[0] < traces[1] < traces[2] < traces[3]


def test_tridiag_preconditioner_matches_dense():
    """Block-Thomas factorization + apply solves M x = r exactly for a
    random SPD block-tridiagonal M (dense NumPy oracle)."""
    import numpy as np
    import jax.numpy as jnp
    from ltm.graph.solver import _tridiag_factor, _tridiag_apply

    rng = np.random.default_rng(3)
    V = 9
    # SPD block-tridiagonal: assemble from random chain factors A_i coupling
    # (i-1, i) plus diagonal regularization (same construction as the
    # preconditioner: a sum of J^T J terms)
    M = np.zeros((6 * V, 6 * V))
    for i in range(1, V):
        J = rng.normal(size=(6, 12))
        idx = slice(6 * (i - 1), 6 * (i + 1))
        M[idx, idx] += J.T @ J
    M += np.kron(np.eye(V), np.eye(6)) * 0.5
    D = np.stack([M[6 * i: 6 * i + 6, 6 * i: 6 * i + 6] for i in range(V)])
    L = np.zeros((V, 6, 6))
    for i in range(1, V):
        L[i] = M[6 * i: 6 * i + 6, 6 * (i - 1): 6 * i]
    r = rng.normal(size=(V, 6))

    Cinv = _tridiag_factor(jnp.asarray(D, jnp.float32), jnp.asarray(L, jnp.float32))
    x = np.asarray(_tridiag_apply(Cinv, jnp.asarray(L, jnp.float32),
                                  jnp.asarray(r, jnp.float32)))
    x_ref = np.linalg.solve(M, r.reshape(-1)).reshape(V, 6)
    np.testing.assert_allclose(x, x_ref, rtol=2e-4, atol=2e-4)
