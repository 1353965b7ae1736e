import numpy as np

from ltm.core import se3
from ltm.graph import build_graph_data, solve
from ltm.graph.checkpoint import load_graph, save_graph


def test_graph_checkpoint_roundtrip(tmp_path):
    from tests.test_graph import make_chain

    n = 8
    gt, odo, init = make_chain(n, noise=0.03)
    fixed = np.zeros(n, bool)
    fixed[0] = True
    betweens = [(i, i + 1, odo[i], (1e-4,) * 6, False) for i in range(n - 1)]
    g = build_graph_data(init, fixed, betweens=betweens)
    poses, info = solve(g)

    p = str(tmp_path / "graph.npz")
    save_graph(p, g, poses=poses, meta={"iterations": int(info.iterations)})
    g2, est, meta = load_graph(p)

    np.testing.assert_allclose(np.asarray(g2.poses0), np.asarray(g.poses0))
    np.testing.assert_array_equal(np.asarray(g2.bet_i), np.asarray(g.bet_i))
    np.testing.assert_allclose(np.asarray(est), np.asarray(poses))
    assert int(meta["iterations"]) == int(info.iterations)

    # resuming from the checkpointed estimates converges immediately
    import dataclasses

    g3 = dataclasses.replace(g2, poses0=est)
    poses2, info2 = solve(g3)
    err = np.abs(np.asarray(se3.log(se3.between(poses, poses2)))).max()
    assert err < 1e-4
    assert float(info2.cost_final) <= float(info.cost_final) + 1e-5
