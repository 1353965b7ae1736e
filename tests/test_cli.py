"""CLI argument handling (pipeline execution is covered by e2e drives)."""

import pytest


def test_ltslam_requires_sessions_dir(capsys):
    from ltm.cli.ltslam import main

    with pytest.raises(SystemExit) as e:
        main([])
    assert e.value.code == 2
    assert "sessions_dir" in capsys.readouterr().err


def test_ltremovert_requires_paths(capsys):
    from ltm.cli.ltremovert import main

    with pytest.raises(SystemExit) as e:
        main([])
    assert e.value.code == 2
    assert "central_sess_scan_dir" in capsys.readouterr().err


def test_ltmapper_requires_args(capsys):
    from ltm.cli.ltmapper import main

    with pytest.raises(SystemExit):
        main([])


def test_yaml_config_roundtrip(tmp_path):
    from ltm.core.config import LTSlamConfig, RemovertConfig, load_yaml, save_yaml

    p = str(tmp_path / "a.yaml")
    cfg = LTSlamConfig(num_sc_loops_upper_bound=7)
    cfg.scan_context.num_ring = 10
    save_yaml(cfg, p)
    cfg2 = load_yaml(p, "ltslam")
    assert cfg2.num_sc_loops_upper_bound == 7
    assert cfg2.scan_context.num_ring == 10

    p2 = str(tmp_path / "b.yaml")
    rcfg = RemovertConfig(use_block_map=True, k_blocks=17)
    save_yaml(rcfg, p2)
    rcfg2 = load_yaml(p2, "removert")
    assert rcfg2.use_block_map and rcfg2.k_blocks == 17
