"""Content-addressed stage cache (ltm/utils/stagecache.py).

The reference has no resume story beyond "stages are files; re-run them"
(SURVEY §5) — these tests cover the improvement: key sensitivity to inputs
and config, manifest validation, and the ltmapper CLI skipping unchanged
stages under --resume.
"""

import json
import os

import pytest

from ltm.utils.stagecache import StageCache, fingerprint_paths, stage_key


@pytest.fixture
def inputs(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.txt").write_text("alpha")
    (d / "b.txt").write_text("beta")
    return str(d)


def test_key_stable_and_input_sensitive(inputs):
    k1 = stage_key("s", {"x": 1}, [inputs])
    assert k1 == stage_key("s", {"x": 1}, [inputs])
    # config change
    assert k1 != stage_key("s", {"x": 2}, [inputs])
    # stage name change
    assert k1 != stage_key("t", {"x": 1}, [inputs])
    # extra change
    assert k1 != stage_key("s", {"x": 1}, [inputs], extra="v2")
    # file size change
    with open(os.path.join(inputs, "a.txt"), "w") as f:
        f.write("alpha-longer")
    assert k1 != stage_key("s", {"x": 1}, [inputs])


def test_key_mtime_sensitive(inputs):
    k1 = stage_key("s", None, [inputs])
    p = os.path.join(inputs, "a.txt")
    st = os.stat(p)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert k1 != stage_key("s", None, [inputs])


def test_absent_input_distinct(inputs, tmp_path):
    missing = str(tmp_path / "nope")
    assert stage_key("s", None, [missing]) != stage_key("s", None, [inputs])
    assert fingerprint_paths([missing]) == [f"{missing}:absent"]


def test_content_hash_mode(inputs, monkeypatch):
    monkeypatch.setenv("LTM_STAGE_CACHE_HASH", "content")
    k1 = stage_key("s", None, [inputs])
    p = os.path.join(inputs, "a.txt")
    st = os.stat(p)
    with open(p, "w") as f:
        f.write("ALPHA")  # same size, different bytes
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))  # restore mtime
    assert k1 != stage_key("s", None, [inputs])


def test_check_commit_roundtrip(tmp_path, inputs):
    out = tmp_path / "out"
    out.mkdir()
    (out / "result.txt").write_text("42")
    cache = StageCache(str(tmp_path / "cache"))
    key = stage_key("s", None, [inputs])

    assert cache.check("s", key) is None
    cache.commit("s", key, [str(out)])
    m = cache.check("s", key)
    assert m is not None and len(m["outputs"]) == 1

    # output size change invalidates
    (out / "result.txt").write_text("changed!")
    assert cache.check("s", key) is None
    (out / "result.txt").write_text("42")
    assert cache.check("s", key) is not None

    # output deletion invalidates
    os.unlink(out / "result.txt")
    assert cache.check("s", key) is None


def test_commit_excludes_own_manifests(tmp_path):
    out = tmp_path / "out"
    cache = StageCache(str(out / ".stage_cache"))  # cache nested in outputs
    (out / "result.txt").write_text("42")
    cache.commit("a", "k" * 64, [str(out)])
    m2 = cache.commit("b", "j" * 64, [str(out)])
    paths = [r["path"] for r in m2["outputs"]]
    assert all(".stage_cache" not in p for p in paths)
    assert any(p.endswith("result.txt") for p in paths)


def test_corrupt_manifest_is_miss(tmp_path, inputs):
    cache = StageCache(str(tmp_path / "cache"))
    key = stage_key("s", None, [inputs])
    cache.commit("s", key, [])
    mpath = cache._manifest_path("s", key)
    with open(mpath, "w") as f:
        f.write("{not json")
    assert cache.check("s", key) is None
    with open(mpath, "w") as f:
        json.dump({"key": "different"}, f)
    assert cache.check("s", key) is None


def test_ltmapper_resume_skips_unchanged_stages(tmp_path, monkeypatch):
    """CLI wiring: second --resume run invokes neither stage; an input edit
    re-runs both."""
    import ltm.cli.ltmapper as ltmapper

    sessions = tmp_path / "sessions"
    for name in ("01", "02"):
        d = sessions / name / "Scans"
        d.mkdir(parents=True)
        (d / "000000.pcd").write_text(f"fake scan {name}")
    out = tmp_path / "out"
    calls = {"slam": 0, "rm": 0}

    class FakeSession:
        def __init__(self, name):
            self.name = name

    class FakeLTSlam:
        def __init__(self, cfg):
            pass

        def run(self, central, query, save_directory):
            calls["slam"] += 1
            os.makedirs(save_directory, exist_ok=True)
            for s in (central, query):
                with open(os.path.join(
                        save_directory,
                        f"{s.name}_central_aft_intersession_loops.txt"), "w") as f:
                    f.write("1 0 0 0 0 1 0 0 0 0 1 0\n")

    class FakeRemoverter:
        def __init__(self, cfg):
            pass

        def run(self, c_in, q_in, save_directory):
            calls["rm"] += 1
            os.makedirs(save_directory, exist_ok=True)
            with open(os.path.join(save_directory, "updated_map.pcd"), "w") as f:
                f.write("fake map")

    monkeypatch.setattr(ltmapper, "LTSlam", FakeLTSlam)
    monkeypatch.setattr(ltmapper, "Removerter", FakeRemoverter)
    monkeypatch.setattr(ltmapper, "load_session_dir",
                        lambda path, max_nodes=None: FakeSession(os.path.basename(path)))
    monkeypatch.setattr(ltmapper.RemovertInput, "from_dirs",
                        classmethod(lambda cls, scans, poses: None), raising=False)

    argv = ["--sessions-dir", str(sessions), "--central", "01", "--query", "02",
            "--out", str(out), "--resume"]
    assert ltmapper.main(argv) == 0
    assert calls == {"slam": 1, "rm": 1}

    assert ltmapper.main(argv) == 0  # unchanged → both cached
    assert calls == {"slam": 1, "rm": 1}

    scan = sessions / "01" / "Scans" / "000000.pcd"
    scan.write_text("fake scan 01 EDITED")
    assert ltmapper.main(argv) == 0  # input edit → both re-run
    assert calls == {"slam": 2, "rm": 2}

    # without --resume the cache is bypassed entirely
    assert ltmapper.main(argv[:-1]) == 0
    assert calls == {"slam": 3, "rm": 3}
