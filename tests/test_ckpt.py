"""Checkpoint backends (utils/ckpt.py): npz + orbax round-trips, atomic
npz write, auto-detection, and the multi CLI's --ckpt-backend flag."""

import os

import numpy as np
import pytest

from smpltpu.utils.ckpt import load_checkpoint, save_checkpoint


def _tree(rng):
    return {"poses": rng.normal(size=(5, 76)).astype(np.float32),
            "r0": np.tile(np.eye(3, dtype=np.float32), (5, 1, 1)),
            "next_start": np.int64(15)}


@pytest.mark.parametrize("backend", ["npz", "orbax"])
def test_round_trip(tmp_path, rng, backend):
    if backend == "orbax":
        pytest.importorskip("orbax.checkpoint")
    base = str(tmp_path / "ck")
    tree = _tree(rng)
    path = save_checkpoint(base, tree, backend=backend)
    assert os.path.exists(path)
    out = load_checkpoint(base, backend="auto")
    np.testing.assert_array_equal(out["poses"], tree["poses"])
    np.testing.assert_array_equal(out["r0"], tree["r0"])
    assert int(out["next_start"]) == 15
    # overwrite with new contents restores the NEW tree
    tree2 = _tree(rng)
    save_checkpoint(base, tree2, backend=backend)
    out2 = load_checkpoint(base, backend="auto")
    np.testing.assert_array_equal(out2["poses"], tree2["poses"])


def test_npz_write_is_atomic(tmp_path, rng):
    """No .tmp remnant after a save; the artifact is the final name only."""
    base = str(tmp_path / "ck")
    save_checkpoint(base, _tree(rng), backend="npz")
    names = sorted(os.listdir(tmp_path))
    assert names == ["ck.npz"]


def test_missing_returns_none(tmp_path):
    assert load_checkpoint(str(tmp_path / "absent")) is None


def test_multi_cli_orbax_resume(tmp_path, rng):
    """--ckpt-backend orbax: interrupted run leaves an orbax checkpoint the
    resumed run restores from (same surface as the npz path)."""
    pytest.importorskip("orbax.checkpoint")
    from tests.test_pipeline import _make_dataset
    from smpltpu.pipeline import multi as multi_cli

    model_path, kp_dir, img_dir = _make_dataset(tmp_path, rng, empty_frames=())
    out = str(tmp_path / "o")
    args = [model_path, kp_dir, img_dir, out,
            "10", "10", "2", "4", "1", "1.0", "25.0", "1.0",
            "--s2-iters", "2", "--ckpt-backend", "orbax"]
    assert multi_cli.main(args) == 0
    assert os.path.isdir(os.path.join(out, "checkpoint_multi.orbax"))
    assert not os.path.exists(os.path.join(out, "checkpoint_multi.npz"))
    ck = load_checkpoint(os.path.join(out, "checkpoint_multi"))
    assert ck is not None and int(ck["next_start"]) > 0
    # resume consumes the checkpoint without error (all windows done)
    assert multi_cli.main(args + ["--resume"]) == 0


def test_orbax_crash_swap_recovery(tmp_path, rng, monkeypatch):
    """A kill between the two swap renames leaves only ck.orbax.old; the
    next load must recover it (crash-safety review finding)."""
    pytest.importorskip("orbax.checkpoint")
    base = str(tmp_path / "ck")
    tree = _tree(rng)
    path = save_checkpoint(base, tree, backend="orbax")
    os.rename(path, path + ".old")      # simulate the crash window
    out = load_checkpoint(base, backend="auto")
    assert out is not None and int(out["next_start"]) == 15
    assert os.path.isdir(path)          # swap finished by the loader


def test_orbax_save_keeps_old_on_failure(tmp_path, rng, monkeypatch):
    """If the orbax save itself dies, the previous checkpoint must
    survive (no rmtree-before-write)."""
    ocp = pytest.importorskip("orbax.checkpoint")
    base = str(tmp_path / "ck")
    tree = _tree(rng)
    save_checkpoint(base, tree, backend="orbax")

    class Boom:
        def __enter__(self):
            return self
        def __exit__(self, *a):
            return False
        def save(self, *a, **k):
            raise RuntimeError("simulated mid-save crash")

    monkeypatch.setattr(ocp, "PyTreeCheckpointer", Boom)
    with pytest.raises(RuntimeError):
        save_checkpoint(base, _tree(rng), backend="orbax")
    monkeypatch.undo()
    out = load_checkpoint(base, backend="auto")
    np.testing.assert_array_equal(out["poses"], tree["poses"])


def test_auto_prefers_newer_artifact(tmp_path, rng):
    """auto must restore the NEWER checkpoint when both formats exist
    (backend switched between resumes)."""
    pytest.importorskip("orbax.checkpoint")
    base = str(tmp_path / "ck")
    t_old = _tree(rng)
    t_new = dict(_tree(rng), next_start=np.int64(80))
    p_orbax = save_checkpoint(base, t_old, backend="orbax")
    save_checkpoint(base, t_new, backend="npz")
    os.utime(p_orbax, (1, 1))           # orbax artifact is older
    out = load_checkpoint(base, backend="auto")
    assert int(out["next_start"]) == 80


def test_load_orbax_falls_back_to_npz_when_gated(tmp_path, rng, monkeypatch):
    """orbax artifact present but orbax unimportable: degrade to the npz
    artifact instead of an ImportError (mirrors the save-side fallback)."""
    pytest.importorskip("orbax.checkpoint")
    import sys
    base = str(tmp_path / "ck")
    save_checkpoint(base, _tree(rng), backend="orbax")
    t_npz = dict(_tree(rng), next_start=np.int64(42))
    save_checkpoint(base, t_npz, backend="npz")
    monkeypatch.setitem(sys.modules, "orbax", None)
    monkeypatch.setitem(sys.modules, "orbax.checkpoint", None)
    out = load_checkpoint(base, backend="orbax")
    assert int(out["next_start"]) == 42


def test_cli_rejects_bad_backend():
    from smpltpu.pipeline import multi as multi_cli
    assert multi_cli.parse_args(["a", "b", "c", "d",
                                 "--ckpt-backend", "orbx"]) is None
    assert multi_cli.parse_args(["a", "b", "c", "d",
                                 "--linear", "pcg-kernel"]) is None
