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
