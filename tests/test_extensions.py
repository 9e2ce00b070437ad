"""Framework-extension tests: --init-from-anchors accuracy improvement and
the missing-image break parity in the single CLI."""

import os

import numpy as np

from smpltpu.pipeline import multi as multi_cli
from smpltpu.pipeline import single as single_cli
from tests.test_pipeline import N_FRAMES, _make_dataset


def _window_errors(out_dir, n_anchor_rows):
    rows = open(os.path.join(out_dir, "log.csv")).read().splitlines()[1:]
    return [float(r.split(",")[1]) for r in rows[n_anchor_rows:]]


def test_init_from_anchors_improves_stage2(tmp_path, rng):
    model_path, kp_dir, img_dir = _make_dataset(tmp_path, rng, empty_frames=())
    base = [model_path, kp_dir, img_dir, None,
            "60", "60", "2", "4", "1", "1.0", "25.0", "1.0", "--s2-iters", "2"]
    outs = {}
    for name, extra in (("cold", []), ("warm", ["--init-from-anchors"])):
        out = str(tmp_path / name)
        args = list(base)
        args[3] = out
        assert multi_cli.main(args + extra) == 0
        outs[name] = np.mean(_window_errors(out, n_anchor_rows=4))
    # with only 2 stage-2 iterations, warm starts must fit strictly better
    assert outs["warm"] < outs["cold"], outs
    assert outs["warm"] < 3.0, outs  # near the stage-1 anchor quality


def test_single_cli_breaks_at_missing_image(tmp_path, rng):
    model_path, kp_dir, img_dir = _make_dataset(tmp_path, rng, empty_frames=())
    # remove the images for the last two frames
    for f in (N_FRAMES - 2, N_FRAMES - 1):
        os.remove(os.path.join(img_dir, f"frame_{f:04d}.png"))
    out_dir = str(tmp_path / "out")
    assert single_cli.main([model_path, kp_dir, img_dir, out_dir,
                            "10", "1.0", "0.0"]) == 0
    rows = open(os.path.join(out_dir, "log.csv")).read().splitlines()[1:]
    logged = [int(r.split(",")[0]) for r in rows]
    # reference 'break' semantics: nothing at or after the first missing image
    assert max(logged) < N_FRAMES - 2
