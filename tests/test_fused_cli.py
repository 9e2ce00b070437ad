"""--fused-stages on the multi CLI (round 5): the whole two-stage chain
as ONE compiled dispatch (solve/two_stage.py — the bench headline path,
1830 vs 1760 fps on the TPU tunnel) reachable from the product CLI.

Pins: (a) the fused run produces the complete output surface (log.csv
rows for anchors + every frame, params_multi.npz, loss_curve.txt,
renders) with quality matching the sequential --batched-windows
--init-from-anchors run; (b) the gate falls back with a warning when the
required flags are missing; (c) `--linear pcg_block` parses (round-5
fix: the CLI validation list was missing the documented option).
"""

import os

import numpy as np
import pytest

from smpltpu.pipeline import multi as multi_cli
from tests.test_pipeline import N_FRAMES, _make_dataset


@pytest.fixture()
def rng():
    return np.random.default_rng(3)


def _mean_err(out):
    rows = open(os.path.join(out, "log.csv")).read().splitlines()[1:]
    return np.mean([float(r.split(",")[1]) for r in rows])


def test_fused_stages_matches_sequential(tmp_path, rng):
    model_path, kp_dir, img_dir = _make_dataset(tmp_path, rng,
                                                empty_frames=())
    args = [model_path, kp_dir, img_dir, None,
            "30", "30", "3", "4", "1", "2.0", "25.0", "1.0",
            "--s2-iters", "20", "--batched-windows", "--init-from-anchors"]
    outs = {}
    for tag, extra in (("seq", []), ("fused", ["--fused-stages"])):
        out = str(tmp_path / f"o_{tag}")
        a = list(args)
        a[3] = out
        assert multi_cli.main(a + extra) == 0
        outs[tag] = out

    for out in outs.values():
        log = open(os.path.join(out, "log.csv")).read().splitlines()
        # header + anchors + every window frame
        assert len(log) > N_FRAMES
        assert os.path.isfile(os.path.join(out, "params_multi.npz"))
        assert os.path.isfile(os.path.join(out, "loss_curve.txt"))
        assert os.path.isfile(os.path.join(out, "frame_0_multi.png"))

    # same chain, one dispatch: optima match (f32 fusion reroutes the odd
    # accept/reject step, so bit equality is not the contract — quality is)
    e_seq, e_fused = _mean_err(outs["seq"]), _mean_err(outs["fused"])
    assert abs(e_seq - e_fused) < 0.5, (e_seq, e_fused)

    p_seq = np.load(os.path.join(outs["seq"], "params_multi.npz"))
    p_fused = np.load(os.path.join(outs["fused"], "params_multi.npz"))
    # shared shape identical to f32 fuzz; poses compared by their errors
    np.testing.assert_allclose(p_seq["shape"], p_fused["shape"],
                               atol=5e-2)


def test_fused_stages_gate_falls_back(tmp_path, rng, capsys):
    model_path, kp_dir, img_dir = _make_dataset(tmp_path, rng,
                                                empty_frames=())
    out = str(tmp_path / "o_fb")
    # missing --batched-windows/--init-from-anchors -> warn + sequential
    rc = multi_cli.main([model_path, kp_dir, img_dir, out,
                         "10", "10", "3", "4", "1", "2.0", "25.0", "1.0",
                         "--s2-iters", "5", "--fused-stages"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "--fused-stages needs" in err
    assert os.path.isfile(os.path.join(out, "log.csv"))


def test_linear_pcg_block_parses():
    opts = multi_cli.parse_args(["m", "k", "i", "o",
                                 "--linear", "pcg_block"])
    assert opts is not None and opts["linear"] == "pcg_block"
    assert multi_cli.parse_args(["m", "k", "i", "o",
                                 "--linear", "bogus"]) is None
