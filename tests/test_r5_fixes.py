"""Round-5 fixes: video-driver flag forwarding (adaptive/orient — VERDICT
r4 #5), multi-CLI orient-init plumbing (VERDICT r4 #2), the GMM beta
pathology warning (VERDICT r4 #7), and the round-4 advisor items
(bounded init caches, tolerant yaw matching in make_start_set)."""

import numpy as np
import pytest

from smpltpu.pipeline import multi as multi_cli
from smpltpu.pipeline import single as single_cli
from smpltpu.pipeline import video as video_cli
from tests.test_pipeline import _make_dataset


# ---- video driver forwarding (VERDICT r4 #5) ----

def _capture_driver(tmp_path, monkeypatch, argv_tail):
    kps = tmp_path / "kps"
    kps.mkdir(exist_ok=True)
    (kps / "frame_0000.json").write_text("[]")
    captured = {}

    def fake_main(args):
        captured["args"] = list(args)
        return 0

    monkeypatch.setattr(single_cli, "main", fake_main)
    monkeypatch.setattr(multi_cli, "main", fake_main)
    monkeypatch.setattr(video_cli, "_blank_frames",
                        lambda kps_dir, out_dir, size: str(tmp_path))
    assert video_cli.main(["m.npz", str(kps), str(tmp_path / "out"),
                           "--no-video"] + argv_tail) == 0
    return captured["args"]


def test_video_driver_forwards_adaptive_flags_single(tmp_path, monkeypatch):
    got = _capture_driver(tmp_path, monkeypatch, [
        "--mode", "single", "--adaptive-start", "--adaptive-thresh", "4.5",
        "--no-orient-init", "--frame-chunk", "32", "--mesh", "1"])
    opts = single_cli.parse_args(got)
    assert opts["adaptive_start"] is True
    assert opts["adaptive_thresh"] == 4.5
    assert opts["orient_init"] is False
    assert opts["frame_chunk"] == 32
    assert opts["mesh"] == 1


def test_video_driver_multi_defaults_data_init(tmp_path, monkeypatch):
    """The one-command driver's multi mode uses the framework's best
    measured path: --data-init (span init — orientation seeding measured
    WORSE for the coupled two-stage chain, ROADMAP round-5) by default;
    --multi-start forwards to the multi CLI's seeding mode."""
    got = _capture_driver(tmp_path, monkeypatch, [])
    opts = multi_cli.parse_args(got)
    assert opts["data_init"] is True and opts["orient_init"] is False
    assert opts["multi_start"] is False

    got = _capture_driver(tmp_path, monkeypatch, ["--multi-start"])
    opts = multi_cli.parse_args(got)
    assert opts["multi_start"] is True


def test_multi_cli_parses_orient_and_multistart():
    opts = multi_cli.parse_args(["m.npz", "k", "i", "o", "--data-init",
                                 "--orient-init"])
    assert opts["data_init"] is True and opts["orient_init"] is True
    opts = multi_cli.parse_args(["m.npz", "k", "i", "o", "--data-init"])
    assert opts["orient_init"] is False
    opts = multi_cli.parse_args(["m.npz", "k", "i", "o", "--multi-start"])
    assert opts["multi_start"] is True


def test_multi_cli_multistart_seeding_end_to_end(tmp_path, rng):
    """--multi-start seeds the two-stage chain with frozen-scale
    best-of-starts fits; the run must complete and the seeding must not
    leave fitted scale != 1 in the seeds (the scale-discarding log.csv
    eval would blow up — measured 125 px with free-scale seeds)."""
    import os

    model_path, kp_dir, img_dir = _make_dataset(tmp_path, rng)
    out = str(tmp_path / "out_ms")
    rc = multi_cli.main([model_path, kp_dir, img_dir, out,
                         "10", "10", "2", "4", "1", "5.0", "0.0", "3.0",
                         "--batched-windows", "--multi-start",
                         "--init-from-anchors", "--s2-iters", "5"])
    assert rc == 0
    rows = open(os.path.join(out, "log.csv")).read().splitlines()[1:]
    assert rows
    errs = np.array([float(r.split(",")[1]) for r in rows])
    # toy fixture fits to a few px; a scale-quirk regression reads 100s
    assert errs.max() < 50.0, errs


# ---- GMM beta pathology warning (VERDICT r4 #7) ----

def test_gmm_beta_warning(tmp_path, rng, capsys):
    model_path, kp_dir, img_dir = _make_dataset(tmp_path, rng,
                                                with_prior=True)
    # reference-default beta_pose=20 >= GMM_BETA_WARN -> warn
    rc = single_cli.main([model_path, kp_dir, img_dir,
                          str(tmp_path / "o1"), "2", "20.0", "0.0",
                          "--use-gmm"])
    assert rc == 0
    assert "hard-assignment GMM objective" in capsys.readouterr().err
    # beta_pose=5 (measured-mild probe point) -> no warning
    rc = single_cli.main([model_path, kp_dir, img_dir,
                          str(tmp_path / "o2"), "2", "5.0", "0.0",
                          "--use-gmm"])
    assert rc == 0
    assert "hard-assignment GMM objective" not in capsys.readouterr().err


# ---- advisor: bounded init caches ----

def test_init_caches_bounded():
    from smpltpu.solve import init as init_mod

    cache = {}
    for i in range(init_mod._CACHE_MAX * 2):
        init_mod._cache_put(cache, i, ("obj", i))
    assert len(cache) == init_mod._CACHE_MAX
    # FIFO: the oldest half evicted, the newest half retained
    assert 0 not in cache
    assert set(cache) == set(range(init_mod._CACHE_MAX,
                                   init_mod._CACHE_MAX * 2))


# ---- advisor: tolerant yaw matching in make_start_set ----

def test_make_start_set_yaw_isclose(rng):
    """A caller grid with a NEAR-pi yaw must still produce the Necker
    flip (depth-reversal start), and near-zero the plain base start."""
    import jax.numpy as jnp

    from smpltpu.constants import init_root_rotation
    from smpltpu.energy import make_skeleton_spec
    from smpltpu.models import SMPLModel
    from smpltpu.models.synthetic import make_synthetic_model
    from smpltpu.solve.init import make_start_set
    from smpltpu.utils import default_intrinsics
    from tests.test_pipeline import H, W

    model = SMPLModel.from_dict(make_synthetic_model(n_verts=200, seed=0),
                                dtype=jnp.float64)
    spec = make_skeleton_spec(model, init_root_rotation(), with_shape=False)
    cam = default_intrinsics(W, H)
    # a frame with enough synthetic detections for the orient estimate
    kp = np.zeros((1, 17, 4))
    kp[0, :, 0] = np.arange(17)
    kp[0, :, 1] = W / 2 + rng.normal(size=17) * 20
    kp[0, :, 2] = H / 2 + np.linspace(-40, 40, 17)
    kp[0, :, 3] = 1.0

    exact = make_start_set(kp, spec, cam, yaws=(0.0, np.pi),
                           include_reference_init=False)
    near = make_start_set(kp, spec, cam,
                          yaws=(1e-13, np.pi * (1 + 1e-13)),
                          include_reference_init=False)
    np.testing.assert_allclose(near, exact, rtol=0, atol=1e-9)
    # the flip start must actually differ from the base start
    assert np.abs(exact[0, 1, 1:4] - exact[0, 0, 1:4]).max() > 1e-3


def test_single_cli_observability_flags(tmp_path):
    """--profile / --metrics-jsonl on the single CLI (round 5: the multi
    CLI had both, the single CLI none — SURVEY section-5 parity)."""
    import json

    from smpltpu.pipeline.single import parse_args
    from tests.test_pipeline import _make_dataset

    opts = parse_args(["m", "k", "i", "o", "--profile",
                       "--metrics-jsonl", "mm.jsonl"])
    assert opts["profile"] and opts["metrics_jsonl"] == "mm.jsonl"

    import numpy as np

    from smpltpu.pipeline import single as single_cli
    rng = np.random.default_rng(5)
    model_path, kp_dir, img_dir = _make_dataset(tmp_path, rng,
                                                empty_frames=())
    out = str(tmp_path / "o_obs")
    mj = str(tmp_path / "m.jsonl")
    rc = single_cli.main([model_path, kp_dir, img_dir, out, "5", "1.0",
                          "0.0", "--metrics-jsonl", mj])
    assert rc == 0
    rows = [json.loads(line) for line in open(mj)]
    assert any(r.get("event") == "single_solve" and r.get("frames")
               for r in rows)
