"""Regression pins for the round-2 self-review findings:

* estimate_frame_init must use fy for the vertical span/back-projection
  (latent fx/fy swap — invisible while default_intrinsics sets fx == fy);
* the video driver must FORWARD --beta-pose/--beta-shape/--lambda-t/
  --s2-iters to the underlying CLI (they were parsed, advertised in
  USAGE, and silently dropped);
* load_dataset on a direct git-LFS-stub path must raise the registry's
  clear message, not a cryptic np.load failure;
* multi-start selects the converged flag / loss history of the SELECTED
  start (exercised via the single CLI, asserted structurally).
"""

import os
from types import SimpleNamespace

import numpy as np
import pytest


def _cam(fx, fy, cx, cy):
    return SimpleNamespace(fx=fx, fy=fy, cx=cx, cy=cy)


def test_frame_init_uses_fy_for_vertical():
    """Stretching fy by k must leave ty/z unchanged when the pixel span is
    scaled by k too (pure pinhole consistency) — fails under the fx/fy
    swap because z and ty then pick up a factor fx/fy."""
    from smpltpu.solve.init import estimate_frame_init

    rest = np.zeros((24, 3))
    rest[:, 1] = np.linspace(-0.8, 0.8, 24)       # 1.6 m vertical span
    kp = np.zeros((17, 4))
    kp[:, 0] = np.arange(17)
    kp[:, 1] = 400.0
    kp[:, 2] = np.linspace(200.0, 600.0, 17)      # 400 px vertical span
    kp[:, 3] = 1.0

    base = estimate_frame_init(kp, rest, _cam(1000.0, 800.0, 400.0, 400.0))
    # z = fy * span_m_over_sampled_joints / span_px
    span_m = rest[:17, 1].max() - rest[:17, 1].min()
    np.testing.assert_allclose(base[6], 800.0 * span_m / 400.0, rtol=1e-12)
    # doubling fy and the pixel span together cancels exactly
    kp2 = kp.copy()
    kp2[:, 2] = (kp[:, 2] - 400.0) * 2.0 + 400.0
    again = estimate_frame_init(kp2, rest, _cam(1000.0, 1600.0, 400.0, 400.0))
    np.testing.assert_allclose(again[4:7], base[4:7], rtol=1e-12)


@pytest.mark.parametrize("mode", ["single", "multi"])
def test_video_driver_forwards_hyperparams(tmp_path, monkeypatch, mode):
    """--iters/--beta-pose/--beta-shape (+ --lambda-t/--s2-iters in multi
    mode) must reach the underlying CLI's parser."""
    from smpltpu.pipeline import multi as multi_cli
    from smpltpu.pipeline import single as single_cli
    from smpltpu.pipeline import video as video_cli

    kps = tmp_path / "kps"
    kps.mkdir()
    (kps / "frame_0000.json").write_text("[]")

    captured = {}

    def fake_main(args):
        captured["args"] = list(args)
        return 0

    monkeypatch.setattr(single_cli, "main", fake_main)
    monkeypatch.setattr(multi_cli, "main", fake_main)
    monkeypatch.setattr(video_cli, "_blank_frames",
                        lambda kps_dir, out_dir, size: str(tmp_path))

    argv = ["model.npz", str(kps), str(tmp_path / "out"), "--mode", mode,
            "--no-video", "--iters", "33", "--beta-pose", "7.5",
            "--beta-shape", "12.5"]
    if mode == "multi":
        argv += ["--lambda-t", "4.5", "--s2-iters", "21"]
    assert video_cli.main(argv) == 0

    got = captured["args"]
    if mode == "single":
        opts = single_cli.parse_args(got)
        assert opts["max_iters"] == 33
        assert opts["beta_pose"] == 7.5 and opts["beta_shape"] == 12.5
    else:
        opts = multi_cli.parse_args(got)
        assert opts["max_iters_s1"] == 33 and opts["max_iters_s2"] == 33
        assert opts["beta_pose"] == 7.5 and opts["beta_shape"] == 12.5
        assert opts["lambda_t"] == 4.5 and opts["s2_iters"] == 21
        assert opts["batched_windows"] and opts["init_from_anchors"]


def test_video_driver_defaults_unchanged(tmp_path, monkeypatch):
    """With no hyperparameter flags the driver must emit NO positional
    numerics (the underlying parser defaults stay in charge)."""
    from smpltpu.pipeline import multi as multi_cli
    from smpltpu.pipeline import video as video_cli

    kps = tmp_path / "kps"
    kps.mkdir()
    (kps / "frame_0000.json").write_text("[]")
    captured = {}
    monkeypatch.setattr(multi_cli, "main",
                        lambda a: captured.setdefault("args", list(a)) and 0 or 0)
    monkeypatch.setattr(video_cli, "_blank_frames",
                        lambda kps_dir, out_dir, size: str(tmp_path))
    assert video_cli.main(["m.npz", str(kps), str(tmp_path / "o"),
                           "--no-video"]) == 0
    opts = multi_cli.parse_args(captured["args"])
    assert opts["max_iters_s1"] == 1000 and opts["beta_pose"] == 5.0


def test_load_dataset_lfs_stub_message(tmp_path):
    from smpltpu.pipeline.common import load_dataset
    from smpltpu.utils.image import imwrite

    stub = tmp_path / "model.npz"
    stub.write_bytes(b"version https://git-lfs.github.com/spec/v1\noid sha256:0\n")
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    imwrite(str(imgs / "frame_0000.png"), np.zeros((8, 8, 3), np.uint8))
    kps = tmp_path / "kps"
    kps.mkdir()
    (kps / "frame_0000.json").write_text("[]")
    with pytest.raises(ValueError, match="git-LFS pointer stub"):
        load_dataset(str(stub), str(kps), str(imgs), 1.0)


def test_multi_cli_parses_cg_rtol():
    from smpltpu.pipeline import multi as multi_cli
    opts = multi_cli.parse_args(["m", "k", "i", "o", "--linear", "pcg",
                                 "--cg-rtol", "1e-3"])
    assert opts["cg_rtol"] == 1e-3 and opts["linear"] == "pcg"
    assert multi_cli.parse_args(["m", "k", "i", "o"])["cg_rtol"] == 0.0
