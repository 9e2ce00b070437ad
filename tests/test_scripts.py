"""Tooling-script tests (L6-L8 parity): eval, loss-curve plot, npz fixer,
GMM converter, video assembly (gated), and the loss_curve.txt writer."""

import csv
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, os.path.join(REPO, "data", "scripts"))


def test_eval_script(tmp_path, capsys):
    log = tmp_path / "log.csv"
    log.write_text("frame,mean_pixel_error_px,time_ms\n0,10.0,2000\n1,20.0,4000\n")
    import eval as eval_mod
    assert eval_mod.main([str(log)]) == 0
    out = capsys.readouterr().out
    assert "Mean Pixel Error: 15.0000" in out
    assert "Optimization Time (s): 3.0000" in out


def test_loss_curve_plot(tmp_path, capsys):
    src = tmp_path / "loss_curve.txt"
    src.write_text("iteration,loss\n0,100.0\n1,50.0\n2,25.0\n")
    dst = tmp_path / "curve.png"
    import loss_curve_plot
    assert loss_curve_plot.main([str(src), str(dst)]) == 0
    assert dst.is_file() or "printing curve" in capsys.readouterr().out


def test_npz_fixer(tmp_path):
    src = tmp_path / "raw.npz"
    kintree = np.array([[0, 0, 1], [0, 1, 2]], dtype=np.uint32)
    np.savez(src, kintree_table=kintree, v_template=np.zeros((4, 3)))
    import npz_fixer
    assert npz_fixer.main([str(src)]) == 0
    fixed = np.load(tmp_path / "raw_fixed.npz")
    assert fixed["kintree_table"][0, 0] == -1
    assert fixed["kintree_table"][0, 1] == 0
    np.testing.assert_array_equal(fixed["v_template"], np.zeros((4, 3)))


def test_convert_gmm(tmp_path):
    rng = np.random.default_rng(0)
    k, d = 3, 69
    means = rng.normal(size=(k, d))
    covs = np.stack([np.eye(d) * (i + 1) for i in range(k)])
    weights = np.array([0.5, 0.3, 0.2])
    src = tmp_path / "gmm.pkl"
    with open(src, "wb") as f:
        pickle.dump({"means": means, "covars": covs, "weights": weights}, f)
    dst = tmp_path / "pose_prior.txt"
    import convert_gmm_to_avatar
    assert convert_gmm_to_avatar.main([str(src), str(dst)]) == 0
    from smpltpu.io import load_pose_prior_txt
    prior = load_pose_prior_txt(str(dst))
    np.testing.assert_allclose(prior["means"], means, rtol=1e-12)
    np.testing.assert_allclose(prior["weights"], weights, rtol=1e-12)


def test_create_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from smpltpu.utils.image import imwrite
    frames = tmp_path / "frames"
    frames.mkdir()
    for i in (0, 1, 2, 10):  # natural sort must order frame_10 last
        imwrite(str(frames / f"frame_{i}.png"),
                np.full((32, 48, 3), i * 20, np.uint8))
    import create_video
    out = tmp_path / "vid.mp4"
    assert create_video.main([str(frames), str(out), "5"]) == 0
    assert out.is_file() and out.stat().st_size > 0
    assert create_video.natural_key("frame_10.png") > create_video.natural_key("frame_2.png")


def test_extract_keypoints_degrades_without_mediapipe():
    import extract_keypoints_mediapipe as ek
    if ek.mp_pose is None:
        with pytest.raises(RuntimeError, match="mediapipe"):
            ek.process_video("nonexistent.mp4")
    else:  # pragma: no cover - environment dependent
        with pytest.raises(ValueError):
            ek.process_video("nonexistent.mp4")


def test_extract_keypoints_format():
    """extract_keypoints output dict format matches what load_mp_json reads."""
    import extract_keypoints_mediapipe as ek

    class _LM:
        def __init__(self):
            self.x, self.y, self.z, self.visibility = 0.1, 0.2, 0.3, 0.9

    class _Landmarks:
        landmark = [_LM() for _ in range(33)]

    kps = ek.extract_keypoints(_Landmarks())
    assert len(kps) == 33
    assert set(kps[0]) == {"x", "y", "z", "visibility"}
    assert ek.extract_keypoints(None) == []
