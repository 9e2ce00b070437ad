"""High-level fit_video API tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from smpltpu.constants import N_KP_SLOTS, USE_SMPL, init_root_rotation
from smpltpu.energy import make_skeleton_spec, skeleton_joints_cam
from smpltpu.energy.reproj import project
from smpltpu.models import SMPLModel
from smpltpu.pipeline.api import fit_video
from smpltpu.utils import default_intrinsics
from tests.test_multi_frame import _smooth_gt_video

W, H = 720, 1280


@pytest.fixture(scope="module")
def api_video(small_model_dict):
    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float64)
    cam = default_intrinsics(W, H, dtype=jnp.float64)
    spec = make_skeleton_spec(model, init_root_rotation(), with_shape=True)
    rng = np.random.default_rng(9)
    f = 9
    gt = _smooth_gt_video(rng, f)
    kp = np.zeros((f, N_KP_SLOTS, 4))
    for i in range(f):
        uv = np.asarray(project(
            skeleton_joints_cam(gt[i], jnp.zeros(10), spec), cam))
        kp[i, :, 0] = USE_SMPL
        kp[i, :, 1:3] = uv[USE_SMPL]
        kp[i, :, 3] = 1.0
    return kp


def test_fit_video_single(small_model_dict, api_video):
    res = fit_video(small_model_dict, api_video, W, H, mode="single",
                    beta_pose=1.0, beta_shape=0.0, max_iters=40,
                    dtype=jnp.float64)
    assert res.params.shape == (9, 76)
    assert res.errors_px.shape == (9,)
    assert np.mean(res.errors_px) < 25.0
    assert res.verts is None


def test_fit_video_multi_with_verts(small_model_dict, api_video):
    res = fit_video(small_model_dict, api_video, W, H, mode="multi",
                    beta_pose=1.0, max_iters=60, anchor_skip=3, window=4,
                    overlap=1, s2_iters=20, want_verts=True,
                    dtype=jnp.float64)
    assert res.params.shape == (9, 76)
    assert res.shape.shape == (10,)
    assert res.verts.shape[0] == 9
    assert np.mean(res.errors_px) < 25.0


def test_fit_video_stream(small_model_dict, api_video):
    """mode='stream': causal per-frame fits, shape from the calibration
    buffer, every frame emitted with a valid (non-degenerate) pose."""
    res = fit_video(small_model_dict, api_video, W, H, mode="stream",
                    beta_pose=1.0, lambda_temporal=1.0, max_iters=40,
                    calib=3, dtype=jnp.float64)
    assert res.params.shape == (9, 76)
    assert res.shape.shape == (10,)
    assert np.all(res.params[:, 0] > 0)       # scale stays a valid body
    assert res.converged[:3].all()            # calibration frames
    assert np.mean(res.errors_px) < 25.0


def test_fit_video_stream_beta_shape(small_model_dict, api_video):
    """beta_shape must reach the calibration solve (review fix: it was
    silently dropped in stream mode): an enormous shape prior keeps the
    calibrated shape at ~zero."""
    res = fit_video(small_model_dict, api_video, W, H, mode="stream",
                    beta_pose=1.0, beta_shape=1e9, lambda_temporal=1.0,
                    max_iters=30, calib=3, dtype=jnp.float64)
    assert np.abs(res.shape).max() < 1e-3


def test_fit_video_bad_mode(small_model_dict, api_video):
    with pytest.raises(ValueError, match="unknown mode"):
        fit_video(small_model_dict, api_video, W, H, mode="banana")


def test_model_registry(tmp_path, monkeypatch):
    """Registry resolves synthetic specs, real npz paths, named models via
    $SMPLTPU_MODEL_DIR, and rejects LFS stubs with a clear message."""
    import pytest

    from smpltpu.io import save_smpl_npz
    from smpltpu.models.registry import find_model_file, resolve_model
    from smpltpu.models.synthetic import make_synthetic_model

    d = resolve_model("synthetic:64")
    assert d["v_template"].shape == (64, 3)

    p = tmp_path / "basicModel_f_lbs_10_207_0_v1.0.0.npz"
    save_smpl_npz(str(p), make_synthetic_model(n_verts=80, seed=3))
    monkeypatch.setenv("SMPLTPU_MODEL_DIR", str(tmp_path))
    assert find_model_file("female") == str(p)
    d = resolve_model("female")
    assert d["v_template"].shape == (80, 3)
    assert resolve_model(str(p))["v_template"].shape == (80, 3)

    stub = tmp_path / "basicModel_m_lbs_10_207_0_v1.0.0.npz"
    stub.write_bytes(b"version https://git-lfs.github.com/spec/v1\n")
    assert find_model_file("male") is None  # stub rejected
    with pytest.raises(ValueError, match="LFS pointer stub"):
        resolve_model(str(stub))
    with pytest.raises(ValueError, match="cannot resolve"):
        resolve_model("neutral")

    # directory specs (reference argv convention) — and the priority
    # rules around them (review fixes): a dir whose name merely STARTS
    # with 'synthetic' is a directory, not the built-in synthetic model;
    # a registry name keeps its search-path resolution even when a
    # same-named local directory exists
    dav = tmp_path / "synthetic_avatar"
    dav.mkdir()
    save_smpl_npz(str(dav / "model.npz"),
                  make_synthetic_model(n_verts=72, seed=5))
    assert resolve_model(str(dav))["v_template"].shape == (72, 3)
    monkeypatch.chdir(tmp_path)
    assert resolve_model("synthetic_avatar")["v_template"].shape == (72, 3)
    female_dir = tmp_path / "female"
    female_dir.mkdir()  # empty decoy dir must not shadow the registry name
    assert resolve_model("female")["v_template"].shape == (80, 3)
    empty = tmp_path / "no_model_here"
    empty.mkdir()
    with pytest.raises(ValueError, match="must contain model.npz"):
        resolve_model(str(empty))
