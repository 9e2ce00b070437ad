"""Unit tests for smpltpu.io: npz round-trip, kintree fix, GMM text format,
MediaPipe keypoint loader semantics (incl. the reference's pelvis-duplication
and visibility quirks, include/Utils.h:18-99)."""

import json
import os

import numpy as np
import pytest

from smpltpu.constants import N_KP_SLOTS, USE_SMPL
from smpltpu.io import (
    fix_kintree,
    load_keypoint_dir,
    load_mp_json,
    load_pose_prior_txt,
    load_smpl_npz,
    save_pose_prior_txt,
    save_smpl_npz,
)
from smpltpu.io.keypoints import keypoints_to_dense
from tests.conftest import fixture_path


def test_fix_kintree_root_parent():
    kt = np.array([[0, 0, 0, 1], [0, 1, 2, 3]])
    fixed = fix_kintree(kt)
    assert fixed[0, 0] == -1
    assert fixed[0, 1] == 0 and fixed[0, 3] == 1


def test_fix_kintree_uint_sentinel():
    kt = np.array([[2**32 - 1, 0], [0, 1]], dtype=np.uint32)
    fixed = fix_kintree(kt)
    assert fixed[0, 0] == -1


def test_npz_roundtrip(tmp_path, small_model_dict):
    path = str(tmp_path / "model.npz")
    save_smpl_npz(path, small_model_dict)
    loaded = load_smpl_npz(path)
    for key in ("v_template", "shapedirs", "J_regressor", "weights"):
        np.testing.assert_allclose(loaded[key], small_model_dict[key], atol=1e-12)
    np.testing.assert_array_equal(loaded["parents"], small_model_dict["parents"])
    np.testing.assert_array_equal(loaded["faces"], small_model_dict["faces"])
    np.testing.assert_allclose(
        loaded["joint_shape_reg"], small_model_dict["joint_shape_reg"], atol=1e-12)


def test_gmm_text_roundtrip(tmp_path, gmm_prior):
    path = str(tmp_path / "pose_prior.txt")
    save_pose_prior_txt(path, gmm_prior["weights"], gmm_prior["means"], gmm_prior["covs"])
    loaded = load_pose_prior_txt(path)
    np.testing.assert_allclose(loaded["weights"], gmm_prior["weights"], rtol=1e-12)
    np.testing.assert_allclose(loaded["means"], gmm_prior["means"], rtol=1e-12)
    np.testing.assert_allclose(loaded["covs"], gmm_prior["covs"], rtol=1e-12)
    # prec_cho contract: Precision = L @ L.T (include/Sim3BA.h:248-249)
    prec = loaded["prec_cho"] @ np.transpose(loaded["prec_cho"], (0, 2, 1))
    for k in range(len(prec)):
        np.testing.assert_allclose(prec[k] @ loaded["covs"][k], np.eye(69), atol=1e-6)


@pytest.mark.skipif(
    not os.path.isfile(fixture_path("data/avatar-model/pose_prior.txt")),
    reason="pose_prior fixture unavailable")
def test_gmm_reference_fixture():
    prior = load_pose_prior_txt(
        fixture_path("data/avatar-model/pose_prior.txt"))
    assert prior["means"].shape == (8, 69)
    np.testing.assert_allclose(prior["weights"].sum(), 1.0, atol=1e-6)


def _write_landmarks(path, landmarks):
    with open(path, "w") as f:
        json.dump(landmarks, f)


def _full_landmarks(vis=0.9):
    return [{"x": 0.1 + 0.02 * i, "y": 0.2 + 0.01 * i, "z": 0.0, "visibility": vis}
            for i in range(33)]


def test_load_mp_json_basic(tmp_path):
    path = str(tmp_path / "frame.json")
    _write_landmarks(path, _full_landmarks())
    kps = load_mp_json(path, 640, 480)
    jids = [k[0] for k in kps]
    # 15 mapped joints + pelvis twice (USE_SMPL trailing-zero quirk)
    assert jids == [1, 2, 4, 5, 7, 8, 10, 11, 15, 16, 17, 18, 19, 20, 21, 0, 0]
    # pelvis = midpoint of MP 23/24 scaled to pixels
    lm = _full_landmarks()
    exp_u = 0.5 * (lm[23]["x"] + lm[24]["x"]) * 640
    exp_v = 0.5 * (lm[23]["y"] + lm[24]["y"]) * 480
    assert kps[-1][1] == pytest.approx(exp_u)
    assert kps[-1][2] == pytest.approx(exp_v)
    # SMPL 1 (left hip) <- MP 23
    assert kps[0][1] == pytest.approx(lm[23]["x"] * 640)


def test_load_mp_json_visibility_filter(tmp_path):
    lm = _full_landmarks()
    lm[25]["visibility"] = 0.4  # MP 25 -> SMPL 4 (left knee) dropped
    path = str(tmp_path / "frame.json")
    _write_landmarks(path, lm)
    kps = load_mp_json(path, 100, 100)
    assert 4 not in [k[0] for k in kps]


def test_load_mp_json_empty_detection(tmp_path):
    path = str(tmp_path / "frame.json")
    _write_landmarks(path, [])
    assert load_mp_json(path, 100, 100) == []


def test_load_mp_json_missing_visibility_defaults(tmp_path):
    # robust loader: missing per-landmark visibility defaults to 1.0
    # (Utils.h:93); midpoint default also 1.0 (Utils.h:74-75)
    lm = [{"x": 0.5, "y": 0.5} for _ in range(33)]
    path = str(tmp_path / "frame.json")
    _write_landmarks(path, lm)
    kps = load_mp_json(path, 10, 10)
    assert len(kps) == N_KP_SLOTS  # everything kept
    # divergent main_single loader: midpoint default vis 0.0 -> pelvis dropped
    kps2 = load_mp_json(path, 10, 10, midpoint_default_vis=0.0)
    assert 0 not in [k[0] for k in kps2]


def test_keypoints_to_dense_layout(tmp_path):
    path = str(tmp_path / "frame.json")
    _write_landmarks(path, _full_landmarks())
    dense = keypoints_to_dense(load_mp_json(path, 640, 480))
    assert dense.shape == (N_KP_SLOTS, 4)
    np.testing.assert_array_equal(dense[:, 0], USE_SMPL)
    assert dense[:, 3].sum() == N_KP_SLOTS  # all slots valid
    # both pelvis slots carry the same observation
    np.testing.assert_allclose(dense[15, 1:3], dense[16, 1:3])


@pytest.mark.skipif(
    not os.path.isdir(fixture_path("data/keypoints/video1")),
    reason="video1 fixture unavailable")
def test_reference_video1_fixture():
    batch, paths = load_keypoint_dir(
        fixture_path("data/keypoints/video1"), 720, 1280)
    assert batch.shape == (38, N_KP_SLOTS, 4)
    # frames 0000-0030 are empty detections -> fully masked rows
    assert batch[0, :, 3].sum() == 0
    # later frames have detections
    assert batch[-1, :, 3].sum() > 0
