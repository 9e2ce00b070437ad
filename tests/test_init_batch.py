"""Batched init builders (solve/init.py round 5) pinned equal to the
per-frame reference implementations.

Why they exist: the per-frame estimate_frame_init/estimate_root_orient
are ~60 tiny numpy ops each — a Python-loop x0 build costs ~1.5-3 ms of
HOST time per frame on this class of box, which at 1000 frames is the
same order as the whole batched device fit (the round-5 adaptive-row
attribution). fit_adaptive and make_start_set now vectorize over frames
(batched eigh/svd/solve, masked sums); these tests pin every branch of
the batched twins to the scalar originals:

  * rotation_from_aa_batch / aa_from_rotation_batch on all Shepperd
    branches (incl. angle ~ pi and identity);
  * estimate_root_orient_batch ok-mask == per-frame None-ness, values
    equal, across realistic projected torsos AND the degenerate zoo
    (too few points, collinear, planar, out-of-depth-bounds);
  * estimate_frame_init_batch == stacked per-frame loop for orient on
    and off;
  * make_start_set == the pre-round-5 per-frame loop (reference copy
    kept HERE), for orient on/off, custom yaw grids, pose seeds.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from smpltpu.constants import N_KP_SLOTS, USE_SMPL, init_root_rotation
from smpltpu.energy import skeleton_joints_cam
from smpltpu.energy.params import frame_param_layout, init_frame_params
from smpltpu.energy.reproj import project
from smpltpu.models import SMPLModel, make_synthetic_model
from smpltpu.solve import make_single_frame_problem, make_start_set
from smpltpu.solve.init import (
    aa_from_rotation,
    aa_from_rotation_batch,
    estimate_frame_init,
    estimate_frame_init_batch,
    estimate_root_orient,
    estimate_root_orient_batch,
    rest_joints_cam,
    rotation_from_aa,
    rotation_from_aa_batch,
)
from smpltpu.utils import default_intrinsics


@pytest.fixture(scope="module")
def rig():
    import jax

    model = SMPLModel.from_dict(make_synthetic_model(), dtype=jnp.float64)
    cam = default_intrinsics(720, 1280)
    prob = make_single_frame_problem(
        model, init_root_rotation(), cam, beta_pose=0.0, dtype=jnp.float64)
    rest = rest_joints_cam(prob.spec)
    rng = np.random.default_rng(23)
    f_dim = 40
    gt = np.tile(np.asarray(init_frame_params(dtype=jnp.float64)),
                 (f_dim, 1))
    # a spread of root rotations incl. large non-yaw ones, varied depth
    aa = rng.normal(size=(f_dim, 3))
    aa = aa / np.linalg.norm(aa, axis=1, keepdims=True) \
        * rng.uniform(0.0, 2.4, size=(f_dim, 1))
    gt[:, 1:4] = aa
    gt[:, 4:6] = rng.normal(size=(f_dim, 2)) * 0.4
    gt[:, 6] = rng.uniform(2.0, 6.0, size=f_dim)
    gt[:, 7:] = rng.normal(size=(f_dim, 69)) * 0.25
    import jax as _jax
    uv = np.asarray(_jax.jit(_jax.vmap(
        lambda p: project(skeleton_joints_cam(
            p, jnp.zeros(10, jnp.float64), prob.spec), cam)))(
                jnp.asarray(gt)))
    kp = np.zeros((f_dim, N_KP_SLOTS, 4))
    kp[:, :, 0] = USE_SMPL
    kp[:, :, 1:3] = uv[:, USE_SMPL] + rng.normal(
        size=(f_dim, N_KP_SLOTS, 2)) * 1.5
    kp[:, :, 3] = 1.0
    # degrade a spread of frames into every degenerate class:
    kp[0, :, 3] = 0.0                      # empty frame
    kp[1, 3:, 3] = 0.0                     # 3 valid points (< min_pts)
    kp[2, :, 1] = 400.0                    # all detections on a vertical
    kp[2, :, 2] = np.linspace(100, 900, N_KP_SLOTS)   # line (collinear-ish)
    kp[3, :, 1:3] = kp[3, 0:1, 1:3] + rng.normal(
        size=(N_KP_SLOTS, 2)) * 0.01       # near-coincident points
    kp[4, :, 1:3] *= 40.0                  # blows the depth gate (alpha)
    kp[5, ::2, 3] = 0.0                    # half the joints missing
    kp[6, [0, 1, 2], 3] = 0.0              # pelvis+hips gone (torso < 4
    #                                        -> all-joints fallback)
    kp[7, :, 1:3] = kp[7, 0:1, 1:3]        # EXACTLY coincident points:
    #   the planar-branch 2x2 solve hits an exact zero pivot that a
    #   det-pre-guard can miss — the round-5 fuzz found the batched
    #   np.linalg.solve raising and killing the whole batch where the
    #   scalar path returns None for just that frame (_rowwise_lapack)
    return prob, rest, cam, kp


def test_rotation_roundtrip_batch_matches_scalar(rig):
    rng = np.random.default_rng(3)
    aa = rng.normal(size=(64, 3))
    aa[0] = 0.0
    aa[1] = (np.pi - 1e-9) * np.array([1.0, 0.0, 0.0])   # angle ~ pi
    aa[2] = (np.pi - 1e-9) * np.array([0.0, 1.0, 0.0])
    aa[3] = (np.pi - 1e-9) * np.array([0.0, 0.0, 1.0])
    aa[4] = np.array([1e-14, 0.0, 0.0])                  # below the floor
    r_b = rotation_from_aa_batch(aa)
    r_s = np.stack([rotation_from_aa(a) for a in aa])
    np.testing.assert_allclose(r_b, r_s, rtol=0, atol=1e-14)
    aa_b = aa_from_rotation_batch(r_b)
    aa_s = np.stack([aa_from_rotation(r) for r in r_s])
    np.testing.assert_allclose(aa_b, aa_s, rtol=0, atol=1e-12)


def test_root_orient_batch_matches_scalar(rig):
    prob, rest, cam, kp = rig
    r_b, t_b, ok_b = estimate_root_orient_batch(kp, rest, cam)
    for f in range(kp.shape[0]):
        est = estimate_root_orient(kp[f], rest, cam)
        assert ok_b[f] == (est is not None), f
        if est is not None:
            np.testing.assert_allclose(r_b[f], est[0], rtol=1e-9,
                                       atol=1e-11, err_msg=str(f))
            np.testing.assert_allclose(t_b[f], est[1], rtol=1e-9,
                                       atol=1e-9, err_msg=str(f))
    # the fixture must actually exercise both outcomes
    assert ok_b.any() and (~ok_b).any()


@pytest.mark.parametrize("orient", [False, True])
def test_frame_init_batch_matches_scalar(rig, orient):
    prob, rest, cam, kp = rig
    x_b = estimate_frame_init_batch(kp, rest, cam, orient=orient)
    x_s = np.stack([estimate_frame_init(kp[f], rest, cam, orient=orient)
                    for f in range(kp.shape[0])])
    np.testing.assert_allclose(x_b, x_s, rtol=1e-9, atol=1e-9)


def _make_start_set_reference(kp_batch, spec, cam, yaws,
                              include_reference_init, n_extra_dims,
                              pose_seeds, orient):
    """The pre-round-5 per-frame make_start_set loop, kept verbatim as
    the semantic reference for the vectorized production version."""
    rest = rest_joints_cam(spec)
    n_j = len(spec.parents)
    p_dim = frame_param_layout(n_j)["total"]
    starts = []
    necker = np.diag([1.0, 1.0, -1.0])
    for f in range(kp_batch.shape[0]):
        base = estimate_frame_init(kp_batch[f], rest, cam, n_joints=n_j,
                                   orient=orient)
        r_est = (rotation_from_aa(base[1:4])
                 if orient and np.any(base[1:4] != 0.0) else None)
        row = []
        for yaw in yaws:
            v = base.copy()
            if r_est is None:
                v[2] = yaw
            elif np.isclose(abs(yaw), np.pi):
                v[1:4] = aa_from_rotation(necker @ r_est @ necker)
            elif not np.isclose(yaw, 0.0):
                v[1:4] = aa_from_rotation(
                    rotation_from_aa(np.array([0.0, yaw, 0.0])) @ r_est)
            row.append(v)
        if include_reference_init:
            row.append(np.asarray(init_frame_params(n_j,
                                                    dtype=np.float64)))
        if pose_seeds is not None:
            for seed in np.asarray(pose_seeds, np.float64):
                v = base.copy()
                v[7:p_dim] = seed
                row.append(v)
        starts.append(np.stack(row))
    out = np.stack(starts)
    if n_extra_dims > 0:
        out = np.concatenate(
            [out, np.zeros(out.shape[:2] + (n_extra_dims,))], axis=-1)
    return out


@pytest.mark.parametrize("orient", [False, True])
def test_make_start_set_matches_reference_loop(rig, orient):
    prob, rest, cam, kp = rig
    rng = np.random.default_rng(5)
    seeds = rng.normal(size=(2, 69)) * 0.3
    for kwargs in (
        {},
        {"yaws": (0.0, 0.7, np.pi), "include_reference_init": False},
        {"n_extra_dims": 10, "pose_seeds": seeds},
    ):
        got = make_start_set(kp, prob.spec, cam, orient=orient, **kwargs)
        want = _make_start_set_reference(
            kp, prob.spec, cam,
            kwargs.get("yaws", (0.0, np.pi / 2, -np.pi / 2, np.pi)),
            kwargs.get("include_reference_init", True),
            kwargs.get("n_extra_dims", 0),
            kwargs.get("pose_seeds", None), orient)
        assert got.shape == want.shape, kwargs
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9,
                                   err_msg=str(kwargs))
