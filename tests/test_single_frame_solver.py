"""Solver tests on a synthetic rig: generate keypoints by projecting a
known pose through the solver's own skeleton model, then assert the batched
LM recovers it from the reference's default initialization (SURVEY.md
section 4(c) — this substitutes for the missing Ceres baseline)."""

import jax.numpy as jnp
import numpy as np
import pytest

from smpltpu.constants import (
    FIXED_JOINTS_POSE_ONLY,
    N_KP_SLOTS,
    USE_SMPL,
    init_root_rotation,
)
from smpltpu.energy import (
    keypoint_residuals,
    pack_frame_params,
    skeleton_joints_cam,
)
from smpltpu.energy.params import (
    FrameParams,
    N_FRAME_PARAMS,
    init_frame_params,
    unpack_frame_params,
)
from smpltpu.energy.reproj import project
from smpltpu.models import SMPLModel
from smpltpu.solve import fit_frames, make_single_frame_problem
from smpltpu.utils import default_intrinsics, mean_pixel_error

W, H = 720, 1280


def make_gt_params(rng, n_joints=24, squash_fixed=True, dtype=jnp.float64):
    """A plausible ground-truth pose near the default init."""
    aa = rng.normal(size=(n_joints - 1, 3)) * 0.15
    if squash_fixed:
        for j in FIXED_JOINTS_POSE_ONLY:
            aa[j - 1] = 0.0  # the solver can't recover frozen joints
    fp = FrameParams(
        scale=jnp.asarray(1.0, dtype),
        root_aa=jnp.asarray(rng.normal(size=3) * 0.1, dtype),
        root_t=jnp.asarray(np.array([0.1, -0.1, 3.2]), dtype),
        joint_aa=jnp.asarray(aa, dtype),
    )
    return pack_frame_params(fp)


def project_gt_keypoints(gt_vec, shape, spec, cam):
    joints = skeleton_joints_cam(gt_vec, shape, spec)
    uv = np.asarray(project(joints, cam))
    kp = np.zeros((N_KP_SLOTS, 4))
    kp[:, 0] = USE_SMPL
    kp[:, 1:3] = uv[USE_SMPL]
    kp[:, 3] = 1.0
    return kp


@pytest.fixture(scope="module")
def rig(small_model_dict):
    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float64)
    cam = default_intrinsics(W, H, dtype=jnp.float64)
    prob = make_single_frame_problem(model, init_root_rotation(), cam,
                                     beta_pose=1.0, dtype=jnp.float64)
    return model, cam, prob


def test_recovers_known_pose(rig, rng):
    model, cam, prob = rig
    f = 3
    gts = [make_gt_params(rng) for _ in range(f)]
    kps = np.stack([
        project_gt_keypoints(g, jnp.zeros(10), prob.spec, cam) for g in gts])
    x0 = jnp.tile(init_frame_params(dtype=jnp.float64), (f, 1))
    state = fit_frames(prob, x0, jnp.asarray(kps), max_iters=120)

    for i in range(f):
        joints_fit = skeleton_joints_cam(state.x[i], jnp.zeros(10), prob.spec)
        uv_fit = np.asarray(project(joints_fit, cam))
        err = np.linalg.norm(uv_fit[USE_SMPL] - kps[i, :, 1:3], axis=-1).mean()
        assert err < 0.5, f"frame {i}: residual pixel error {err}"
        assert bool(state.converged[i]) or int(state.n_accepted[i]) > 10


def test_empty_frame_is_noop(rig):
    model, cam, prob = rig
    x0 = init_frame_params(dtype=jnp.float64)[None]
    kp = np.zeros((1, N_KP_SLOTS, 4))
    kp[0, :, 0] = USE_SMPL
    state = fit_frames(prob, x0, jnp.asarray(kp), max_iters=20)
    fp = unpack_frame_params(state.x[0])
    # only the pose prior acts; root/scale/trans untouched at optimum
    assert float(fp.scale) == pytest.approx(1.0)
    np.testing.assert_allclose(np.asarray(fp.root_t), [0, 0, 3.0], atol=1e-6)


def test_scale_bounds_respected(rig, rng):
    model, cam, prob = rig
    # GT far outside bounds: solver should clamp at 3.0
    gt = make_gt_params(rng)
    gt = gt.at[0].set(6.0)  # scale 6 -> projected keypoints are 'too big'
    kp = project_gt_keypoints(gt, jnp.zeros(10), prob.spec, cam)[None]
    x0 = init_frame_params(dtype=jnp.float64)[None]
    state = fit_frames(prob, x0, jnp.asarray(kp), max_iters=80)
    assert 0.3 - 1e-9 <= float(state.x[0, 0]) <= 3.0 + 1e-9


def test_frozen_joints_stay_zero(rig, rng):
    model, cam, prob = rig
    gt = make_gt_params(rng, squash_fixed=False)  # GT moves the fixed joints
    kp = project_gt_keypoints(gt, jnp.zeros(10), prob.spec, cam)[None]
    x0 = init_frame_params(dtype=jnp.float64)[None]
    state = fit_frames(prob, x0, jnp.asarray(kp), max_iters=60)
    fp = unpack_frame_params(state.x[0])
    for j in FIXED_JOINTS_POSE_ONLY:
        np.testing.assert_allclose(np.asarray(fp.joint_aa[j - 1]), 0.0,
                                   err_msg=f"joint {j} moved")


def test_opt_shape_recovers_shape_signal(small_model_dict, rng):
    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float64)
    cam = default_intrinsics(W, H, dtype=jnp.float64)
    prob = make_single_frame_problem(model, init_root_rotation(), cam,
                                     beta_pose=1.0, beta_shape=0.5,
                                     opt_shape=True, dtype=jnp.float64)
    gt_shape = jnp.asarray(rng.normal(size=10) * 1.0)
    gt_vec = make_gt_params(rng, squash_fixed=False)
    kp = project_gt_keypoints(gt_vec, gt_shape, prob.spec, cam)[None]
    x0 = jnp.concatenate([init_frame_params(dtype=jnp.float64),
                          jnp.zeros(10, jnp.float64)])[None]
    state = fit_frames(prob, x0, jnp.asarray(kp), max_iters=150)
    joints_fit = skeleton_joints_cam(state.x[0, :N_FRAME_PARAMS],
                                     state.x[0, N_FRAME_PARAMS:], prob.spec)
    uv_fit = np.asarray(project(joints_fit, cam))
    err = np.linalg.norm(uv_fit[USE_SMPL] - np.asarray(kp)[0, :, 1:3], axis=-1).mean()
    assert err < 1.0, f"pose+shape fit pixel error {err}"


def test_gmm_prior_pulls_toward_mode(small_model_dict, gmm_prior):
    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float64)
    cam = default_intrinsics(W, H, dtype=jnp.float64)
    prob = make_single_frame_problem(model, init_root_rotation(), cam,
                                     beta_pose=50.0, gmm_dict=gmm_prior,
                                     dtype=jnp.float64)
    # no keypoints: optimum of the GMM prior alone is (near) a component mean
    kp = np.zeros((1, N_KP_SLOTS, 4))
    kp[0, :, 0] = USE_SMPL
    x0 = init_frame_params(dtype=jnp.float64)[None]
    state = fit_frames(prob, x0, jnp.asarray(kp), max_iters=100)
    aa = np.asarray(state.x[0, 7:])
    # joints 10/11/22/23 are frozen at zero on the pose-only path, so the
    # constrained optimum is the conditional mode, not the mean — assert
    # first-order optimality of the chosen component's NLL over free dims.
    free = np.ones(69, dtype=bool)
    for j in FIXED_JOINTS_POSE_ONLY:
        free[3 * (j - 1):3 * j] = False
    white = np.einsum("kdr,kd->kr", gmm_prior["prec_cho"], aa[None] - gmm_prior["means"])
    c = -np.log(gmm_prior["weights"]) + 0.5 * gmm_prior["logdet_cov"]
    nll = 0.5 * (white ** 2).sum(-1) + (c - c.min())
    k = int(nll.argmin())
    prec = gmm_prior["prec_cho"][k] @ gmm_prior["prec_cho"][k].T
    grad = prec @ (aa - gmm_prior["means"][k])
    assert np.abs(grad[free]).max() < 1e-3, f"prior gradient not ~0: {np.abs(grad[free]).max()}"
    assert bool(state.converged[0])


def test_tr_solver_chol_matches_eigh(rig):
    """The Cholesky-Newton More-Sorensen subproblem solver
    (LMConfig.tr_solver='chol') is an exact-step implementation like the
    eigh reference — from the reference's blind cold init both must land
    at (to tolerance) the same optimum with the same accuracy. dogleg is
    inexact; assert only that it solves the problem sanely.

    LOCAL seeded rng, not the session fixture: cold-init fits are
    basin-sensitive, so the asserted draws must not depend on suite
    order (the full-suite rng state once handed this test a draw where
    the two exact solvers' optima differ past tolerance — a basin flip
    from fp-level step differences, the documented cold-init lottery,
    not an exactness defect)."""
    from smpltpu.solve import build_fitter
    from smpltpu.solve.lm import LMConfig

    model, cam, prob = rig
    rng = np.random.default_rng(20260819)
    f = 3
    gts = [make_gt_params(rng) for _ in range(f)]
    kps = jnp.asarray(np.stack([
        project_gt_keypoints(g, jnp.zeros(10), prob.spec, cam)
        for g in gts]))
    x0 = jnp.tile(init_frame_params(dtype=jnp.float64), (f, 1))

    states = {}
    for tr in ("eigh", "chol", "dogleg"):
        cfg = LMConfig(max_iters=120, huber_delta=3.0, tr_solver=tr)
        st = build_fitter(prob, 120, dtype=jnp.float64, lm_cfg=cfg)(x0, kps)
        states[tr] = st
        assert bool(jnp.all(jnp.isfinite(st.x))), tr

    ce = np.asarray(states["eigh"].cost)
    cc = np.asarray(states["chol"].cost)
    np.testing.assert_allclose(cc, ce, rtol=1e-4, atol=1e-10)
    # both exact solvers must fit the synthetic keypoints to sub-pixel
    for tr in ("eigh", "chol"):
        for i in range(f):
            joints_fit = skeleton_joints_cam(
                states[tr].x[i], jnp.zeros(10), prob.spec)
            uv_fit = np.asarray(project(joints_fit, cam))
            err = np.linalg.norm(
                uv_fit[USE_SMPL] - np.asarray(kps)[i, :, 1:3], axis=-1).mean()
            assert err < 0.5, f"{tr} frame {i}: {err}"
    # dogleg (inexact boundary step, A/B option only) may land in a worse
    # basin — assert only sane behavior: finite (above) and a strict
    # decrease from the cold-init cost on every frame. (The session-scoped
    # rng makes the draws order-dependent, so a tightness bound vs the
    # exact solvers would be flaky.)
    dh = np.asarray(states["dogleg"].cost_history)
    dc = np.asarray(states["dogleg"].cost)
    assert np.all(dc < dh[:, 0]), (dc, dh[:, 0])


def test_chunked_fitter_matches_vmap(rig, rng):
    """build_fitter(chunk=N) == the plain vmapped batch, bit-tight in
    f64: converged frames freeze (lm.step's do_move mask), so a chunk's
    extra or fewer batch iterations never move them. Exercises pad
    (5 frames, chunk 2)."""
    from smpltpu.solve import build_fitter

    model, cam, prob = rig
    f = 5
    gts = [make_gt_params(rng) for _ in range(f)]
    kps = jnp.asarray(np.stack([
        project_gt_keypoints(g, jnp.zeros(10), prob.spec, cam)
        for g in gts]))
    x0 = jnp.tile(init_frame_params(dtype=jnp.float64), (f, 1))

    plain = build_fitter(prob, 60, dtype=jnp.float64)(x0, kps)
    chunked = build_fitter(prob, 60, dtype=jnp.float64, chunk=2)(x0, kps)
    np.testing.assert_allclose(np.asarray(chunked.cost),
                               np.asarray(plain.cost), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(chunked.x), np.asarray(plain.x),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(chunked.iters_run)[:2],
                                  np.asarray(plain.iters_run)[:2])


def test_mean_pixel_error_metric(rig, rng):
    model, cam, prob = rig
    from smpltpu.models import smpl_forward
    from smpltpu.utils.writeback import params_to_pose
    gt = make_gt_params(rng)
    pose = params_to_pose(gt, jnp.asarray(init_root_rotation()), 24)
    out = smpl_forward(model, jnp.zeros(10), pose.rotations, pose.root_pos)
    kp = np.zeros((N_KP_SLOTS, 4))
    kp[:, 0] = USE_SMPL
    uv = np.asarray(project(out["joints"], cam))
    kp[:, 1:3] = uv[USE_SMPL] + 2.0  # constant (2,2) pixel offset
    kp[:, 3] = 1.0
    err = float(mean_pixel_error(out["joints"], jnp.asarray(kp), cam))
    assert err == pytest.approx(np.sqrt(8.0), rel=1e-6)
    # masked slots excluded from the average
    kp[5, 1:3] += 1000.0
    kp[5, 3] = 0.0
    err2 = float(mean_pixel_error(out["joints"], jnp.asarray(kp), cam))
    assert err2 == pytest.approx(np.sqrt(8.0), rel=1e-6)
