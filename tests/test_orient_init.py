"""Weak-perspective root-orientation data init (solve/init.py round 4).

Why it exists: the reference inits every frame at identity root
orientation (src/main_single_frame.cpp:219-224), and so did the repo's
span-based data init. On frames whose true root rotation is large the
robustified energy's basin is unreachable from identity, and a yaw-only
multi-start cannot recover non-yaw rotations — measured on the
1000-frame bench ramp (root rotation to ~2.2 rad): 873/1000 frames
stuck >6 px after phase A, 13.96 px mean AFTER escalating all of them
(docs/measurements/bench_sweep_r5_20260820.log, adapt1000-noorient).
estimate_root_orient reads the rotation off the 2D detections instead
(torso Procrustes + SVD lift + paraperspective ray correction). Scope
honesty (round-5 measurement): on frames whose hardness is the ROOT
rotation — this file's rigs — the estimate makes phase A land in the
right basin directly; on the full bench ramp, where ARTICULATION
amplitude also grows, it buys only 13.20 vs 13.96 px (888 hard) — the
at-scale lever there is fit_adaptive's temporal propagation
(tests/test_adaptive.py::test_fit_adaptive_propagate_recovers_hard_band,
BASELINE.md round-5).

Pinned here:
  * aa <-> rotation matrix round trips on all quaternion-extraction
    branches (incl. angle ~ pi);
  * estimate_root_orient recovers synthetic rigid ground truth within
    degrees (3D-spread torso) and its translation within cm at 1 px
    detection noise;
  * the planar-torso Necker ambiguity start (yaw=pi slot) is the
    depth-flipped estimate;
  * fit_adaptive(orient=True) recovers LARGE non-yaw root rotations in
    PHASE A on the solver's own synthetic model — the workload class the
    round-3 init provably lost (the identity-init phase A is asserted to
    fail on it, so this file cannot silently weaken into testing easy
    frames).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from smpltpu.constants import N_KP_SLOTS, USE_SMPL, init_root_rotation
from smpltpu.energy import skeleton_joints_cam
from smpltpu.energy.params import init_frame_params
from smpltpu.energy.reproj import project
from smpltpu.models import SMPLModel, make_synthetic_model
from smpltpu.solve import (
    aa_from_rotation,
    build_fitter,
    build_px_eval,
    estimate_frame_init,
    estimate_root_orient,
    fit_adaptive,
    make_start_set,
    make_single_frame_problem,
    rotation_from_aa,
)
from smpltpu.solve.init import rest_joints_cam
from smpltpu.utils import default_intrinsics


def test_aa_rotation_round_trip():
    rng = np.random.default_rng(0)
    axes = rng.normal(size=(32, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    # cover every Shepperd branch: tiny, generic, near-pi angles
    angles = np.concatenate([
        [1e-13, 1e-7, 0.3], rng.uniform(0.1, np.pi - 0.1, 26),
        [np.pi - 1e-7, np.pi - 1e-3, np.pi]])
    for ax, th in zip(axes, angles):
        aa = ax * th
        r = rotation_from_aa(aa)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(r) > 0
        aa2 = aa_from_rotation(r)
        # round trip up to the aa representation's antipodal wrap at pi
        r2 = rotation_from_aa(aa2)
        np.testing.assert_allclose(r2, r, atol=1e-9)


class _Cam:
    fx = 600.0
    fy = 600.0
    cx = 240.0
    cy = 135.0


def _rigid_rig(seed=3, noise_px=1.0, n=100, max_ang=2.5):
    """Synthetic rigid 'torso' (3D spread) under random Sim3-lite
    transforms + pinhole projection, yielding (kp, rest, R_gt, t_gt)."""
    rng = np.random.default_rng(seed)
    rest = np.zeros((24, 3))
    ids = [0, 1, 2, 16, 17]
    rest[0] = [0, 0, 0]
    rest[1] = [0.09, -0.08, 0.06]
    rest[2] = [-0.09, -0.08, -0.04]
    rest[16] = [0.17, 0.45, -0.12]
    rest[17] = [-0.17, 0.45, 0.09]
    out = []
    for _ in range(n):
        aa = rng.normal(size=3)
        aa = aa / np.linalg.norm(aa) * rng.uniform(0, max_ang)
        r = rotation_from_aa(aa)
        t = np.array([rng.uniform(-0.5, 0.5), rng.uniform(-0.5, 0.5),
                      rng.uniform(2.0, 5.0)])
        kp = np.zeros((len(ids), 4))
        for i, j in enumerate(ids):
            p = r @ rest[j] + t
            kp[i] = [j, _Cam.fx * p[0] / p[2] + _Cam.cx
                     + rng.normal() * noise_px,
                     _Cam.fy * p[1] / p[2] + _Cam.cy
                     + rng.normal() * noise_px, 1.0]
        out.append((kp, r, t))
    return rest, out


def test_estimate_root_orient_recovers_rigid_gt():
    rest, cases = _rigid_rig()
    ang_errs, t_errs = [], []
    for kp, r_gt, t_gt in cases:
        est = estimate_root_orient(kp, rest, _Cam)
        assert est is not None
        r_e, t_e = est
        np.testing.assert_allclose(r_e @ r_e.T, np.eye(3), atol=1e-9)
        ang_errs.append(np.degrees(np.linalg.norm(
            aa_from_rotation(r_e @ r_gt.T))))
        t_errs.append(np.linalg.norm(t_e - t_gt))
    ang_errs, t_errs = np.array(ang_errs), np.array(t_errs)
    # measured on this rig: median ~3 deg / ~4 cm; generous CI-stable caps
    assert np.median(ang_errs) < 8.0, np.median(ang_errs)
    assert np.percentile(ang_errs, 90) < 15.0
    assert np.median(t_errs) < 0.12, np.median(t_errs)


def test_estimate_root_orient_degenerate_returns_none():
    rest = np.zeros((24, 3))
    rest[[0, 1, 2, 16, 17]] = np.array(
        [[0, 0, 0], [0, 0.1, 0], [0, 0.2, 0], [0, 0.45, 0], [0, 0.6, 0]])
    # perfectly collinear torso -> rank-deficient 2D spread
    kp = np.zeros((5, 4))
    kp[:, 0] = [0, 1, 2, 16, 17]
    kp[:, 1] = 240.0
    kp[:, 2] = [135, 150, 165, 200, 220]
    kp[:, 3] = 1.0
    assert estimate_root_orient(kp, rest, _Cam) is None
    # too few detections
    kp[2:, 3] = 0.0
    assert estimate_root_orient(kp, rest, _Cam) is None


@pytest.fixture(scope="module")
def model_rig():
    import jax

    model = SMPLModel.from_dict(make_synthetic_model(), dtype=jnp.float64)
    cam = default_intrinsics(720, 1280)
    prob = make_single_frame_problem(
        model, init_root_rotation(), cam, beta_pose=0.0, dtype=jnp.float64)

    def project_kp(gt):
        uv = np.asarray(jax.jit(jax.vmap(
            lambda p: project(skeleton_joints_cam(
                p, jnp.zeros(10, jnp.float64), prob.spec), cam)))(
                    jnp.asarray(gt)))
        kp = np.zeros((gt.shape[0], N_KP_SLOTS, 4))
        kp[:, :, 0] = USE_SMPL
        kp[:, :, 1:3] = uv[:, USE_SMPL]
        kp[:, :, 3] = 1.0
        return kp

    return prob, project_kp


def test_orient_init_lands_near_large_rotation_gt(model_rig):
    """On the solver's own skeleton: frames at large NON-YAW root
    rotations (the bench-workload failure class) get an orient init whose
    pixel error is a small fraction of the identity init's."""
    prob, project_kp = model_rig
    rng = np.random.default_rng(11)
    f_dim = 6
    gt = np.tile(np.asarray(init_frame_params(dtype=jnp.float64)),
                 (f_dim, 1))
    # large mixed-axis root rotations, moderate articulation
    aa_gt = rng.normal(size=(f_dim, 3))
    aa_gt = aa_gt / np.linalg.norm(aa_gt, axis=1, keepdims=True) \
        * rng.uniform(1.2, 2.2, size=(f_dim, 1))
    gt[:, 1:4] = aa_gt
    gt[:, 4:6] = rng.normal(size=(f_dim, 2)) * 0.2
    gt[:, 6] = rng.uniform(2.5, 4.0, size=f_dim)
    gt[:, 7:] = rng.normal(size=(f_dim, 69)) * 0.2
    kp = project_kp(gt)

    rest = rest_joints_cam(prob.spec)
    px_eval = build_px_eval(prob)
    x_or = np.stack([estimate_frame_init(kp[f], rest, prob.cam, orient=True)
                     for f in range(f_dim)])
    x_id = np.stack([estimate_frame_init(kp[f], rest, prob.cam, orient=False)
                     for f in range(f_dim)])
    px_or = np.asarray(px_eval(jnp.asarray(x_or), jnp.asarray(kp)))
    px_id = np.asarray(px_eval(jnp.asarray(x_id), jnp.asarray(kp)))
    # the orientation must actually have been estimated (not fallback)
    assert all(np.any(x_or[f, 1:4] != 0.0) for f in range(f_dim))
    assert px_or.mean() < 0.55 * px_id.mean(), (px_or, px_id)


def test_fit_adaptive_orient_recovers_nonyaw_rotations(model_rig):
    """End-to-end: with orient=True, PHASE A alone (no escalation) must
    fit large non-yaw root rotations that the identity/span phase A
    provably loses at the same iteration budget. (The full identity-path
    ESCALATION often recovers clean synthetic frames too — the solver's
    yaw multi-start is genuinely strong — so the pinned contrast is
    phase A vs phase A, which is exactly what the orientation estimate
    changes. At the 1000-frame bench scale the estimate does NOT win
    end-to-end — articulation amplitude dominates there, see the module
    docstring and BASELINE.md round-5 — this rig isolates the
    root-rotation hardness class the estimator exists for.)
    """
    prob, project_kp = model_rig
    rng = np.random.default_rng(13)
    f_dim = 6
    gt = np.tile(np.asarray(init_frame_params(dtype=jnp.float64)),
                 (f_dim, 1))
    aa_gt = rng.normal(size=(f_dim, 3))
    aa_gt = aa_gt / np.linalg.norm(aa_gt, axis=1, keepdims=True) \
        * rng.uniform(1.4, 2.2, size=(f_dim, 1))
    gt[:, 1:4] = aa_gt
    gt[:, 6] = 3.0
    gt[:, 7:] = rng.normal(size=(f_dim, 69)) * 0.25
    kp = project_kp(gt)

    iters = 15
    thresh = 3.0
    fitter = build_fitter(prob, max_iters=iters, dtype=jnp.float64)
    px_eval = build_px_eval(prob)
    rest = rest_joints_cam(prob.spec)

    def phase_a(orient):
        x0 = np.stack([estimate_frame_init(kp[f], rest, prob.cam,
                                           orient=orient)
                       for f in range(f_dim)])
        st = fitter(jnp.asarray(x0), jnp.asarray(kp))
        return np.asarray(px_eval(st.x, jnp.asarray(kp)))

    px_id_a = phase_a(False)
    px_or_a = phase_a(True)
    # workload guard: identity/span phase A loses at least half of these
    # non-yaw rotations at this budget — if this rots, raise the rotation
    # magnitudes or cut iters
    assert (px_id_a > thresh).sum() >= f_dim // 2, px_id_a
    # the orientation phase A fits them all
    assert (px_or_a > thresh).sum() == 0, px_or_a
    assert px_or_a.mean() < 1.0, px_or_a

    # end-to-end adaptive with orient: nothing (or nearly nothing) left
    # to escalate, final quality uniformly good
    res_or = fit_adaptive(prob, kp, iters, px_thresh=thresh, fitter=fitter,
                          dtype=jnp.float64, orient=True)
    assert res_or.hard_idx.size == 0, res_or.px
    assert res_or.px.max() < thresh, res_or.px


def test_start_set_orient_composition(model_rig):
    """make_start_set(orient=True): start 0 carries the estimate, the yaw
    starts are camera-y compositions of it (not absolute slot writes),
    and the pi slot is the Necker flip of the estimate."""
    prob, project_kp = model_rig
    rng = np.random.default_rng(17)
    gt = np.tile(np.asarray(init_frame_params(dtype=jnp.float64)), (1, 1))
    gt[0, 1:4] = [0.9, 0.7, -0.4]
    gt[0, 6] = 3.0
    gt[0, 7:] = rng.normal(size=69) * 0.15
    kp = project_kp(gt)

    starts = make_start_set(kp, prob.spec, prob.cam)
    assert starts.shape[1] == 5   # 4 yaws + reference init
    base_r = rotation_from_aa(starts[0, 0, 1:4])
    # base orientation is a real estimate, within ~45 deg of GT
    d = aa_from_rotation(base_r @ rotation_from_aa(gt[0, 1:4]).T)
    assert np.degrees(np.linalg.norm(d)) < 45.0
    # yaw starts = R_y(yaw) @ R_est
    for k, yaw in ((1, np.pi / 2), (2, -np.pi / 2)):
        expect = rotation_from_aa(np.array([0.0, yaw, 0.0])) @ base_r
        np.testing.assert_allclose(
            rotation_from_aa(starts[0, k, 1:4]), expect, atol=1e-9)
    # pi slot = Necker flip
    neck = np.diag([1.0, 1.0, -1.0])
    np.testing.assert_allclose(
        rotation_from_aa(starts[0, 3, 1:4]), neck @ base_r @ neck,
        atol=1e-9)
    # reference init slot unchanged
    np.testing.assert_allclose(
        starts[0, 4], np.asarray(init_frame_params(dtype=np.float64)))
    # non-root slots of the yaw starts match the base start
    np.testing.assert_allclose(starts[0, 1, 4:], starts[0, 0, 4:])
