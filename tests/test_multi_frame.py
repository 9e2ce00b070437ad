"""Multi-frame BA tests: block-tridiagonal solver vs dense oracle, shared
shape + temporal recovery on a synthetic video, shape lock, window padding
equivalence, and vmapped window batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smpltpu.constants import N_KP_SLOTS, USE_SMPL, init_root_rotation
from smpltpu.energy import make_skeleton_spec, skeleton_joints_cam
from smpltpu.energy.params import (
    FrameParams,
    N_FRAME_PARAMS,
    init_frame_params,
    pack_frame_params,
)
from smpltpu.energy.reproj import project
from smpltpu.models import SMPLModel
from smpltpu.solve.multi_frame import (
    MultiFrameConfig,
    build_chunked_window_fit,
    build_multi_fitter,
)
from smpltpu.solve.tridiag import block_tridiag_solve, block_tridiag_solve_cr
from smpltpu.utils import default_intrinsics

W, H = 720, 1280


@pytest.mark.parametrize("solver,f", [
    ("scan", 6),
    ("cr", 1), ("cr", 2), ("cr", 6), ("cr", 7), ("cr", 8), ("cr", 13),
])
def test_block_tridiag_matches_dense(rng, solver, f):
    p, r = 9, 3
    mask = np.ones(p)
    mask[0] = 0.0
    blocks = []
    for _ in range(f):
        a = rng.normal(size=(p, p))
        blocks.append(a @ a.T + 5.0 * np.eye(p))
    diag_blocks = np.stack(blocks)
    off = -0.7 * rng.random(size=f - 1)
    rhs = rng.normal(size=(f, p, r))

    # dense assembly
    full = np.zeros((f * p, f * p))
    for i in range(f):
        full[i * p:(i + 1) * p, i * p:(i + 1) * p] = diag_blocks[i]
    for i in range(f - 1):
        e = off[i] * np.diag(mask)
        full[i * p:(i + 1) * p, (i + 1) * p:(i + 2) * p] = e
        full[(i + 1) * p:(i + 2) * p, i * p:(i + 1) * p] = e
    x_dense = np.linalg.solve(full, rhs.reshape(f * p, r))

    fn = block_tridiag_solve if solver == "scan" else block_tridiag_solve_cr
    x = fn(jnp.asarray(diag_blocks), jnp.asarray(off),
           jnp.asarray(mask), jnp.asarray(rhs))
    np.testing.assert_allclose(np.asarray(x).reshape(f * p, r), x_dense,
                               atol=1e-8)


def _smooth_gt_video(rng, n_frames, dtype=jnp.float64):
    """Smoothly varying poses (a 'video')."""
    base_aa = rng.normal(size=(23, 3)) * 0.15
    drift = rng.normal(size=(23, 3)) * 0.02
    vecs = []
    for f in range(n_frames):
        fp = FrameParams(
            scale=jnp.asarray(1.0, dtype),
            root_aa=jnp.asarray(np.array([0.05, 0.02, 0.0]) * f * 0.1, dtype),
            root_t=jnp.asarray(np.array([0.1 + 0.01 * f, -0.1, 3.2]), dtype),
            joint_aa=jnp.asarray(base_aa + f * drift, dtype),
        )
        vecs.append(pack_frame_params(fp))
    return jnp.stack(vecs)


def _project_video(gt_params, gt_shape, spec, cam):
    n_frames = gt_params.shape[0]
    kp = np.zeros((n_frames, N_KP_SLOTS, 4))
    for f in range(n_frames):
        joints = skeleton_joints_cam(gt_params[f], gt_shape, spec)
        uv = np.asarray(project(joints, cam))
        kp[f, :, 0] = USE_SMPL
        kp[f, :, 1:3] = uv[USE_SMPL]
        kp[f, :, 3] = 1.0
    return kp


@pytest.fixture(scope="module")
def mf_rig(small_model_dict):
    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float64)
    cam = default_intrinsics(W, H, dtype=jnp.float64)
    spec = make_skeleton_spec(model, init_root_rotation(), with_shape=True)
    return model, cam, spec


def test_multi_frame_recovers_pose_and_shape(mf_rig, rng):
    model, cam, spec = mf_rig
    f = 8
    gt_shape = jnp.asarray(rng.normal(size=10) * 0.8)
    gt_params = _smooth_gt_video(rng, f)
    kp = _project_video(gt_params, gt_shape, spec, cam)

    cfg = MultiFrameConfig(beta_pose=1.0, beta_shape=0.5, lambda_temporal=1.0,
                           max_iters=150)
    fit = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float64)
    params0 = jnp.tile(init_frame_params(dtype=jnp.float64), (f, 1))
    r0 = jnp.tile(jnp.asarray(init_root_rotation()), (f, 1, 1))
    st = fit(params0, jnp.zeros(10, jnp.float64), jnp.asarray(kp), r0)

    errs = []
    for i in range(f):
        joints = skeleton_joints_cam(st.params[i], st.shape, spec)
        uv = np.asarray(project(joints, cam))
        errs.append(np.linalg.norm(uv[USE_SMPL] - kp[i, :, 1:3], axis=-1).mean())
    assert np.mean(errs) < 1.0, f"multi-frame fit pixel error {np.mean(errs)}"
    assert int(st.n_accepted) > 5


def test_shape_lock(mf_rig, rng):
    """betaShape=1e5 is the reference's stage-2 'shape lock'
    (src/main_multi_frame.cpp:163): the shared shape must stay ~at init."""
    model, cam, spec = mf_rig
    f = 4
    gt_shape = jnp.asarray(rng.normal(size=10) * 1.0)
    gt_params = _smooth_gt_video(rng, f)
    kp = _project_video(gt_params, gt_shape, spec, cam)
    cfg = MultiFrameConfig(beta_pose=5.0, beta_shape=1e5, lambda_temporal=3.0,
                           max_iters=60)
    fit = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float64)
    params0 = jnp.tile(init_frame_params(dtype=jnp.float64), (f, 1))
    r0 = jnp.tile(jnp.asarray(init_root_rotation()), (f, 1, 1))
    st = fit(params0, jnp.zeros(10, jnp.float64), jnp.asarray(kp), r0)
    assert float(jnp.abs(st.shape).max()) < 1e-3


def test_strong_temporal_flattens_motion(mf_rig, rng):
    model, cam, spec = mf_rig
    f = 5
    gt_params = _smooth_gt_video(rng, f)
    kp = _project_video(gt_params, jnp.zeros(10), spec, cam)
    cfg = MultiFrameConfig(beta_pose=1.0, beta_shape=1e5, lambda_temporal=1e4,
                           max_iters=80)
    fit = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float64)
    params0 = jnp.tile(init_frame_params(dtype=jnp.float64), (f, 1))
    r0 = jnp.tile(jnp.asarray(init_root_rotation()), (f, 1, 1))
    st = fit(params0, jnp.zeros(10, jnp.float64), jnp.asarray(kp), r0)
    # with a huge temporal weight, consecutive pose vectors collapse together
    diffs = np.asarray(st.params[1:, 1:] - st.params[:-1, 1:])
    assert np.abs(diffs).max() < 1e-3


def test_padding_equivalence(mf_rig, rng):
    """A window padded with invalid frames must give the same solution on
    its real prefix as the unpadded solve."""
    model, cam, spec = mf_rig
    f_real, f_pad = 5, 8
    gt_params = _smooth_gt_video(rng, f_real)
    kp_real = _project_video(gt_params, jnp.zeros(10), spec, cam)
    cfg = MultiFrameConfig(beta_pose=2.0, beta_shape=25.0, lambda_temporal=3.0,
                           max_iters=40)

    fit_real = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float64)
    params0 = jnp.tile(init_frame_params(dtype=jnp.float64), (f_real, 1))
    r0 = jnp.tile(jnp.asarray(init_root_rotation()), (f_real, 1, 1))
    st_real = fit_real(params0, jnp.zeros(10, jnp.float64),
                       jnp.asarray(kp_real), r0)

    kp_pad = np.zeros((f_pad, N_KP_SLOTS, 4))
    kp_pad[:f_real] = kp_real
    kp_pad[f_real:, :, 0] = USE_SMPL
    params0p = jnp.tile(init_frame_params(dtype=jnp.float64), (f_pad, 1))
    r0p = jnp.tile(jnp.asarray(init_root_rotation()), (f_pad, 1, 1))
    valid = jnp.asarray(np.r_[np.ones(f_real), np.zeros(f_pad - f_real)])
    fit_pad = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float64)
    st_pad = fit_pad(params0p, jnp.zeros(10, jnp.float64),
                     jnp.asarray(kp_pad), r0p, valid)

    np.testing.assert_allclose(np.asarray(st_pad.params[:f_real]),
                               np.asarray(st_real.params), atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_pad.shape),
                               np.asarray(st_real.shape), atol=1e-6)


def test_vmapped_windows(mf_rig, rng):
    """Many sliding windows solve as one batched program (the 'full-video
    batched fitting' config, BASELINE.json configs[3])."""
    model, cam, spec = mf_rig
    n_win, f = 3, 4
    cfg = MultiFrameConfig(beta_pose=2.0, beta_shape=1e5, lambda_temporal=3.0,
                           max_iters=30)
    fit = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float64)
    kps, p0s = [], []
    for k in range(n_win):
        gtp = _smooth_gt_video(rng, f)
        kps.append(_project_video(gtp, jnp.zeros(10), spec, cam))
        p0s.append(jnp.tile(init_frame_params(dtype=jnp.float64), (f, 1)))
    kps = jnp.asarray(np.stack(kps))
    p0s = jnp.stack(p0s)
    r0 = jnp.tile(jnp.asarray(init_root_rotation()), (n_win, f, 1, 1))
    w0 = jnp.zeros((n_win, 10), jnp.float64)
    batched = jax.vmap(lambda a, b, c, d: fit(a, b, c, d))(p0s, w0, kps, r0)
    single = fit(p0s[1], w0[1], kps[1], r0[1])
    np.testing.assert_allclose(np.asarray(batched.params[1]),
                               np.asarray(single.params), atol=1e-8)


def test_chunked_window_fit_matches_vmap(mf_rig, rng):
    """build_chunked_window_fit (lax.map over chunk-sized vmapped batches,
    each with its own convergence exit) must reproduce the single vmapped
    batch exactly: converged windows freeze inside the while_loop, so a
    window's trajectory is independent of how long its batch keeps
    running. Uses n_win=5, chunk=2 so the replicate-last-window padding
    path is exercised too."""
    model, cam, spec = mf_rig
    n_win, f = 5, 4
    cfg = MultiFrameConfig(beta_pose=2.0, beta_shape=1e5, lambda_temporal=3.0,
                           max_iters=30)
    fit = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float64)
    kps, p0s = [], []
    for k in range(n_win):
        gtp = _smooth_gt_video(rng, f)
        kps.append(_project_video(gtp, jnp.zeros(10), spec, cam))
        p0s.append(jnp.tile(init_frame_params(dtype=jnp.float64), (f, 1)))
    kps = jnp.asarray(np.stack(kps))
    p0s = jnp.stack(p0s)
    r0 = jnp.tile(jnp.asarray(init_root_rotation()), (n_win, f, 1, 1))
    w0 = jnp.zeros((n_win, 10), jnp.float64)
    valid = jnp.ones((n_win, f), jnp.float64)

    full = jax.vmap(lambda a, b, c, d, e: fit(a, b, c, d, e))(
        p0s, w0, kps, r0, valid)
    chunked = build_chunked_window_fit(fit, 2)(p0s, w0, kps, r0, valid)

    assert chunked.params.shape == (n_win, f, p0s.shape[-1])
    np.testing.assert_allclose(np.asarray(chunked.params),
                               np.asarray(full.params), atol=1e-12)
    np.testing.assert_allclose(np.asarray(chunked.shape),
                               np.asarray(full.shape), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(chunked.iters_run),
                                  np.asarray(full.iters_run))
    np.testing.assert_array_equal(np.asarray(chunked.converged),
                                  np.asarray(full.converged))


def test_pcg_matches_exact_solver(mf_rig, rng):
    """The Jacobi-PCG arrowhead solver (MultiFrameConfig.linear="pcg" — the
    bench/CLI fast path: 672 vs 1136 ms stage-2 on the TPU bench at equal
    or better residual) must reach the same optimum as the exact
    block-tridiag elimination when converged (f64, generous cg_iters)."""
    model, cam, spec = mf_rig
    f = 6
    gt_shape = jnp.asarray(rng.normal(size=10) * 0.6)
    gt_params = _smooth_gt_video(rng, f)
    kp = _project_video(gt_params, gt_shape, spec, cam)
    params0 = jnp.tile(init_frame_params(dtype=jnp.float64), (f, 1))
    r0 = jnp.tile(jnp.asarray(init_root_rotation()), (f, 1, 1))

    outs = {}
    for lin in ("tridiag", "pcg"):
        cfg = MultiFrameConfig(beta_pose=2.0, beta_shape=10.0,
                               lambda_temporal=2.0, max_iters=80,
                               linear=lin, cg_iters=400)
        fit = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float64)
        outs[lin] = fit(params0, jnp.zeros(10, jnp.float64),
                        jnp.asarray(kp), r0)

    # Same basin: the two trajectories differ slightly (dogleg accept/
    # reject depends on the interior step), so compare to the project's 1%
    # accuracy budget, not bitwise: final costs within 0.5%, and the PCG
    # path's per-keypoint pixel error within 1% of the exact path's.
    np.testing.assert_allclose(float(outs["pcg"].cost),
                               float(outs["tridiag"].cost), rtol=5e-3)

    def mean_px(st):
        errs = []
        for i in range(f):
            joints = skeleton_joints_cam(st.params[i], st.shape, spec)
            uv = np.asarray(project(joints, cam))
            errs.append(np.linalg.norm(uv[USE_SMPL] - kp[i, :, 1:3],
                                       axis=-1).mean())
        return float(np.mean(errs))

    e_pcg, e_exact = mean_px(outs["pcg"]), mean_px(outs["tridiag"])
    assert e_pcg <= e_exact * 1.01 + 1e-3, (e_pcg, e_exact)

    # cg_rtol tolerance exit (while_loop formulation): at a tight rtol it
    # must match the fixed-trip loop's optimum to the equivalence budget;
    # at a loose practical rtol the steps are genuinely inexact (different
    # dogleg trajectory), so only pin same-basin sanity
    for rtol, band in ((1e-10, 5e-3), (1e-3, 0.25)):
        cfg = MultiFrameConfig(beta_pose=2.0, beta_shape=10.0,
                               lambda_temporal=2.0, max_iters=80,
                               linear="pcg", cg_iters=400, cg_rtol=rtol)
        fit = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float64)
        st = fit(params0, jnp.zeros(10, jnp.float64), jnp.asarray(kp), r0)
        np.testing.assert_allclose(float(st.cost),
                                   float(outs["tridiag"].cost), rtol=band)
        # sub-0.1px absolute regime on this noiseless fixture: pair the
        # relative band with a band-scaled absolute allowance
        assert mean_px(st) <= e_exact * (1.0 + band) + 0.2 * band


def test_pcg_block_matches_exact_solver(mf_rig, rng):
    """linear="pcg_block" (fit-level block-inverse preconditioner from the
    INIT linearization, amortized over the whole LM loop) must reach the
    same optimum as the exact elimination — the preconditioner only shapes
    the Krylov space. Run in both fused and plain loops (the prec is
    computed from asm0 in one and from an extra init assembly in the
    other). At truncated cg_iters=12 the block preconditioner must be no
    worse than plain Jacobi-PCG at the same budget — on this COLD-init rig
    the init linearization is far from the optimum's curvature, so the
    stale preconditioner cannot be expected to match the exact step
    (measured: blk12 18% above the exact cost after 80 LM iters, still
    descending); the warm-started stage-2 bench is where amortization can
    pay, and shipping is gated on that TPU measurement (ROADMAP)."""
    model, cam, spec = mf_rig
    f = 6
    gt_shape = jnp.asarray(rng.normal(size=10) * 0.6)
    gt_params = _smooth_gt_video(rng, f)
    kp = _project_video(gt_params, gt_shape, spec, cam)
    params0 = jnp.tile(init_frame_params(dtype=jnp.float64), (f, 1))
    r0 = jnp.tile(jnp.asarray(init_root_rotation()), (f, 1, 1))

    def run(lin, iters, fused):
        cfg = MultiFrameConfig(beta_pose=2.0, beta_shape=10.0,
                               lambda_temporal=2.0, max_iters=80,
                               linear=lin, cg_iters=iters, fused_cost=fused)
        fit = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float64)
        return fit(params0, jnp.zeros(10, jnp.float64), jnp.asarray(kp), r0)

    def mean_px(st):
        errs = []
        for i in range(f):
            joints = skeleton_joints_cam(st.params[i], st.shape, spec)
            uv = np.asarray(project(joints, cam))
            errs.append(np.linalg.norm(uv[USE_SMPL] - kp[i, :, 1:3],
                                       axis=-1).mean())
        return float(np.mean(errs))

    exact = run("tridiag", 0, False)
    e_exact = mean_px(exact)
    for fused in (False, True):
        blk = run("pcg_block", 400, fused)
        # same 1%-budget comparison as test_pcg_matches_exact_solver:
        # dogleg accept/reject depends on the interior step, so the two
        # trajectories differ slightly — costs within 1%, pixel error
        # within 1% of the exact path's
        np.testing.assert_allclose(float(blk.cost), float(exact.cost),
                                   rtol=1e-2)
        # + 0.05 px absolute: this noiseless fixture converges to the
        # sub-0.1 px regime where the relative band alone is below the
        # trajectory-divergence noise floor
        assert mean_px(blk) <= e_exact * 1.01 + 0.05, (mean_px(blk), e_exact)

    # No truncated-budget comparison vs plain Jacobi is pinned here:
    # measured on this cold-init rig the STALE block preconditioner can be
    # WORSE than fresh Jacobi at the same cg_iters=12 budget (30.2 vs 29.3
    # final cost on one rng draw) and lands well short of the exact step
    # (18% above its cost after 80 LM iters on another draw) —
    # whether amortizing the factorization pays is a warm-start property,
    # decided by the stage-2 TPU sweep (docs/ROADMAP.md), not by this rig.
