"""Sharding tests on the virtual 8-device CPU mesh: mesh-size invariance
of the sharded GN step (1 device == 4 devices), cost decrease, and DP
window fitting equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smpltpu.constants import N_KP_SLOTS, USE_SMPL, init_root_rotation
from smpltpu.energy import make_skeleton_spec, skeleton_joints_cam
from smpltpu.energy.params import init_frame_params
from smpltpu.energy.reproj import project
from smpltpu.models import SMPLModel
from smpltpu.parallel import frames_mesh, shard_frames
from smpltpu.parallel.sharded import (
    build_sharded_gn_step,
    build_sharded_lm_fitter,
    sharded_frame_fit,
    sharded_window_fit,
)
from smpltpu.solve.multi_frame import MultiFrameConfig, build_multi_fitter
from smpltpu.utils import default_intrinsics


@pytest.fixture(scope="module")
def par_rig(small_model_dict):
    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float64)
    cam = default_intrinsics(720, 1280, dtype=jnp.float64)
    spec = make_skeleton_spec(model, init_root_rotation(), with_shape=True)
    return model, cam, spec


def _kp_batch(rng, f):
    kp = np.zeros((f, N_KP_SLOTS, 4))
    kp[:, :, 0] = USE_SMPL
    kp[:, :, 1:3] = 400 + 120 * rng.normal(size=(f, N_KP_SLOTS, 2))
    kp[:, :, 3] = 1.0
    return kp


def test_gn_step_mesh_invariance(par_rig, rng):
    """The sharded GN step must give identical results on 1 vs 4 devices."""
    model, cam, spec = par_rig
    f = 8
    cfg = MultiFrameConfig(beta_pose=2.0, beta_shape=5.0, lambda_temporal=1.5,
                           max_iters=1)
    kp = jnp.asarray(_kp_batch(rng, f))
    params = jnp.tile(init_frame_params(dtype=jnp.float64), (f, 1))
    r0 = jnp.tile(jnp.asarray(init_root_rotation()), (f, 1, 1))
    w = jnp.zeros(10, jnp.float64)

    results = {}
    for n_dev in (1, 4):
        mesh = frames_mesh(n_dev)
        step = build_sharded_gn_step(mesh, spec, cam, cfg, 10,
                                     cg_iters=200, dtype=jnp.float64)
        res = step(shard_frames(mesh, params), w, shard_frames(mesh, kp),
                   shard_frames(mesh, r0))
        results[n_dev] = (np.asarray(res.params), np.asarray(res.shape))
    np.testing.assert_allclose(results[1][0], results[4][0], atol=1e-6)
    np.testing.assert_allclose(results[1][1], results[4][1], atol=1e-6)


def test_gn_step_reduces_cost(par_rig, rng):
    """Iterating the sharded GN step must drive the keypoint residual down
    (keypoints generated from a reachable ground truth)."""
    model, cam, spec = par_rig
    f = 8
    gt = jnp.tile(init_frame_params(dtype=jnp.float64), (f, 1))
    gt = gt.at[:, 1].add(0.2).at[:, 8].add(0.3)  # rotate root + a joint
    kp = np.zeros((f, N_KP_SLOTS, 4))
    for i in range(f):
        uv = np.asarray(project(
            skeleton_joints_cam(gt[i], jnp.zeros(10), spec), cam))
        kp[i, :, 0] = USE_SMPL
        kp[i, :, 1:3] = uv[USE_SMPL]
        kp[i, :, 3] = 1.0
    cfg = MultiFrameConfig(beta_pose=0.5, beta_shape=50.0, lambda_temporal=0.5,
                           max_iters=1)
    mesh = frames_mesh(4)
    # damping 0.3: heavy enough that iterating this no-acceptance one-step
    # API is a stable contraction on this rig (light damping oscillates
    # from a cold init — the production minimizer with a real trust region
    # is build_sharded_lm_fitter, tested below)
    step = build_sharded_gn_step(mesh, spec, cam, cfg, 10, cg_iters=100,
                                 damping=0.3, dtype=jnp.float64)
    params = shard_frames(mesh, jnp.tile(init_frame_params(dtype=jnp.float64), (f, 1)))
    w = jnp.zeros(10, jnp.float64)
    kp_d = shard_frames(mesh, jnp.asarray(kp))
    r0 = shard_frames(mesh, jnp.tile(jnp.asarray(init_root_rotation()), (f, 1, 1)))

    def px_err(p):
        errs = []
        for i in range(f):
            uv = np.asarray(project(
                skeleton_joints_cam(jnp.asarray(p[i]), jnp.zeros(10), spec), cam))
            errs.append(np.linalg.norm(uv[USE_SMPL] - kp[i, :, 1:3], axis=-1).mean())
        return float(np.mean(errs))

    e0 = px_err(np.asarray(params))
    for _ in range(8):
        res = step(params, w, kp_d, r0)
        params, w = res.params, res.shape
    e1 = px_err(np.asarray(params))
    assert e1 < 0.2 * e0, f"GN steps did not reduce error: {e0} -> {e1}"


def test_sharded_window_fit_matches_single(par_rig, rng):
    model, cam, spec = par_rig
    n_win, wlen = 4, 3
    cfg = MultiFrameConfig(beta_pose=2.0, beta_shape=1e5, lambda_temporal=1.0,
                           max_iters=15)
    fitter = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float64)
    kp = np.stack([_kp_batch(rng, wlen) for _ in range(n_win)])
    p0 = jnp.tile(init_frame_params(dtype=jnp.float64), (n_win, wlen, 1))
    w0 = jnp.zeros((n_win, 10), jnp.float64)
    r0 = jnp.tile(jnp.asarray(init_root_rotation()), (n_win, wlen, 1, 1))
    valid = jnp.ones((n_win, wlen), jnp.float64)

    mesh = frames_mesh(4, axis="windows")
    st = sharded_window_fit(mesh, fitter, p0, w0, jnp.asarray(kp), r0, valid,
                            axis="windows")
    ref = fitter(p0[2], w0[2], jnp.asarray(kp)[2], r0[2], valid[2])
    # vmap-under-sharding reorders reductions, and LM amplifies the ~1e-15
    # seeds on these random (deliberately unfittable) keypoints — assert the
    # solves reach the same optimum, not bitwise-equal trajectories
    np.testing.assert_allclose(float(st.cost[2]), float(ref.cost), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st.params[2]),
                               np.asarray(ref.params), rtol=1e-3, atol=1e-3)


def test_sharded_window_fit_chunked(par_rig, rng):
    """chunk>0 composes the per-chunk convergence exit with the mesh:
    each device lax.maps its local window slice. In f64 the per-window
    results are bit-tight against the unchunked sharded path (converged
    windows freeze, so extra batch iterations never move them) — the same
    invariant build_chunked_window_fit pins on one chip. Also exercises
    local padding (3 local windows, chunk 2)."""
    model, cam, spec = par_rig
    n_dev, wlen = 2, 3
    n_win = 6           # 3 local windows per device, chunk 2 -> local pad
    cfg = MultiFrameConfig(beta_pose=2.0, beta_shape=1e5, lambda_temporal=1.0,
                           max_iters=15)
    fitter = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float64)
    kp = np.stack([_kp_batch(rng, wlen) for _ in range(n_win)])
    p0 = jnp.tile(init_frame_params(dtype=jnp.float64), (n_win, wlen, 1))
    w0 = jnp.zeros((n_win, 10), jnp.float64)
    r0 = jnp.tile(jnp.asarray(init_root_rotation()), (n_win, wlen, 1, 1))
    valid = jnp.ones((n_win, wlen), jnp.float64)

    mesh = frames_mesh(n_dev, axis="windows")
    st_plain = sharded_window_fit(mesh, fitter, p0, w0, jnp.asarray(kp), r0,
                                  valid, axis="windows")
    st_chunk = sharded_window_fit(mesh, fitter, p0, w0, jnp.asarray(kp), r0,
                                  valid, axis="windows", chunk=2)
    np.testing.assert_allclose(np.asarray(st_chunk.cost),
                               np.asarray(st_plain.cost), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st_chunk.params),
                               np.asarray(st_plain.params),
                               rtol=1e-9, atol=1e-12)


def test_sharded_frame_fit_matches_unsharded(par_rig, rng):
    """DP over the single-frame batch (the single CLI's --mesh path): the
    8-device mesh must reach the same per-frame optima as the unsharded
    call of the SAME fitter — per-frame solves are independent, so only
    reduction order differs (same tolerance convention as the window-DP
    test above)."""
    from smpltpu.solve import build_fitter, make_single_frame_problem

    model, cam, _ = par_rig
    f = 8
    prob = make_single_frame_problem(model, init_root_rotation(), cam,
                                     beta_pose=2.0, dtype=jnp.float64)
    # realizable observations (projected from a true pose + noise) keep
    # the basins well-separated so fp reseeding cannot flip them
    gt = jnp.tile(init_frame_params(dtype=jnp.float64), (f, 1))
    gt = gt.at[:, 7:].add(0.1 * rng.normal(size=(f, 69)))
    uv = np.asarray(jax.vmap(
        lambda p: project(skeleton_joints_cam(
            p, jnp.zeros(10), prob.spec), cam))(gt))
    kp = np.zeros((f, N_KP_SLOTS, 4))
    kp[:, :, 0] = USE_SMPL
    kp[:, :, 1:3] = uv[:, USE_SMPL] + rng.normal(size=(f, N_KP_SLOTS, 2))
    kp[:, :, 3] = 1.0

    fitter = build_fitter(prob, max_iters=120, dtype=jnp.float64)
    # warm init near GT: this test pins SHARDING equivalence, so the fit
    # must be basin-unambiguous. From the blind cold init, GSPMD's f64
    # reduction-order bit-diffs get amplified by the solver's branchy
    # accept/reject + secular-Newton safeguards over 120 iterations and
    # one fragile frame can flip to a nearby basin (observed with the
    # chol TR default: frame cost 4.39 vs 4.30) — that is the documented
    # cold-init basin lottery (docs/ROADMAP.md), not a sharding defect.
    x0 = gt + 0.03 * jnp.asarray(rng.normal(size=gt.shape))
    kp_j = jnp.asarray(kp)
    ref = fitter(x0, kp_j)
    mesh = frames_mesh(8)
    st = sharded_frame_fit(mesh, fitter, x0, kp_j)
    # cost rtol 1e-4: cross-layout f64 reduction-order diffs walk the
    # branchy TR accept/reject to ~1e-6-relative cost offsets (same
    # optimum, different last iterate)
    np.testing.assert_allclose(np.asarray(st.cost), np.asarray(ref.cost),
                               rtol=1e-4)
    # param tolerance is deliberately loose: the two programs (GSPMD
    # sharded vs plain) go through different codegen — and the
    # persistent XLA:CPU cache can even serve an AOT executable built
    # under a different machine-feature fingerprint (cpu_aot_loader
    # prefer-no-scatter warnings), nudging reduction order again — so a
    # single flat-direction element near convergence drifts ~1e-2
    # relative while the cost stays equal to 1e-4 (observed 2026-08-19:
    # 1/608 elements at 0.0095 rel). Same basin is what this pins.
    np.testing.assert_allclose(np.asarray(st.x), np.asarray(ref.x),
                               rtol=2e-2, atol=2e-3)

    # --frame-chunk under the mesh: per-device lax.map chunks, bit-tight
    # against the sharded unchunked run (converged frames freeze); 4
    # local frames on a 2-device mesh with chunk 3 exercises local pad
    mesh2 = frames_mesh(2)
    st2 = sharded_frame_fit(mesh2, fitter, x0, kp_j)
    st2c = sharded_frame_fit(mesh2, fitter, x0, kp_j, chunk=3)
    np.testing.assert_allclose(np.asarray(st2c.cost), np.asarray(st2.cost),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st2c.x), np.asarray(st2.x),
                               rtol=1e-9, atol=1e-12)


def test_sharded_lm_mesh_invariance_and_single_chip_parity(par_rig, rng):
    """The FULL sharded trust-region LM (VERDICT round-1 item 4): 1-device
    and 4-device meshes must reach the same optimum, and that optimum must
    match the single-chip Schur/tridiag fitter — the sharded solver is the
    whole ceres::Solve replacement (MultiFrameBA.h:145-151), not one step."""
    model, cam, spec = par_rig
    f = 8
    cfg = MultiFrameConfig(beta_pose=2.0, beta_shape=5.0, lambda_temporal=1.5,
                           max_iters=12)
    kp = jnp.asarray(_kp_batch(rng, f))
    params = jnp.tile(init_frame_params(dtype=jnp.float64), (f, 1))
    r0 = jnp.tile(jnp.asarray(init_root_rotation()), (f, 1, 1))
    w = jnp.zeros(10, jnp.float64)

    ref = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float64)(
        params, w, kp, r0)

    results = {}
    for n_dev in (1, 4):
        mesh = frames_mesh(n_dev)
        fit = build_sharded_lm_fitter(mesh, spec, cam, cfg, 10,
                                      cg_iters=250, dtype=jnp.float64)
        res = fit(shard_frames(mesh, params), w, shard_frames(mesh, kp),
                  shard_frames(mesh, r0))
        assert int(res.n_accepted) > 0
        results[n_dev] = (np.asarray(res.params), np.asarray(res.shape),
                          float(res.cost))
    np.testing.assert_allclose(results[1][0], results[4][0], atol=1e-5)
    np.testing.assert_allclose(results[1][1], results[4][1], atol=1e-5)
    # same optimum as the exact-solve single-chip fitter (1e-5 budget)
    np.testing.assert_allclose(results[4][0], np.asarray(ref.params),
                               atol=1e-4)
    np.testing.assert_allclose(results[4][2], float(ref.cost), rtol=1e-6)


def test_sharded_lm_cg_rtol_exit(par_rig, rng):
    """cfg.cg_rtol on the sharded LM (tolerance-exit CG with the psum'd
    residual carried in the loop state): a tight rtol must reproduce the
    fixed-trip solver's optimum — every shard exits on the same trip, so
    mesh execution stays correct."""
    model, cam, spec = par_rig
    f = 8
    kp = jnp.asarray(_kp_batch(rng, f))
    params = jnp.tile(init_frame_params(dtype=jnp.float64), (f, 1))
    r0 = jnp.tile(jnp.asarray(init_root_rotation()), (f, 1, 1))
    w = jnp.zeros(10, jnp.float64)
    mesh = frames_mesh(4)
    outs = {}
    for rtol in (0.0, 1e-10):
        cfg = MultiFrameConfig(beta_pose=2.0, beta_shape=5.0,
                               lambda_temporal=1.5, max_iters=12,
                               cg_rtol=rtol)
        fit = build_sharded_lm_fitter(mesh, spec, cam, cfg, 10,
                                      cg_iters=250, dtype=jnp.float64)
        outs[rtol] = fit(shard_frames(mesh, params), w,
                         shard_frames(mesh, kp), shard_frames(mesh, r0))
    np.testing.assert_allclose(float(outs[1e-10].cost),
                               float(outs[0.0].cost), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(outs[1e-10].params),
                               np.asarray(outs[0.0].params),
                               rtol=1e-3, atol=1e-3)


def test_sharded_lm_frame_valid_padding(par_rig, rng):
    """Padding rows (frame_valid=0, masked keypoints) must not change the
    real frames' optimum: fit 6 real frames on a 4-device mesh by padding
    to 8 and compare against the single-chip fit of the 6."""
    model, cam, spec = par_rig
    f_real, f_pad = 6, 8
    cfg = MultiFrameConfig(beta_pose=2.0, beta_shape=5.0, lambda_temporal=1.5,
                           max_iters=10)
    kp_real = _kp_batch(rng, f_real)
    kp = np.zeros((f_pad,) + kp_real.shape[1:])
    kp[:f_real] = kp_real  # padded rows: valid=0 everywhere
    params = jnp.tile(init_frame_params(dtype=jnp.float64), (f_pad, 1))
    r0 = jnp.tile(jnp.asarray(init_root_rotation()), (f_pad, 1, 1))
    w = jnp.zeros(10, jnp.float64)
    valid = jnp.asarray((np.arange(f_pad) < f_real).astype(np.float64))

    mesh = frames_mesh(4)
    fit = build_sharded_lm_fitter(mesh, spec, cam, cfg, 10,
                                  cg_iters=250, dtype=jnp.float64)
    res = fit(shard_frames(mesh, params), w,
              shard_frames(mesh, jnp.asarray(kp)),
              shard_frames(mesh, r0), shard_frames(mesh, valid))

    ref = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float64)(
        params[:f_real], w, jnp.asarray(kp_real), r0[:f_real])
    np.testing.assert_allclose(np.asarray(res.params)[:f_real],
                               np.asarray(ref.params), atol=1e-4)


def test_graft_entry_and_dryrun():
    # entry()'s round-3 contract: (params (4,6,76), cost (4,), shape
    # (4,10), verts) — the production window solve + skinning (full pin
    # incl. pose-decode parity: tests/test_graft_entry.py)
    import __graft_entry__ as g
    fn, args = g.entry()
    out = fn(*args)
    assert out[0].shape == (4, 6, 76)
    assert out[3].shape[-1] == 3
    g.dryrun_multichip(8)
