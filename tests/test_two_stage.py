"""Fused two-stage dispatch (solve/two_stage.py, VERDICT r4 #8):
one compiled program for anchors + in-graph interpolation + windows must
reproduce the sequential three-step recipe exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smpltpu.constants import N_KP_SLOTS, USE_SMPL, init_root_rotation
from smpltpu.energy import make_skeleton_spec, skeleton_joints_cam
from smpltpu.energy.params import init_frame_params
from smpltpu.energy.reproj import project
from smpltpu.models import SMPLModel, make_synthetic_model
from smpltpu.solve import (
    MultiFrameConfig,
    build_fused_two_stage,
    build_multi_fitter,
)
from smpltpu.solve.two_stage import interp_tables
from smpltpu.utils import default_intrinsics

N, SKIP, WSIZE, STRIDE = 12, 4, 5, 4


def test_interp_tables_match_host_loop():
    anchor_idx = list(range(0, N, SKIP))
    n_a = len(anchor_idx)
    ap = np.random.default_rng(0).normal(size=(n_a, 7))
    # the host loop (bench.py / pipeline.multi --init-from-anchors)
    ref = np.zeros((N, 7))
    for k, fid in enumerate(anchor_idx):
        nxt = anchor_idx[k + 1] if k + 1 < n_a else N
        pb = ap[k + 1] if k + 1 < n_a else ap[k]
        for i in range(fid, min(nxt, N)):
            t = (i - fid) / max(nxt - fid, 1)
            ref[i] = (1 - t) * ap[k] + t * pb
    seg, hi, t = interp_tables(anchor_idx, N)
    got = (1 - t)[:, None] * ap[seg] + t[:, None] * ap[hi]
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-15)


@pytest.fixture(scope="module")
def rig():
    model = SMPLModel.from_dict(make_synthetic_model(n_verts=200, seed=0),
                                dtype=jnp.float64)
    cam = default_intrinsics(480, 270, dtype=jnp.float64)
    spec = make_skeleton_spec(model, init_root_rotation(), with_shape=True)
    rng = np.random.default_rng(5)
    gt = np.tile(np.asarray(init_frame_params(dtype=jnp.float64)), (N, 1))
    gt[:, 6] = 3.2
    gt[:, 7:] = 0.1 * rng.normal(size=(N, 69))
    uv = np.asarray(jax.jit(jax.vmap(
        lambda p: project(skeleton_joints_cam(
            p, jnp.zeros(10, jnp.float64), spec), cam)))(jnp.asarray(gt)))
    kp = np.zeros((N, N_KP_SLOTS, 4))
    kp[:, :, 0] = USE_SMPL
    kp[:, :, 1:3] = uv[:, USE_SMPL] + rng.normal(size=(N, N_KP_SLOTS, 2))
    kp[:, :, 3] = 1.0
    return spec, cam, kp


def test_fused_matches_sequential(rig):
    spec, cam, kp = rig
    dtype = jnp.float64
    anchor_idx = list(range(0, N, SKIP))
    n_a = len(anchor_idx)
    starts = list(range(0, N, STRIDE))
    cfg1 = MultiFrameConfig(beta_pose=5.0, beta_shape=25.0,
                            lambda_temporal=3.0, max_iters=30,
                            linear="pcg", cg_iters=24, fused_cost=True)
    cfg2 = MultiFrameConfig(beta_pose=5.0, beta_shape=1e5,
                            lambda_temporal=3.0, max_iters=60,
                            linear="pcg", cg_iters=24, fused_cost=True)

    # window batches (bench.py construction)
    n_win = len(starts)
    kpw = np.zeros((n_win, WSIZE, N_KP_SLOTS, 4))
    vw = np.zeros((n_win, WSIZE))
    for i, s in enumerate(starts):
        e = min(s + WSIZE, N)
        kpw[i, :e - s] = kp[s:e]
        vw[i, :e - s] = 1.0
    r0 = np.asarray(init_root_rotation())
    p0a = jnp.tile(jnp.asarray(init_frame_params(dtype=dtype)), (n_a, 1))
    kpa = jnp.asarray(kp[anchor_idx], dtype)
    r0a = jnp.tile(jnp.asarray(r0, dtype), (n_a, 1, 1))
    shape0 = jnp.zeros(10, dtype)
    kpw_j = jnp.asarray(kpw, dtype)
    r0w = jnp.tile(jnp.asarray(r0, dtype), (n_win, WSIZE, 1, 1))
    vw_j = jnp.asarray(vw, dtype)

    # sequential reference: fit1, host interpolation, vmapped fit2
    fit1 = build_multi_fitter(spec, cam, cfg1, 10, dtype=dtype)
    fit2 = build_multi_fitter(spec, cam, cfg2, 10, dtype=dtype)
    st1 = fit1(p0a, shape0, kpa, r0a)
    ap = np.asarray(st1.params)
    poses = np.zeros((N, ap.shape[1]))
    for k, fid in enumerate(anchor_idx):
        nxt = anchor_idx[k + 1] if k + 1 < n_a else N
        pb = ap[k + 1] if k + 1 < n_a else ap[k]
        for i in range(fid, min(nxt, N)):
            t = (i - fid) / max(nxt - fid, 1)
            poses[i] = (1 - t) * ap[k] + t * pb
    p0w = np.tile(np.asarray(init_frame_params(dtype=dtype)),
                  (n_win, WSIZE, 1))
    for i, s in enumerate(starts):
        e = min(s + WSIZE, N)
        p0w[i, :e - s] = poses[s:e]
    st2 = jax.jit(jax.vmap(lambda a, c, d, e: fit2(
        a, st1.shape, c, d, e)))(jnp.asarray(p0w, dtype), kpw_j, r0w, vw_j)

    # fused single dispatch
    fused = build_fused_two_stage(spec, cam, cfg1, cfg2, 10, anchor_idx,
                                  starts, WSIZE, N, dtype=dtype)
    f1, f2 = fused(p0a, shape0, kpa, r0a, kpw_j, r0w, vw_j)

    np.testing.assert_allclose(np.asarray(f1.params), ap, rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(f1.shape), np.asarray(st1.shape),
                               rtol=0, atol=1e-12)
    # stage-2: the fused program is a DIFFERENT compiled program (one XLA
    # graph), so 1-ulp fusion differences (measured: p0w agrees to 1e-17)
    # can reroute an accept/reject mid-trajectory — the contract is
    # matching SOLVE QUALITY, not bit equality: identical iteration
    # counts, window costs within 1e-6 relative (measured <=8e-8), params
    # on valid frames within 1e-3 (measured <=3e-5; unconverged windows
    # compare mid-trajectory states).
    np.testing.assert_array_equal(np.asarray(f2.iters_run),
                                  np.asarray(st2.iters_run))
    np.testing.assert_allclose(np.asarray(f2.cost), np.asarray(st2.cost),
                               rtol=1e-6, atol=0)
    m = vw[..., None] > 0
    d = np.abs(np.asarray(f2.params) - np.asarray(st2.params))[
        np.broadcast_to(m, st2.params.shape)]
    assert d.max() < 1e-3, d.max()
