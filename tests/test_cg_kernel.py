"""ops/cg.py — the whole-PCG-in-VMEM Pallas kernel (interpret mode on CPU)
against an independent re-statement of the Jacobi-PCG recursion, under
vmap (the production shape: one window per grid program), and end-to-end
through the multi-frame fitter (linear="pcg_kernel" vs "pcg")."""

import jax
import jax.numpy as jnp
import numpy as np

from smpltpu.constants import init_root_rotation
from smpltpu.energy import make_skeleton_spec, skeleton_joints_cam
from smpltpu.energy.params import init_frame_params
from smpltpu.energy.reproj import project
from smpltpu.io.keypoints import USE_SMPL
from smpltpu.models import SMPLModel
from smpltpu.models.synthetic import make_synthetic_model
from smpltpu.ops.cg import arrow_pcg_pallas
from smpltpu.solve import MultiFrameConfig, build_multi_fitter
from smpltpu.utils import default_intrinsics

F, P, NS = 6, 76, 10


def _random_system(rng, scale=1.0):
    """Random SPD arrowhead system in the solver's exact block layout."""
    a = rng.normal(size=(F, P, P)).astype(np.float32) * 0.1
    d = np.einsum("fab,fcb->fac", a, a) + 2.0 * np.eye(P, dtype=np.float32)
    off = (-np.abs(rng.normal(size=F - 1)) * 0.05 * scale).astype(np.float32)
    tm = np.ones(P, np.float32)
    tm[0] = 0.0
    b = rng.normal(size=(F, P, NS)).astype(np.float32) * 0.05
    cw = rng.normal(size=(NS, NS)).astype(np.float32) * 0.1
    c = cw @ cw.T + 1.5 * np.eye(NS, dtype=np.float32)
    gp = rng.normal(size=(F, P)).astype(np.float32)
    gw = rng.normal(size=NS).astype(np.float32)
    return d, off, tm, b, c, gp, gw


def _pcg_reference(d, off, tm, b, c, gp, gw, iters):
    """Independent numpy statement of the recursion (mirrors
    solve/multi_frame.arrow_pcg, f64 internally for a clean target)."""
    d, off, tm, b, c, gp, gw = (np.asarray(x, np.float64)
                                for x in (d, off, tm, b, c, gp, gw))

    def matvec(vp, vw):
        u = np.einsum("fab,fb->fa", d, vp)
        u[:-1] += off[:, None] * tm * vp[1:]
        u[1:] += off[:, None] * tm * vp[:-1]
        u += np.einsum("fps,s->fp", b, vw)
        uw = np.einsum("fps,fp->s", b, vp) + c @ vw
        return u, uw

    dinv = 1.0 / np.maximum(np.diagonal(d, axis1=1, axis2=2), 1e-20)
    cinv = 1.0 / np.maximum(np.diagonal(c), 1e-20)
    xp, xw = np.zeros_like(gp), np.zeros_like(gw)
    rp, rw = -gp, -gw
    zp, zw = dinv * rp, cinv * rw
    rho = np.sum(rp * zp) + rw @ zw
    dp, dw = zp.copy(), zw.copy()
    for _ in range(iters):
        qp, qw = matvec(dp, dw)
        alpha = rho / max(np.sum(dp * qp) + dw @ qw, 1e-30)
        xp += alpha * dp
        xw += alpha * dw
        rp -= alpha * qp
        rw -= alpha * qw
        zp, zw = dinv * rp, cinv * rw
        rho_n = np.sum(rp * zp) + rw @ zw
        beta = rho_n / max(rho, 1e-30)
        dp, dw = zp + beta * dp, zw + beta * dw
        rho = rho_n
    return xp, xw


def test_kernel_matches_recursion(rng):
    d, off, tm, b, c, gp, gw = _random_system(rng)
    want_p, want_w = _pcg_reference(d, off, tm, b, c, gp, gw, iters=32)
    got_p, got_w = arrow_pcg_pallas(
        jnp.asarray(d), jnp.asarray(off), jnp.asarray(tm), jnp.asarray(b),
        jnp.asarray(c), jnp.asarray(gp), jnp.asarray(gw),
        iters=32, interpret=True)
    scale = np.max(np.abs(want_p))
    np.testing.assert_allclose(np.asarray(got_p), want_p,
                               atol=2e-4 * scale, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(got_w), want_w,
                               atol=2e-4 * max(np.max(np.abs(want_w)), 1.0),
                               rtol=2e-4)
    # well-conditioned system, 32 iters: the iterate has essentially
    # converged — check it actually solves the system (pose rows)
    hp, hw = np.asarray(got_p, np.float64), np.asarray(got_w, np.float64)
    u = np.einsum("fab,fb->fa", np.asarray(d, np.float64), hp)
    u[:-1] += off[:, None].astype(np.float64) * tm * hp[1:]
    u[1:] += off[:, None].astype(np.float64) * tm * hp[:-1]
    u += np.einsum("fps,s->fp", np.asarray(b, np.float64), hw)
    assert np.max(np.abs(u + gp)) < 1e-3 * max(1.0, np.max(np.abs(gp)))


def test_kernel_rtol_exit(rng):
    """In-kernel tolerance exit (rtol > 0, while_loop formulation): a tight
    rtol that never fires must be bit-equivalent to the fixed-trip loop;
    a loose rtol must stop early (larger residual) yet stay in the
    embedded subspace (padded lanes exactly zero via the preconditioner)."""
    d, off, tm, b, c, gp, gw = _random_system(rng)
    args = (jnp.asarray(d), jnp.asarray(off), jnp.asarray(tm),
            jnp.asarray(b), jnp.asarray(c), jnp.asarray(gp), jnp.asarray(gw))
    fixed_p, fixed_w = arrow_pcg_pallas(*args, iters=24, interpret=True)
    tight_p, tight_w = arrow_pcg_pallas(*args, iters=24, interpret=True,
                                        rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(tight_p), np.asarray(fixed_p))
    np.testing.assert_array_equal(np.asarray(tight_w), np.asarray(fixed_w))
    loose_p, loose_w = arrow_pcg_pallas(*args, iters=24, interpret=True,
                                        rtol=0.2)
    assert np.all(np.isfinite(np.asarray(loose_p)))
    # the loose exit truncates earlier: its iterate differs from the
    # (essentially converged) 24-step solution
    assert not np.allclose(np.asarray(loose_p), np.asarray(fixed_p))


def test_kernel_vmaps_over_windows(rng):
    """vmap adds the window grid dim — must equal per-window calls."""
    systems = [_random_system(rng, scale=float(k + 1)) for k in range(3)]
    stacked = [jnp.asarray(np.stack([s[i] for s in systems]))
               for i in range(7)]
    # tmask is shared (not batched) in the solver; batch everything here
    # to exercise the general case
    run = jax.vmap(lambda d, o, t, b, c, gp, gw: arrow_pcg_pallas(
        d, o, t, b, c, gp, gw, iters=16, interpret=True))
    got_p, got_w = run(*stacked)
    for k, s in enumerate(systems):
        one_p, one_w = arrow_pcg_pallas(*map(jnp.asarray, s),
                                        iters=16, interpret=True)
        np.testing.assert_allclose(np.asarray(got_p[k]), np.asarray(one_p),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_w[k]), np.asarray(one_w),
                                   rtol=1e-5, atol=1e-5)


def test_fitter_pcg_kernel_matches_pcg(rng):
    """Full multi-frame fit with linear="pcg_kernel" lands in the same
    optimum as linear="pcg" (both f32 — the kernel's production dtype)."""
    model = SMPLModel.from_dict(make_synthetic_model(n_verts=150, seed=0),
                                dtype=jnp.float32)
    cam = default_intrinsics(128, 160, dtype=jnp.float32)
    spec = make_skeleton_spec(model, init_root_rotation(), with_shape=True)
    f = 5
    gt_shape = jnp.asarray(rng.normal(size=10).astype(np.float32) * 0.5)
    base = rng.normal(size=(23, 3)).astype(np.float32) * 0.1

    gt = []
    for i in range(f):
        p = np.array(init_frame_params(dtype=jnp.float32))
        p[4:7] = [0.05 * i, 0.0, 3.0]
        p[7:] = (base + 0.02 * i).ravel()
        gt.append(p)
    gt = jnp.asarray(np.stack(gt))
    kp = []
    for i in range(f):
        joints = skeleton_joints_cam(gt[i], gt_shape, spec)
        uv = np.asarray(project(joints, cam))
        k = np.zeros((17, 4), np.float32)
        k[:, 0] = USE_SMPL
        k[:, 1:3] = uv[USE_SMPL]
        k[:, 3] = 1.0
        kp.append(k)
    kp = jnp.asarray(np.stack(kp))
    p0 = jnp.tile(init_frame_params(dtype=jnp.float32), (f, 1))
    r0 = jnp.tile(jnp.asarray(init_root_rotation(), jnp.float32), (f, 1, 1))

    outs = {}
    for lin in ("pcg", "pcg_kernel"):
        cfg = MultiFrameConfig(beta_pose=2.0, beta_shape=10.0,
                               lambda_temporal=2.0, max_iters=40,
                               linear=lin, cg_iters=48)
        fit = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float32)
        outs[lin] = fit(p0, jnp.zeros(10, jnp.float32), kp, r0)
    np.testing.assert_allclose(float(outs["pcg_kernel"].cost),
                               float(outs["pcg"].cost), rtol=5e-3)


def test_multi_cli_linear_pcg_kernel(tmp_path, rng):
    """--linear pcg_kernel plumbs through the multi CLI (interpret-mode
    kernel on CPU) and produces a sane fit."""
    import os

    from smpltpu.pipeline import multi as multi_cli
    from tests.test_pipeline import _make_dataset

    model_path, kp_dir, img_dir = _make_dataset(tmp_path, rng, empty_frames=())
    out = str(tmp_path / "o_kern")
    rc = multi_cli.main([model_path, kp_dir, img_dir, out,
                         "30", "30", "3", "4", "1", "2.0", "25.0", "1.0",
                         "--s2-iters", "10", "--linear", "pcg_kernel"])
    assert rc == 0
    log = open(os.path.join(out, "log.csv")).read().splitlines()
    errs = [float(r.split(",")[1]) for r in log[4:]]
    import numpy as np
    assert np.mean(errs) < 25.0


def test_kernel_unrolled_matvec_matches_batched(rng):
    """The Mosaic-fallback unrolled row-dot matvec must equal the batched
    dot_general formulation."""
    s = _random_system(rng)
    a = arrow_pcg_pallas(*map(jnp.asarray, s), iters=16, interpret=True,
                         matvec_mode="batched")
    b = arrow_pcg_pallas(*map(jnp.asarray, s), iters=16, interpret=True,
                         matvec_mode="unrolled")
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                               rtol=1e-5, atol=1e-6)


def test_unknown_linear_raises(rng):
    """A typoed MultiFrameConfig.linear must raise, not silently fall back
    to tridiag (review finding: mislabeled benchmark measurements)."""
    import pytest

    model = SMPLModel.from_dict(make_synthetic_model(n_verts=100, seed=0),
                                dtype=jnp.float32)
    cam = default_intrinsics(64, 64, dtype=jnp.float32)
    spec = make_skeleton_spec(model, init_root_rotation(), with_shape=True)
    cfg = MultiFrameConfig(beta_pose=1.0, beta_shape=1.0,
                           lambda_temporal=1.0, max_iters=1,
                           linear="pcg-kernel")
    kp = jnp.zeros((2, 17, 4), jnp.float32)
    p0 = jnp.tile(init_frame_params(dtype=jnp.float32), (2, 1))
    r0 = jnp.tile(jnp.asarray(init_root_rotation(), jnp.float32), (2, 1, 1))
    with pytest.raises(ValueError, match="unknown linear solver"):
        fit = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float32)
        fit(p0, jnp.zeros(10, jnp.float32), kp, r0)


def test_vmem_guard_skips_kernel_past_96_frames(rng, monkeypatch):
    """linear="pcg_kernel" with F > 96 must route to the XLA pcg loop
    (VMEM guard) — and must still use the kernel at window sizes."""
    import smpltpu.solve.multi_frame as mf

    calls = {"n": 0}
    import smpltpu.ops.cg as cg

    real = cg.arrow_pcg_pallas

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(cg, "arrow_pcg_pallas", spy)

    model = SMPLModel.from_dict(make_synthetic_model(n_verts=100, seed=0),
                                dtype=jnp.float32)
    cam = default_intrinsics(64, 64, dtype=jnp.float32)
    spec = make_skeleton_spec(model, init_root_rotation(), with_shape=True)
    cfg = MultiFrameConfig(beta_pose=1.0, beta_shape=1.0,
                           lambda_temporal=1.0, max_iters=1,
                           linear="pcg_kernel", cg_iters=4)

    def run(f):
        kp = np.zeros((f, 17, 4), np.float32)
        kp[:, :, 0] = USE_SMPL
        kp[:, :, 1:3] = 32.0
        kp[:, :, 3] = 1.0
        p0 = jnp.tile(init_frame_params(dtype=jnp.float32), (f, 1))
        r0 = jnp.tile(jnp.asarray(init_root_rotation(), jnp.float32),
                      (f, 1, 1))
        fit = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float32)
        fit(p0, jnp.zeros(10, jnp.float32), jnp.asarray(kp), r0)

    run(100)                      # guard: kernel must NOT be used
    assert calls["n"] == 0
    run(8)                        # window-sized: kernel IS used
    assert calls["n"] > 0
