"""Stage-2 per-iteration cost attribution on the real TPU.

The round-2 tunnel profile claimed the block-tridiag solve was 21 of the
24 ms/LM-iteration; the cyclic-reduction A/B (644 -> 673 frames/s)
falsified that. This script measures the pieces directly on the bench
workload (67 windows x 20 frames x 76 dofs):

  * full fit, fixed 60 iterations (ftol=0 kills the convergence exit) for
    linear in {cr, tridiag, pcg} -> clean ms/iter per solver;
  * normal-equation assembly alone (vmapped linearize + JVP pushes);
  * cost evaluation alone;
  * the arrowhead solve alone on captured (H, g) tensors.

Timings are min-of-5 after a warmup dispatch; the ~28 ms tunnel dispatch
floor applies to every number equally (reported separately via a no-op).
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_stage2.py
"""

import sys
import time

import numpy as np


def bench_one(fn, *args, n=5):
    fn(*args)  # warmup/compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax_block(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def jax_block(x):
    import jax
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return x


def main():
    import jax
    import jax.numpy as jnp

    from smpltpu.constants import N_KP_SLOTS, USE_SMPL, init_root_rotation
    from smpltpu.energy import make_skeleton_spec, skeleton_joints_cam
    from smpltpu.energy.params import (FrameParams, init_frame_params,
                                       pack_frame_params)
    from smpltpu.energy.reproj import project
    from smpltpu.models import SMPLModel, make_synthetic_model
    from smpltpu.solve import MultiFrameConfig, build_multi_fitter
    from smpltpu.utils import default_intrinsics

    n_win, wsize, iters = 67, 20, 60
    rng = np.random.default_rng(0)
    model = SMPLModel.from_dict(make_synthetic_model(), dtype=jnp.float32)
    cam = default_intrinsics(720, 1280)
    spec = make_skeleton_spec(model, init_root_rotation(), with_shape=True)
    r0c = np.asarray(init_root_rotation(), np.float32)

    base = rng.normal(size=(23, 3)) * 0.15
    gt = jnp.stack([pack_frame_params(FrameParams(
        scale=jnp.float32(1.0),
        root_aa=jnp.asarray([2e-3 * f, 1e-3 * f, 0.0], jnp.float32),
        root_t=jnp.asarray([0.1 + 1e-3 * f, -0.1, 3.2], jnp.float32),
        joint_aa=jnp.asarray(base, jnp.float32)))
        for f in range(wsize)])
    uv = np.asarray(jax.jit(jax.vmap(
        lambda p: project(skeleton_joints_cam(
            p, jnp.zeros(10, jnp.float32), spec), cam)))(gt))
    kp1 = np.zeros((wsize, N_KP_SLOTS, 4), np.float32)
    kp1[:, :, 0] = USE_SMPL
    kp1[:, :, 1:3] = uv[:, USE_SMPL] + rng.normal(
        size=(wsize, N_KP_SLOTS, 2)).astype(np.float32)
    kp1[:, :, 3] = 1.0
    kp = jnp.asarray(np.tile(kp1, (n_win, 1, 1, 1)))
    p0 = jnp.tile(init_frame_params(), (n_win, wsize, 1))
    w0 = jnp.zeros((n_win, 10), jnp.float32)
    r0 = jnp.tile(jnp.asarray(r0c), (n_win, wsize, 1, 1))
    fv = jnp.ones((n_win, wsize), jnp.float32)

    noop = jax.jit(lambda x: x + 1.0)
    disp = bench_one(noop, jnp.zeros(())) * 1e3
    print(f"dispatch floor          {disp:7.1f} ms", file=sys.stderr)

    variants = [
        ("cr fixed60", dict(ftol=0.0, linear="cr")),
        ("tridiag fixed60", dict(ftol=0.0, linear="tridiag")),
        ("pcg64 fixed60", dict(ftol=0.0, linear="pcg")),
        ("pcg128 fixed60", dict(ftol=0.0, linear="pcg", cg_iters=128)),
        # whole-PCG-in-VMEM Pallas kernel (ops/cg.py) + the XLA-loop
        # unroll knob — the round-2 latency-bound hypotheses
        ("pcgkern64 fixed60", dict(ftol=0.0, linear="pcg_kernel")),
        ("pcg64 unroll4 fixed60", dict(ftol=0.0, linear="pcg", cg_unroll=4)),
        # tolerance exit (MultiFrameConfig.cg_rtol): late LM iterations'
        # CG converges in a few steps; measure whether the while_loop
        # formulation beats the fixed trip count end to end
        ("pcg rtol1e-3 fixed60", dict(ftol=0.0, linear="pcg", cg_rtol=1e-3)),
        ("pcg rtol1e-2 fixed60", dict(ftol=0.0, linear="pcg", cg_rtol=1e-2)),
        # the 2026-08-18 shipped bench default (pcg + fused + it48) and
        # its non-fused twin: attribute the remaining per-iteration floor
        ("pcg48+fused fixed60", dict(ftol=0.0, linear="pcg", cg_iters=48,
                                     fused_cost=True)),
        ("pcg48 fixed60", dict(ftol=0.0, linear="pcg", cg_iters=48)),
        # early-exit machinery cost: same data, default ftol — the bench
        # measured 1390 ms here vs 1144 fixed; decide if the vmapped
        # while_loop any-unconverged exit pays for itself on this batch
        ("cr earlyexit", dict(linear="cr")),
    ]
    for name, kw in variants:
        cfg = MultiFrameConfig(beta_pose=5.0, beta_shape=1e5,
                               lambda_temporal=3.0, max_iters=iters, **kw)
        fit = build_multi_fitter(spec, cam, cfg, 10)
        bfit = jax.jit(jax.vmap(lambda a, b, c, d, e: fit(a, b, c, d, e)))
        dt = bench_one(bfit, p0, w0, kp, r0, fv)
        res = bfit(p0, w0, kp, r0, fv)
        it_max = int(np.max(np.asarray(res.iters_run)))
        print(f"full fit [{name:16s}] {dt * 1e3:7.1f} ms "
              f"({dt / iters * 1e3:5.2f} ms/iter, max iters_run {it_max})",
              file=sys.stderr)

    # ---- components; rebuild the closures build_multi_fitter uses ----
    from smpltpu.energy import keypoint_residuals
    from smpltpu.energy.params import frame_param_layout
    from smpltpu.energy.temporal import temporal_mask
    from smpltpu.solve.lm import _huber_rho, huber_correct_weight
    from smpltpu.solve.tridiag import block_tridiag_solve, block_tridiag_solve_cr

    n_joints = len(spec.parents)
    lay = frame_param_layout(n_joints)
    tmask = temporal_mask(n_joints, jnp.float32)
    aa_slice = slice(lay["joint_aa"][0], lay["joint_aa"][1])
    bp, bs, lam, delta = 5.0, 1e5, 3.0, 3.0

    def kp_res(p_f, w, kp_f, r0_f):
        return keypoint_residuals(p_f, w, kp_f, cam, spec, r0_f)

    def cost_fn(params, w, kpw, r0w, pair_w):
        r = jax.vmap(kp_res, in_axes=(0, None, 0, 0))(params, w, kpw, r0w)
        s = jnp.sum(r.reshape(params.shape[0], -1, 2) ** 2, axis=-1)
        c = jnp.sum(_huber_rho(s, delta))
        c += bp * bp * jnp.sum(params[:, aa_slice] ** 2)
        c += bs * bs * jnp.sum(w * w)
        diff = (params[:-1] - params[1:]) * tmask
        c += jnp.sum((lam * pair_w)[:, None] ** 2 * diff * diff)
        return 0.5 * c

    def assemble(params, w, kpw, r0w):
        n_s = w.shape[0]
        p_dim = params.shape[-1]
        eye_p = jnp.eye(p_dim, dtype=jnp.float32)
        eye_w = jnp.eye(n_s, dtype=jnp.float32)
        zer_p = jnp.zeros((n_s, p_dim), jnp.float32)
        zer_w = jnp.zeros((p_dim, n_s), jnp.float32)

        def one_frame(p_f, kp_f, r0_f):
            def corrected(q, v):
                r = kp_res(q, v, kp_f, r0_f)
                blocks = r.reshape(-1, 2)
                s = jnp.sum(blocks * blocks, axis=-1)
                hw = huber_correct_weight(s, delta)
                return (blocks * hw[:, None]).reshape(-1)

            r, f_jvp = jax.linearize(corrected, p_f, w)
            jp = jax.vmap(f_jvp)(eye_p, zer_w).T
            jw = jax.vmap(f_jvp)(zer_p, eye_w).T
            return (jp.T @ jp, jp.T @ jw, jw.T @ jw, jp.T @ r, jw.T @ r)

        return jax.vmap(one_frame)(params, kpw, r0w)

    pair_w = fv[0][:-1] * fv[0][1:]
    jcost = jax.jit(jax.vmap(
        lambda a, b, c, d: cost_fn(a, b, c, d, pair_w), in_axes=(0, 0, 0, 0)))
    dt = bench_one(jcost, p0, w0, kp, r0)
    print(f"cost eval (batch)       {dt * 1e3:7.1f} ms", file=sys.stderr)

    jasm = jax.jit(jax.vmap(assemble, in_axes=(0, 0, 0, 0)))
    dt = bench_one(jasm, p0, w0, kp, r0)
    print(f"assembly (batch, jvp)   {dt * 1e3:7.1f} ms", file=sys.stderr)

    # the PRODUCTION assembly (analytic geometric Jacobian, the
    # MultiFrameConfig.jacobian="analytic" default since round 2)
    from smpltpu.solve.multi_frame import corrected_frame_assembly

    jasm_a = jax.jit(jax.vmap(jax.vmap(
        lambda a, b, c, d: corrected_frame_assembly(
            a, b, c, d, cam, spec, delta),
        in_axes=(0, None, 0, 0)), in_axes=(0, 0, 0, 0)))
    dt = bench_one(jasm_a, p0, w0, kp, r0)
    print(f"assembly (batch, analytic) {dt * 1e3:6.1f} ms", file=sys.stderr)

    h_pp, b_pw, h_ww, g_p, g_w = jax_block(jasm(p0, w0, kp, r0))
    d_blocks = h_pp + 1e-3 * jnp.eye(h_pp.shape[-1], dtype=jnp.float32)[None, None]
    off = -jnp.ones((n_win, wsize - 1), jnp.float32) * (lam ** 2)
    rhs = jnp.concatenate([g_p[..., None], b_pw], axis=-1)

    for name, fn in (("thomas", block_tridiag_solve),
                     ("cr", block_tridiag_solve_cr)):
        jsol = jax.jit(jax.vmap(lambda d, o, r, fn=fn: fn(d, o, tmask, r)))
        dt = bench_one(jsol, d_blocks, off, rhs)
        print(f"tridiag solve [{name:6s}] {dt * 1e3:7.1f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
