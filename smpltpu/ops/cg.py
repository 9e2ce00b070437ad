"""Whole-PCG-in-VMEM Pallas kernel for the arrowhead GN system.

The stage-2 hot loop (solve/multi_frame.py arrow_pcg) runs Jacobi-PCG on
the window system

    [ T  B ] [dp]   [-g_p]        T = block-tridiag(D_f, E_f)  (F, P, P)
    [ Bᵀ C ] [dw] = [-g_w]        B = per-frame shape coupling (F, P, nS)

as XLA-fused batched matvecs inside a ``fori_loop``. Measured on v5e the
loop is latency/overhead-bound at ~78 us/iteration (docs/ROADMAP.md: the
bf16 experiment halved the dominant HBM read and bought only ~5%), i.e.
the cost is per-step kernel scheduling, not FLOPs or bandwidth.

This kernel removes the per-step overhead entirely: ONE Pallas program
per window holds the whole system in VMEM (~1.5 MB: D 20x128x128 f32,
B, vectors) and runs ALL cg_iters iterations on-chip. HBM traffic drops
from (blocks re-read per iteration) to (blocks read once). The matvec is
a batched (F, P, P) x (F, P) dot on the MXU plus VPU stencil/arrow FMAs.

Exposed through ``MultiFrameConfig.linear = "pcg_kernel"`` — numerically
the same Jacobi-PCG recursion as ``linear="pcg"`` in f32 (pinned by
tests/test_cg_kernel.py), so the dogleg/Steihaug properties documented in
ROADMAP are preserved. Replaces the hot loop of the reference's
``ceres::Solve`` linear solves (include/MultiFrameBA.h:145-151) at the
kernel level.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PP = 128  # padded frame-param dim (P = 76 zero-extended; lane width)


def _cg_kernel(d_ref, b_ref, c_ref, offp_ref, offm_ref, tm_ref,
               gp_ref, gw_ref, dinv_ref, cinv_ref,
               dp_ref, dw_ref, *, iters: int, n_s: int, f_dim: int,
               matvec_mode: str = "batched", rtol: float = 0.0,
               precision=None):
    """One window's full PCG solve. Shapes (all f32, zero-padded to PP):

    d    (F, PP, PP)  symmetric damped GN diag blocks
    b    (nS, F, PP)  shape-coupling planes (b[s][f] = B[f, :, s])
    c    (nS, nS)     regularized shape block
    offp (F, 1)       E_f scale for the f<->f+1 coupling (0 at F-1)
    offm (F, 1)       same shifted down (0 at 0)
    tm   (1, PP)      temporal mask over the param lanes
    gp   (F, PP)      pose gradient; gw (nS, 1) shape gradient
    dinv (F, PP)      Jacobi preconditioner (0 in padded lanes)
    cinv (nS, 1)
    out: dp (F, PP), dw (nS, 1)
    """
    f32 = jnp.float32
    d = d_ref[:]
    tm = tm_ref[:]
    offp = offp_ref[:]
    offm = offm_ref[:]
    gp = gp_ref[:]
    gw = gw_ref[:]
    dinv = dinv_ref[:]
    cinv = cinv_ref[:]
    zrow = jnp.zeros((1, PP), f32)

    def matvec(v_p, v_w):
        # block-diagonal: F static (1, PP) @ (PP, PP) row-dots
        # concatenated (D is symmetric, so row-form == col-form) — MXU
        # matmuls Mosaic compiles cleanly. The "batched" dot_general form
        # is REJECTED by Mosaic on real v5e (libtpu 2026-08: "only
        # constant accumulators supported" for the batched-contraction
        # vector.multi_reduction) — kept selectable for future toolchains.
        if matvec_mode == "batched":
            u = jax.lax.dot_general(
                d, v_p, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32, precision=precision)
        else:
            u = jnp.concatenate(
                [jnp.dot(v_p[f:f + 1, :], d_ref[f],
                         preferred_element_type=f32, precision=precision)
                 for f in range(f_dim)], axis=0)
        # tridiagonal stencil: E_f = offp[f] * diag(tm)
        v_up = jnp.concatenate([v_p[1:], zrow], axis=0)
        v_dn = jnp.concatenate([zrow, v_p[:-1]], axis=0)
        u = u + offp * (tm * v_up) + offm * (tm * v_dn)
        # arrow coupling (nS unrolled VPU FMAs / reductions)
        uw_rows = []
        for s in range(n_s):
            u = u + b_ref[s] * v_w[s, 0]
            uw_rows.append(jnp.sum(b_ref[s] * v_p).reshape(1, 1))
        u_w = (jnp.concatenate(uw_rows, axis=0)
               + jnp.dot(c_ref[:], v_w, preferred_element_type=f32))
        return u, u_w

    x_p = jnp.zeros_like(gp)
    x_w = jnp.zeros_like(gw)
    r_p, r_w = -gp, -gw
    z_p, z_w = dinv * r_p, cinv * r_w
    rho = jnp.sum(r_p * z_p) + jnp.sum(r_w * z_w)

    def body(_, carry):
        x_p, x_w, r_p, r_w, d_p, d_w, rho = carry
        q_p, q_w = matvec(d_p, d_w)
        denom = jnp.sum(d_p * q_p) + jnp.sum(d_w * q_w)
        alpha = rho / jnp.maximum(denom, 1e-30)
        x_p = x_p + alpha * d_p
        x_w = x_w + alpha * d_w
        r_p = r_p - alpha * q_p
        r_w = r_w - alpha * q_w
        z_p = dinv * r_p
        z_w = cinv * r_w
        rho_n = jnp.sum(r_p * z_p) + jnp.sum(r_w * z_w)
        beta = rho_n / jnp.maximum(rho, 1e-30)
        return (x_p, x_w, r_p, r_w, z_p + beta * d_p, z_w + beta * d_w,
                rho_n)

    if rtol > 0.0:
        # tolerance exit (MultiFrameConfig.cg_rtol): same contract as the
        # XLA pcg loop — stop once the UNpreconditioned residual drops
        # below rtol^2 * ||r0||^2; the scalar carry keeps the reduction
        # out of the cond (one VPU reduction per body)
        rr0 = jnp.sum(r_p * r_p) + jnp.sum(r_w * r_w)
        tol2 = jnp.float32(rtol * rtol) * rr0

        def cond(c):
            return (c[0] < iters) & (c[1] > tol2)

        def wbody(c):
            new = body(None, c[2:])
            rr = jnp.sum(new[2] * new[2]) + jnp.sum(new[3] * new[3])
            return (c[0] + 1, rr) + new

        out = jax.lax.while_loop(
            cond, wbody, (jnp.asarray(0, jnp.int32), rr0,
                          x_p, x_w, r_p, r_w, z_p, z_w, rho))[2:]
    else:
        out = jax.lax.fori_loop(0, iters, body,
                                (x_p, x_w, r_p, r_w, z_p, z_w, rho))
    dp_ref[:] = out[0]
    dw_ref[:] = out[1]


def arrow_pcg_pallas(d_blocks, off_scale, tmask, b_pw, c_reg, g_p, g_w,
                     iters: int = 64, interpret: bool = False,
                     matvec_mode: str | None = None, rtol: float = 0.0):
    """Drop-in f32 replacement for solve/multi_frame.arrow_pcg.

    d_blocks (F, P, P), off_scale (F-1,), tmask (P,), b_pw (F, P, nS),
    c_reg (nS, nS), g_p (F, P), g_w (nS,). Returns (dp (F, P), dw (nS,)),
    the PCG iterate after ``iters`` Jacobi-preconditioned steps from 0
    (identical recursion to the XLA path; truncated-CG/Steihaug semantics
    preserved). vmap over a leading window axis adds a Pallas grid dim.
    """
    f_dim, p_dim = g_p.shape
    n_s = g_w.shape[0]
    f32 = jnp.float32
    pad_p = PP - p_dim

    d = jnp.pad(d_blocks.astype(f32), ((0, 0), (0, pad_p), (0, pad_p)))
    b = jnp.pad(b_pw.astype(f32), ((0, 0), (0, pad_p), (0, 0)))
    b = jnp.transpose(b, (2, 0, 1))                        # (nS, F, PP)
    c = c_reg.astype(f32)
    gp = jnp.pad(g_p.astype(f32), ((0, 0), (0, pad_p)))
    gw = g_w.astype(f32)[:, None]                          # (nS, 1)
    offp = jnp.pad(off_scale.astype(f32), (0, 1))[:, None]  # (F, 1)
    offm = jnp.pad(off_scale.astype(f32), (1, 0))[:, None]
    tm = jnp.pad(tmask.astype(f32), (0, pad_p))[None, :]   # (1, PP)

    # Jacobi preconditioner (zero in the padded lanes so CG stays in the
    # embedded subspace — padded D rows/cols are zero)
    dinv = 1.0 / jnp.maximum(
        jnp.diagonal(d_blocks.astype(f32), axis1=1, axis2=2), 1e-20)
    dinv = jnp.pad(dinv, ((0, 0), (0, pad_p)))
    cinv = (1.0 / jnp.maximum(jnp.diagonal(c), 1e-20))[:, None]

    import os
    if matvec_mode is None:
        matvec_mode = os.environ.get("SMPLTPU_CG_MATVEC", "unrolled")
    # MXU f32 matmul precision inside the kernel: "highest" runs the full
    # multi-pass f32 decomposition — the kernel is overhead-bound, so the
    # extra passes are nearly free, and the CG trajectory stays closer to
    # the XLA loop's (measured residual drift 0.2-0.4 px at "default")
    prec_name = os.environ.get("SMPLTPU_CG_PRECISION", "highest")
    prec_table = {"default": None, "highest": jax.lax.Precision.HIGHEST}
    if prec_name not in prec_table:
        raise ValueError(
            f"SMPLTPU_CG_PRECISION must be one of {sorted(prec_table)}, "
            f"got {prec_name!r}")
    prec = prec_table[prec_name]
    kern = functools.partial(_cg_kernel, iters=iters, n_s=n_s, f_dim=f_dim,
                             matvec_mode=matvec_mode, rtol=float(rtol),
                             precision=prec)
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    dp, dw = pl.pallas_call(
        kern,
        in_specs=[vspec() for _ in range(10)],
        out_specs=[vspec(), vspec()],
        out_shape=[jax.ShapeDtypeStruct((f_dim, PP), f32),
                   jax.ShapeDtypeStruct((n_s, 1), f32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * iters * f_dim * PP * (PP + 2 * n_s + 4),
            bytes_accessed=4 * (f_dim * PP * (PP + n_s) + 8 * f_dim * PP),
            transcendentals=0,
        ),
        interpret=interpret,
    )(d, b, c, offp, offm, tm, gp, gw, dinv, cinv)
    return dp[:, :p_dim].astype(g_p.dtype), dw[:, 0].astype(g_w.dtype)
