"""Sharded solvers over the device mesh.

Two production paths:

1. ``sharded_window_fit`` — data-parallel sliding windows: each device
   solves its slice of the window batch with the single-chip multi-frame
   fitter (stage-2 of the pipeline; windows are independent once the shape
   is locked, so this is pure DP over ICI with no communication until the
   results gather).

2. ``sharded_gn_step`` — one damped Gauss-Newton step of the SHARED-SHAPE
   multi-frame problem with FRAMES sharded across the mesh (stage-1
   anchors at scale). Per-shard: vmapped jacfwd assembly of the local
   normal-equation blocks. Cross-shard: the 10x10 shape Schur pieces
   reduce with ``psum``; the temporal stencil's nearest-neighbor coupling
   uses one ``ppermute`` halo row per side inside a block-Jacobi
   preconditioned conjugate-gradient solve of the full SPD system
   [T B; B^T C]. All collectives ride the ICI ring.

This subsystem replaces nothing in the reference (it has no distributed
layer, SURVEY.md section 2.4) — it is the TPU-native scaling story that
lets one 1000-frame video optimize as one sharded batched solve.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from smpltpu.constants import SCALE_MAX, SCALE_MIN
from smpltpu.energy import Camera, SkeletonSpec, keypoint_residuals
from smpltpu.energy.params import frame_param_layout
from smpltpu.energy.temporal import temporal_mask
from smpltpu.solve.lm import _huber_rho
from smpltpu.utils.chunked import chunked_map
from smpltpu.solve.multi_frame import (
    MultiFrameConfig,
    MultiFrameResult,
    _pose_prior_sel,
    corrected_frame_assembly,
)


# ---------------------------------------------------------------------
# path 1: DP over windows
# ---------------------------------------------------------------------
def sharded_window_fit(mesh: Mesh, fitter, params0, shape0, kp, r0,
                       frame_valid, axis: str = "frames", chunk: int = 0):
    """vmap the single-chip window fitter and shard the window axis over
    the mesh. `fitter` is a build_multi_fitter result; inputs carry a
    leading window axis divisible by the mesh size.

    chunk > 0 composes the chunked-dispatch tail fix
    (solve/multi_frame.build_chunked_window_fit) with the mesh: inside a
    shard_map each device lax.maps its LOCAL window slice in chunk-sized
    vmapped batches, so every chunk's convergence-exit while_loop
    terminates independently PER DEVICE. Without it, the vmapped
    while_loop's condition reduces over the GLOBAL sharded batch — every
    device spins (and the cond's all-reduce rides ICI every iteration)
    until the globally slowest window converges; on long videos that tail
    cost 945 vs 1617 frames/s on one chip (docs/ROADMAP.md 10k-frame
    entry). Per-window optima are unchanged (converged windows freeze;
    chunked == vmapped pinned bit-tight in f64 by
    tests/test_parallel.py::test_sharded_window_fit_chunked). A chunk
    larger than the local window slice (n_win / mesh) is handled — the
    chunk pads by replicating the last local window — but wastes the
    replicated compute; prefer chunk <= n_win / mesh."""
    spec_in = NamedSharding(mesh, P(axis))
    args = [jax.device_put(a, spec_in)
            for a in (params0, shape0, kp, r0, frame_valid)]
    if chunk <= 0:
        batched = jax.jit(jax.vmap(
            lambda a, b, c, d, e: fitter(a, b, c, d, e)))
        return batched(*args)

    vfit = jax.vmap(lambda a, b, c, d, e: fitter(a, b, c, d, e))

    def local_chunked(*local_args):
        return chunked_map(vfit, chunk, *local_args)

    # check_vma=False: the fitter's while_loop carries start as replicated
    # scalars (converged=False etc.) and become device-varying after one
    # body step — a type error under vma tracking, semantically fine for
    # this collective-free per-device map (same setting as the sharded LM
    # shard_maps below)
    spmd = shard_map(local_chunked, mesh=mesh,
                     in_specs=(P(axis),) * 5, out_specs=P(axis),
                     check_vma=False)
    return jax.jit(spmd)(*args)


def sharded_frame_fit(mesh: Mesh, fitter, x0, kp, axis: str = "frames",
                      chunk: int = 0):
    """DP the single-frame batch over the mesh: ``fitter`` is a
    build_fitter result (solve/single_frame.py — already jit(vmap) over
    the frame axis), so sharding the inputs lets GSPMD partition the
    batched program; per-frame solves are independent (the reference's
    per-frame loop, src/main_single_frame.cpp:192), so no communication
    until the gather. Leading axis must be divisible by the mesh size.

    chunk > 0 mirrors sharded_window_fit's chunked dispatch: inside a
    shard_map each device lax.maps its LOCAL frame slice in chunk-sized
    vmapped batches with per-chunk convergence exits (both the LM
    while_loop AND the chol TR solver's secular-Newton while_loop
    otherwise lift their conditions over the GLOBAL batch, every device
    spinning until the globally slowest frame converges). Pass an
    UNCHUNKED fitter (build_fitter(chunk=0)); local padding replicates
    the last local frame."""
    spec_in = NamedSharding(mesh, P(axis))
    args = (jax.device_put(x0, spec_in), jax.device_put(kp, spec_in))
    if chunk <= 0:
        return fitter(*args)

    def local_chunked(lx0, lkp):
        return chunked_map(fitter, chunk, lx0, lkp)

    spmd = shard_map(local_chunked, mesh=mesh,
                     in_specs=(P(axis),) * 2, out_specs=P(axis),
                     check_vma=False)
    return jax.jit(spmd)(*args)


# ---------------------------------------------------------------------
# path 2: frames sharded, shared shape, halo-exchange PCG
# ---------------------------------------------------------------------
class GNStepResult(NamedTuple):
    params: jnp.ndarray  # (F, P) updated
    shape: jnp.ndarray   # (nS,) updated (replicated)
    cg_residual: jnp.ndarray  # () final CG residual norm


def build_sharded_gn_step(
    mesh: Mesh,
    spec: SkeletonSpec,
    cam: Camera,
    cfg: MultiFrameConfig,
    n_shapes: int,
    cg_iters: int = 64,
    damping: float = 1e-3,
    axis: str = "frames",
    dtype=jnp.float32,
):
    """Return a jitted fn(params (F,P), shape (nS,), kp (F,K,4), r0 (F,3,3))
    -> GNStepResult performing ONE damped GN/LM step with frames sharded.

    F must be divisible by the mesh size. The step solves
        [T + lam*diag, B; B^T, C + lam*diag] d = -g
    by block-Jacobi-preconditioned CG, where T's off-diagonal temporal
    blocks couple across shard boundaries via ppermute halo rows.
    """
    n_joints = len(spec.parents)
    lay = frame_param_layout(n_joints)
    p_dim = lay["total"]
    bp = jnp.asarray(cfg.beta_pose, dtype)
    bs = jnp.asarray(cfg.beta_shape, dtype)
    lam_t = jnp.asarray(cfg.lambda_temporal, dtype)
    tmask = temporal_mask(n_joints, dtype)
    psel = _pose_prior_sel(n_joints, dtype)
    aa_slice = slice(lay["joint_aa"][0], lay["joint_aa"][1])
    n_dev = mesh.shape[axis]

    def local_assembly(params, w, kp, r0):
        """Per-shard normal-equation pieces (no communication); shared
        Huber-corrected assembly (closed-form geometric Jacobian by
        default, solve/multi_frame.corrected_frame_assembly)."""
        def one(p_f, kp_f, r0_f):
            return corrected_frame_assembly(
                p_f, w, kp_f, r0_f, cam, spec, cfg.huber_delta,
                jacobian=cfg.jacobian)

        return jax.vmap(one)(params, kp, r0)

    def gn_step_spmd(params, w, kp, r0, pair_c):
        """Runs inside shard_map: params (F_loc, P) local shard, w (nS,)
        replicated, pair_c (F_loc,) = temporal pair weight between local
        frame f and GLOBAL frame f+1 (0 on the last global frame)."""
        idx = jax.lax.axis_index(axis)
        f_loc = params.shape[0]

        h_pp, b_pw, h_ww, g_p, g_w_loc = local_assembly(params, w, kp, r0)

        # priors
        h_pp = h_pp + (bp * bp) * jnp.diag(psel)[None]
        g_p = g_p + (bp * bp) * psel[None, :] * params

        # temporal: needs next shard's first frame (halo)
        perm_fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]  # send to next
        perm_bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

        def halo_next(x):
            """x (F_loc, P) -> row of GLOBAL frame f_end+1 (next shard's
            first row), garbage on the last shard (masked by pair_c=0)."""
            first = x[0]
            return jax.lax.ppermute(first, axis, perm_bwd)

        def halo_prev(x):
            last = x[-1]
            return jax.lax.ppermute(last, axis, perm_fwd)

        lam2 = (lam_t * pair_c) ** 2                      # (F_loc,)
        lam2_prev_last = jax.lax.ppermute(lam2[-1], axis, perm_fwd)
        lam2_prev = jnp.concatenate([lam2_prev_last[None], lam2[:-1]])

        # degree term on the diagonal
        deg = lam2 + lam2_prev
        h_pp_d = h_pp + deg[:, None, None] * jnp.diag(tmask)[None]

        # temporal gradient: lam2_f * m (p_f - p_{f+1}) - lam2_{f-1} * m (p_{f-1} - p_f)
        p_next = jnp.concatenate([params[1:], halo_next(params)[None]])
        p_prev = jnp.concatenate([halo_prev(params)[None], params[:-1]])
        g_p = g_p + lam2[:, None] * tmask * (params - p_next)
        g_p = g_p - lam2_prev[:, None] * tmask * (p_prev - params)

        # shape block: psum across shards
        c_ww = jax.lax.psum(jnp.sum(h_ww, axis=0), axis)
        c_ww = c_ww + (bs * bs) * jnp.eye(n_shapes, dtype=dtype)
        g_w = jax.lax.psum(jnp.sum(g_w_loc, axis=0), axis) + (bs * bs) * w

        if cfg.freeze_scale:  # gauge fix (see solve/multi_frame.py)
            m = jnp.ones(h_pp_d.shape[-1], dtype).at[0].set(0.0)
            h_pp_d = (h_pp_d * m[None, :, None] * m[None, None, :]
                      + jnp.diag(1.0 - m)[None])
            b_pw = b_pw * m[None, :, None]
            g_p = g_p * m[None, :]

        # damping
        dscale = jnp.clip(jnp.diagonal(h_pp_d, axis1=1, axis2=2), 1e-6, 1e32)
        h_damped = h_pp_d + damping * jax.vmap(jnp.diag)(dscale)
        c_damped = c_ww + damping * jnp.diag(jnp.clip(jnp.diagonal(c_ww), 1e-6, 1e32))

        # ---- PCG on the full SPD system ----
        def matvec(v_p, v_w):
            u = jnp.einsum("fab,fb->fa", h_damped, v_p)
            v_next = jnp.concatenate([v_p[1:], halo_next(v_p)[None]])
            v_prev = jnp.concatenate([halo_prev(v_p)[None], v_p[:-1]])
            u = u - lam2[:, None] * tmask * v_next
            u = u - lam2_prev[:, None] * tmask * v_prev
            u = u + jnp.einsum("fps,s->fp", b_pw, v_w)
            u_w = jax.lax.psum(jnp.einsum("fps,fp->s", b_pw, v_p), axis)
            u_w = u_w + c_damped @ v_w
            return u, u_w

        # block-Jacobi preconditioner
        pre_p = jnp.linalg.inv(h_damped)       # (F_loc, P, P)
        pre_w = jnp.linalg.inv(c_damped)

        def precond(r_p, r_w):
            return jnp.einsum("fab,fb->fa", pre_p, r_p), pre_w @ r_w

        def dot(a_p, a_w, b_p, b_w):
            local = jnp.sum(a_p * b_p)
            return jax.lax.psum(local, axis) + a_w @ b_w

        b_p_rhs, b_w_rhs = -g_p, -g_w
        x_p = jnp.zeros_like(g_p)
        x_w = jnp.zeros_like(g_w)
        r_p, r_w = b_p_rhs, b_w_rhs
        z_p, z_w = precond(r_p, r_w)
        rho = dot(r_p, r_w, z_p, z_w)

        def cg_body(_, carry):
            x_p, x_w, r_p, r_w, d_p, d_w, rho = carry
            q_p, q_w = matvec(d_p, d_w)
            alpha = rho / jnp.maximum(dot(d_p, d_w, q_p, q_w), 1e-30)
            x_p = x_p + alpha * d_p
            x_w = x_w + alpha * d_w
            r_p = r_p - alpha * q_p
            r_w = r_w - alpha * q_w
            z_p, z_w = precond(r_p, r_w)
            rho_new = dot(r_p, r_w, z_p, z_w)
            beta = rho_new / jnp.maximum(rho, 1e-30)
            d_p = z_p + beta * d_p
            d_w = z_w + beta * d_w
            return x_p, x_w, r_p, r_w, d_p, d_w, rho_new

        carry = (x_p, x_w, r_p, r_w, z_p, z_w, rho)
        x_p, x_w, r_p, r_w, _, _, _ = jax.lax.fori_loop(
            0, cg_iters, cg_body, carry)

        res_norm = jnp.sqrt(dot(r_p, r_w, r_p, r_w))
        new_p = params + x_p
        if cfg.freeze_scale:
            # the masked system already held scale fixed; pin it exactly
            new_p = new_p.at[:, 0].set(params[:, 0])
        else:
            # backstop clamp (Sim3BA.h:613-614 via solve/multi_frame.py)
            new_p = new_p.at[:, 0].set(
                jnp.clip(new_p[:, 0], SCALE_MIN, SCALE_MAX))
        return new_p, w + x_w, res_norm

    in_specs = (P(axis), P(), P(axis), P(axis), P(axis))
    out_specs = (P(axis), P(), P())
    spmd = shard_map(gn_step_spmd, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_vma=False)

    @jax.jit
    def step(params, w, kp, r0):
        f_dim = params.shape[0]
        pair_c = jnp.ones(f_dim, dtype).at[-1].set(0.0)
        new_p, new_w, res = spmd(params.astype(dtype), w.astype(dtype),
                                 kp.astype(dtype), r0.astype(dtype), pair_c)
        return GNStepResult(new_p, new_w, res)

    return step


def sharded_gn_step(mesh, spec, cam, cfg, params, w, kp, r0, **kw):
    """Convenience one-shot wrapper around build_sharded_gn_step."""
    step = build_sharded_gn_step(mesh, spec, cam, cfg, int(w.shape[0]), **kw)
    return step(params, w, kp, r0)


# ---------------------------------------------------------------------
# path 3: FULL sharded LM — trust-region loop around the halo PCG
# ---------------------------------------------------------------------
def build_sharded_lm_fitter(
    mesh: Mesh,
    spec: SkeletonSpec,
    cam: Camera,
    cfg: MultiFrameConfig,
    n_shapes: int,
    cg_iters: int | None = None,
    axis: str = "frames",
    dtype=jnp.float32,
):
    """The multi-chip counterpart of ``build_multi_fitter``: the COMPLETE
    trust-region LM minimizer of the shared-shape multi-frame objective
    (replacing the whole ceres::Solve call, MultiFrameBA.h:145-151, not
    just one step) with frames sharded over the mesh.

    Per iteration, inside ONE shard_map-wrapped lax.scan (one jitted SPMD
    program for the whole solve):
      * local normal-equation assembly (vmapped jacfwd, no communication);
      * shape Schur pieces psum-reduced; temporal coupling across shard
        boundaries via ppermute halo rows;
      * block-Jacobi PCG on the damped SPD system;
      * Ceres-style accept/reject with the trust-region radius schedule of
        solve/lm.py (grow r/max(1/3, 1-(2rho-1)^3), shrink r/k doubling)
        on replicated scalars — every shard computes identical psum-reduced
        cost/rho, so the control state stays in lockstep with no extra
        broadcast.

    Returns fn(params0 (F,P), shape0 (nS,), kp (F,K,4), r0 (F,3,3),
    frame_valid (F,) | None) -> MultiFrameResult. F must be divisible by
    the mesh size (pad with frame_valid=0 rows + masked keypoints).
    Mesh-invariance (1 vs 8 devices) and agreement with the single-chip
    fitter are pinned in tests/test_parallel.py.

    The linear solve is ALWAYS the distributed halo-exchange PCG — an
    exact block-tridiagonal elimination is sequential across the frame
    shards, so ``cfg.linear`` does not apply here; ``cfg.cg_iters`` is
    honored (the explicit ``cg_iters`` argument overrides it), and
    ``cfg.cg_rtol > 0`` switches the CG loop to a tolerance exit (the
    one-step ``build_sharded_gn_step`` building block keeps fixed trips).
    """
    if cg_iters is None:
        cg_iters = cfg.cg_iters
    n_joints = len(spec.parents)
    lay = frame_param_layout(n_joints)
    p_dim = lay["total"]
    bp = jnp.asarray(cfg.beta_pose, dtype)
    bs = jnp.asarray(cfg.beta_shape, dtype)
    lam_t = jnp.asarray(cfg.lambda_temporal, dtype)
    tmask = temporal_mask(n_joints, dtype)
    psel = _pose_prior_sel(n_joints, dtype)
    aa_slice = slice(lay["joint_aa"][0], lay["joint_aa"][1])
    n_dev = mesh.shape[axis]
    perm_fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    perm_bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def kp_res(p_f, w, kp_f, r0_f):
        return keypoint_residuals(p_f, w, kp_f, cam, spec, r0_f)

    def local_assembly(params, w, kp, r0):
        """Per-shard normal-equation pieces (no communication); shared
        Huber-corrected assembly (closed-form geometric Jacobian by
        default, solve/multi_frame.corrected_frame_assembly)."""
        def one(p_f, kp_f, r0_f):
            return corrected_frame_assembly(
                p_f, w, kp_f, r0_f, cam, spec, cfg.huber_delta,
                jacobian=cfg.jacobian)

        return jax.vmap(one)(params, kp, r0)

    def lm_spmd(params0, w0, kp, r0, pair_c, r0_init):
        def halo_next(x):
            return jax.lax.ppermute(x[0], axis, perm_bwd)

        def halo_prev(x):
            return jax.lax.ppermute(x[-1], axis, perm_fwd)

        lam2 = (lam_t * pair_c) ** 2
        lam2_prev = jnp.concatenate(
            [jax.lax.ppermute(lam2[-1], axis, perm_fwd)[None], lam2[:-1]])

        def cost_fn(params, w):
            r = jax.vmap(kp_res, in_axes=(0, None, 0, 0))(params, w, kp, r0)
            s = jnp.sum(r.reshape(params.shape[0], -1, 2) ** 2, axis=-1)
            c_kp = jnp.sum(_huber_rho(s, cfg.huber_delta))
            c_pose = bp * bp * jnp.sum(params[:, aa_slice] ** 2)
            p_next = jnp.concatenate([params[1:], halo_next(params)[None]])
            diff = (params - p_next) * tmask
            c_temp = jnp.sum(lam2[:, None] * diff * diff)
            total = jax.lax.psum(c_kp + c_pose + c_temp, axis)
            return 0.5 * (total + bs * bs * jnp.sum(w * w))

        def pdot(a_p, a_w, b_p, b_w):
            return jax.lax.psum(jnp.sum(a_p * b_p), axis) + a_w @ b_w

        def step(carry, _):
            (params, w, radius, dec_f, cost, converged, n_acc, iters) = carry

            h_pp, b_pw, h_ww, g_p, g_w_loc = local_assembly(params, w, kp, r0)
            h_pp = h_pp + (bp * bp) * jnp.diag(psel)[None]
            g_p = g_p + (bp * bp) * psel[None, :] * params
            deg = lam2 + lam2_prev
            h_pp = h_pp + deg[:, None, None] * jnp.diag(tmask)[None]
            p_next = jnp.concatenate([params[1:], halo_next(params)[None]])
            p_prev = jnp.concatenate([halo_prev(params)[None], params[:-1]])
            g_p = g_p + lam2[:, None] * tmask * (params - p_next)
            g_p = g_p - lam2_prev[:, None] * tmask * (p_prev - params)

            c_ww = jax.lax.psum(jnp.sum(h_ww, axis=0), axis)
            c_ww = c_ww + (bs * bs) * jnp.eye(n_shapes, dtype=dtype)
            g_w = (jax.lax.psum(jnp.sum(g_w_loc, axis=0), axis)
                   + (bs * bs) * w)

            if cfg.freeze_scale:  # gauge fix (solve/multi_frame.py)
                m = jnp.ones(p_dim, dtype).at[0].set(0.0)
                h_pp = (h_pp * m[None, :, None] * m[None, None, :]
                        + jnp.diag(1.0 - m)[None])
                b_pw = b_pw * m[None, :, None]
                g_p = g_p * m[None, :]

            diag_p = jnp.clip(jnp.diagonal(h_pp, axis1=1, axis2=2),
                              cfg.diag_min, cfg.diag_max)
            diag_w = jnp.clip(jnp.diagonal(c_ww), cfg.diag_min, cfg.diag_max)
            if cfg.dogleg:
                # lightly-regularized GN system; the dogleg combination
                # below reaches the trust boundary (solve/multi_frame.py)
                h_damped = h_pp + jax.vmap(jnp.diag)(
                    1e-9 * diag_p + cfg.diag_eps)
                c_damped = c_ww + jnp.diag(1e-9 * diag_w + cfg.diag_eps)
            else:
                h_damped = h_pp + jax.vmap(jnp.diag)(
                    diag_p / radius + cfg.diag_eps)
                c_damped = c_ww + jnp.diag(diag_w / radius + cfg.diag_eps)

            def matvec(blocks_p, blocks_w, v_p, v_w):
                u = jnp.einsum("fab,fb->fa", blocks_p, v_p)
                v_next = jnp.concatenate([v_p[1:], halo_next(v_p)[None]])
                v_prev = jnp.concatenate([halo_prev(v_p)[None], v_p[:-1]])
                u = u - lam2[:, None] * tmask * v_next
                u = u - lam2_prev[:, None] * tmask * v_prev
                u = u + jnp.einsum("fps,s->fp", b_pw, v_w)
                u_w = jax.lax.psum(jnp.einsum("fps,fp->s", b_pw, v_p), axis)
                u_w = u_w + blocks_w @ v_w
                return u, u_w

            pre_p = jnp.linalg.inv(h_damped)
            pre_w = jnp.linalg.inv(c_damped)

            def precond(r_p, r_w):
                return jnp.einsum("fab,fb->fa", pre_p, r_p), pre_w @ r_w

            x_p = jnp.zeros_like(g_p)
            x_w = jnp.zeros_like(g_w)
            r_p, r_w = -g_p, -g_w
            z_p, z_w = precond(r_p, r_w)
            rho0 = pdot(r_p, r_w, z_p, z_w)

            def cg_body(_, c):
                x_p, x_w, r_p, r_w, d_p, d_w, rho = c
                q_p, q_w = matvec(h_damped, c_damped, d_p, d_w)
                alpha = rho / jnp.maximum(pdot(d_p, d_w, q_p, q_w), 1e-30)
                x_p = x_p + alpha * d_p
                x_w = x_w + alpha * d_w
                r_p = r_p - alpha * q_p
                r_w = r_w - alpha * q_w
                z_p, z_w = precond(r_p, r_w)
                rho_new = pdot(r_p, r_w, z_p, z_w)
                beta = rho_new / jnp.maximum(rho, 1e-30)
                return (x_p, x_w, r_p, r_w, z_p + beta * d_p,
                        z_w + beta * d_w, rho_new)

            if cfg.cg_rtol > 0.0:
                # tolerance exit (MultiFrameConfig.cg_rtol, same contract
                # as the single-chip pcg loop): stop once the UNprecond.
                # residual drops below rtol^2 * ||r0||^2. The psum'd
                # residual norm is computed in the BODY and carried — a
                # collective inside while_loop's cond is not legal under
                # shard_map, the carried scalar is replicated so every
                # shard exits on the same trip.
                rr0 = pdot(r_p, r_w, r_p, r_w)
                tol2 = (cfg.cg_rtol * cfg.cg_rtol) * rr0

                def cond_cg(c):
                    return (c[0] < cg_iters) & (c[1] > tol2)

                def body_cg(c):
                    new = cg_body(None, c[2:])
                    rr = pdot(new[2], new[3], new[2], new[3])
                    return (c[0] + 1, rr) + new

                c = jax.lax.while_loop(
                    cond_cg, body_cg,
                    (jnp.asarray(0, jnp.int32), rr0,
                     x_p, x_w, r_p, r_w, z_p, z_w, rho0))
                x_p, x_w = c[2], c[3]
            else:
                x_p, x_w, _, _, _, _, _ = jax.lax.fori_loop(
                    0, cg_iters, cg_body,
                    (x_p, x_w, r_p, r_w, z_p, z_w, rho0))

            if cfg.dogleg:
                # Powell dogleg: GN point (the PCG solution) + Cauchy
                # point, interpolated to the trust boundary — all norms
                # and dots psum-reduced so every shard picks the same case
                n_gn = jnp.sqrt(pdot(x_p, x_w, x_p, x_w))
                hg_p, hg_w = matvec(h_pp, c_ww, g_p, g_w)
                gg = pdot(g_p, g_w, g_p, g_w)
                ghg = jnp.maximum(pdot(g_p, g_w, hg_p, hg_w), 1e-30)
                alpha_c = gg / ghg
                sd_p, sd_w = -alpha_c * g_p, -alpha_c * g_w
                n_sd = alpha_c * jnp.sqrt(gg)
                df_p, df_w = x_p - sd_p, x_w - sd_w
                a = jnp.maximum(pdot(df_p, df_w, df_p, df_w), 1e-30)
                b = 2.0 * pdot(sd_p, sd_w, df_p, df_w)
                c = n_sd * n_sd - radius * radius
                disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
                tau = jnp.clip((-b + jnp.sqrt(disc)) / (2.0 * a), 0.0, 1.0)
                use_gn = n_gn <= radius
                use_sd = jnp.logical_not(use_gn) & (n_sd >= radius)
                sd_scale = radius / jnp.maximum(n_sd, 1e-30)

                def pick(gn, sd, df):
                    return jnp.where(use_gn, gn,
                                     jnp.where(use_sd, sd_scale * sd,
                                               sd + tau * df))
                x_p = pick(x_p, sd_p, df_p)
                x_w = pick(x_w, sd_w, df_w)
                boundary = jnp.logical_not(use_gn)
            else:
                boundary = jnp.asarray(True)

            params_new = params + x_p
            if cfg.freeze_scale:
                params_new = params_new.at[:, 0].set(params[:, 0])
            else:
                params_new = params_new.at[:, 0].set(
                    jnp.clip(params_new[:, 0], SCALE_MIN, SCALE_MAX))
            dp = params_new - params
            w_new = w + x_w
            cost_new = cost_fn(params_new, w_new)

            # model decrease on the UNDAMPED quadratic
            hd, hd_w = matvec(h_pp, c_ww, dp, x_w)
            gd = pdot(g_p, g_w, dp, x_w)
            dhd = pdot(hd, hd_w, dp, x_w)
            model_decrease = -gd - 0.5 * dhd
            rho = (cost - cost_new) / jnp.maximum(model_decrease, 1e-30)
            valid = jnp.isfinite(cost_new) & (model_decrease > 0)

            if cfg.dogleg:
                accept = valid & (cost - cost_new > 0)
                step_norm = jnp.sqrt(pdot(dp, x_w, dp, x_w))
                radius_new = jnp.where(
                    rho < 0.25, 0.25 * step_norm,
                    jnp.where((rho > 0.75) & boundary, 2.0 * radius, radius))
                radius_new = jnp.clip(radius_new, 1e-12, 1e10)
                dec_new = dec_f
            else:
                accept = valid & (rho > cfg.min_rel_decrease)
                grow = radius / jnp.maximum(1.0 / 3.0,
                                            1.0 - (2.0 * rho - 1.0) ** 3)
                shrink = radius / dec_f
                radius_new = jnp.clip(jnp.where(accept, grow, shrink),
                                      1e-32, 1e16)
                dec_new = jnp.where(accept, 2.0, dec_f * 2.0)

            f_conv = jnp.abs(cost - cost_new) <= cfg.ftol * cost
            converged_new = converged | (accept & f_conv)
            if cfg.dogleg:
                # see solve/multi_frame.py: radius-collapse convergence
                x_norm = jnp.sqrt(pdot(params, w, params, w))
                converged_new = converged_new | (
                    radius_new <= 1e-8 * (x_norm + 1e-8))
            do_move = accept & jnp.logical_not(converged)

            new_carry = (
                jnp.where(do_move, params_new, params),
                jnp.where(do_move, w_new, w),
                jnp.where(converged, radius, radius_new),
                jnp.where(converged, dec_f, dec_new),
                jnp.where(do_move, cost_new, cost),
                converged_new,
                n_acc + do_move.astype(jnp.int32),
                iters + (1 - converged.astype(jnp.int32)),
            )
            return new_carry, new_carry[4]

        init = (params0, w0,
                r0_init.astype(dtype),
                jnp.asarray(2.0, dtype),
                cost_fn(params0, w0),
                jnp.asarray(False),
                jnp.asarray(0, jnp.int32),
                jnp.asarray(0, jnp.int32))
        final, costs = jax.lax.scan(step, init, None, length=cfg.max_iters)
        return final + (costs,)

    in_specs = (P(axis), P(), P(axis), P(axis), P(axis), P())
    out_specs = (P(axis), P(), P(), P(), P(), P(), P(), P(), P())
    spmd = shard_map(lm_spmd, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_vma=False)

    @jax.jit
    def fit(params0, shape0, kp, r0, frame_valid=None):
        f_dim = params0.shape[0]
        assert f_dim % n_dev == 0, (
            f"frame count {f_dim} not divisible by mesh size {n_dev}; "
            "pad with frame_valid=0 rows")
        if frame_valid is None:
            frame_valid = jnp.ones(f_dim, dtype)
        pair_c = jnp.concatenate(
            [frame_valid[:-1] * frame_valid[1:],
             jnp.zeros(1, dtype)]).astype(dtype)
        # dogleg radius scales with the VALID frame count (padding must not
        # perturb the trajectory — see solve/multi_frame.py)
        n_valid = jnp.maximum(jnp.sum(frame_valid), 1.0)
        r0_init = (cfg.dogleg_init_radius * jnp.sqrt(n_valid.astype(dtype))
                   if cfg.dogleg else jnp.asarray(cfg.init_radius, dtype))
        outs = spmd(params0.astype(dtype), shape0.astype(dtype),
                    kp.astype(dtype), r0.astype(dtype), pair_c, r0_init)
        return MultiFrameResult(*outs)

    return fit
