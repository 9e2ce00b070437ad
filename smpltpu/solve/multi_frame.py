"""Multi-frame bundle adjustment: shared shape + per-frame pose + temporal
smoothness.

Replaces ``OptimizeMultiFrame`` (include/MultiFrameBA.h:33-177). The
reference builds one Ceres problem with F*(76) pose dofs + one shared
10-dof shape block and solves it with DENSE_QR on 8 CPU threads. The
TPU-native design exploits the problem structure instead:

  * keypoint residuals/Jacobians for ALL frames are assembled by one
    vmapped jacfwd (dense masked tensors, static shapes);
  * the pose-pose Hessian is block-tridiagonal (temporal terms couple only
    consecutive frames) -> O(F) block-Cholesky elimination
    (solve/tridiag.py) instead of O((F*P)^3) dense QR;
  * the shared shape block is eliminated by a 10x10 Schur complement whose
    per-frame contributions sum across frames — on a device mesh this sum
    is a psum over the frame shards (smpltpu/parallel);
  * the whole LM loop runs inside one jit (lax.scan), one device dispatch
    per solve; solves for many sliding windows vmap into one batch.

Reference semantics reproduced (MultiFrameBA.h):
  * per-frame pose prior is ALWAYS plain L2 — the GMM is explicitly not
    used here (nullptr at :109);
  * ONE shape block shared by every frame's reprojection (:67-68,95-100),
    shape prior L2 with betaShape (:115-118) — the stage-2 "shape lock"
    is just betaShape=1e5 (src/main_multi_frame.cpp:163,183);
  * temporal first-order smoothness with weight lambdaTemp on rootT,
    rootAA and every non-root jointAA — NOT on scale (:121-142);
  * NO frozen joints in this path (unlike the single-frame solver — the
    reference differs the same way);
  * per-frame fixed root orientation R0 = that frame's avatar r[0] (:87).

Documented deviation (gauge fix): the reprojection energy has an exact
per-frame gauge freedom — scale the skeleton AND the translation by any
alpha, identical pixels — and the temporal smoothness term on rootT
actively REWARDS sliding down it (smaller translations = smaller temporal
residuals), so the true optimum of the reference's unbounded multi-frame
objective collapses scale toward 0. The reference never notices because
(a) it discards the multi-path scale entirely after the solve and (b)
Ceres crawls the flat direction slowly; a converged batched LM does
notice. We therefore FREEZE scale at its init in this path by default
(freeze_scale=True) — the frozen dof is exactly the gauge direction, so
the fitted pose is gauge-equivalent with the evaluation convention's
scale=1, and every observable output matches the reference's intent.
Set freeze_scale=False for strict reference behavior (scale then also
gets clamped to the single-frame solver's [0.3, 3] as a backstop,
Sim3BA.h:613-614).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from smpltpu.constants import HUBER_DELTA, SCALE_MAX, SCALE_MIN
from smpltpu.energy import Camera, SkeletonSpec, keypoint_residuals
from smpltpu.energy.params import frame_param_layout
from smpltpu.energy.temporal import temporal_mask
from smpltpu.solve.lm import _huber_rho
from smpltpu.solve.tridiag import block_tridiag_solve


class MultiFrameConfig(NamedTuple):
    beta_pose: float
    beta_shape: float
    lambda_temporal: float
    max_iters: int
    freeze_scale: bool = True   # gauge fix, see module docstring
    huber_delta: float = HUBER_DELTA
    init_radius: float = 1e4
    min_rel_decrease: float = 1e-3
    ftol: float = 1e-6
    diag_min: float = 1e-6
    diag_max: float = 1e32
    diag_eps: float = 1e-8   # tiny Tikhonov so empty-frame scale dims stay SPD


class MultiFrameState(NamedTuple):
    params: jnp.ndarray     # (F, P)
    shape: jnp.ndarray      # (nS,)
    radius: jnp.ndarray
    decrease_factor: jnp.ndarray
    cost: jnp.ndarray
    converged: jnp.ndarray
    n_accepted: jnp.ndarray
    iters_run: jnp.ndarray


class MultiFrameResult(NamedTuple):
    """MultiFrameState plus the per-iteration cost trace (loss-curve sink,
    see LMResult)."""

    params: jnp.ndarray
    shape: jnp.ndarray
    radius: jnp.ndarray
    decrease_factor: jnp.ndarray
    cost: jnp.ndarray
    converged: jnp.ndarray
    n_accepted: jnp.ndarray
    iters_run: jnp.ndarray
    cost_history: jnp.ndarray  # (max_iters,)


def _pose_prior_sel(n_joints: int, dtype) -> jnp.ndarray:
    """(P,) selector of the joint-angle dims (the L2 pose prior acts there)."""
    lay = frame_param_layout(n_joints)
    sel = np.zeros(lay["total"])
    sel[lay["joint_aa"][0]:lay["joint_aa"][1]] = 1.0
    return jnp.asarray(sel, dtype)


def build_multi_fitter(
    spec: SkeletonSpec,
    cam: Camera,
    cfg: MultiFrameConfig,
    n_shapes: int,
    dtype=jnp.float32,
):
    """Return a jitted fn(params0 (F,P), shape0 (nS,), kp (F,K,4),
    r0 (F,3,3), frame_valid (F,)) -> MultiFrameState.

    frame_valid masks padding frames (batched sliding windows of unequal
    length): their keypoints must already be masked; here it additionally
    cuts the temporal coupling across the padding boundary.
    """
    n_joints = len(spec.parents)
    lay = frame_param_layout(n_joints)
    p_dim = lay["total"]
    bp = jnp.asarray(cfg.beta_pose, dtype)
    bs = jnp.asarray(cfg.beta_shape, dtype)
    lam = jnp.asarray(cfg.lambda_temporal, dtype)
    tmask = temporal_mask(n_joints, dtype)           # (P,)
    psel = _pose_prior_sel(n_joints, dtype)          # (P,)
    aa_slice = slice(lay["joint_aa"][0], lay["joint_aa"][1])

    def kp_res(p_f, w, kp_f, r0_f):
        return keypoint_residuals(p_f, w, kp_f, cam, spec, r0_f)

    def cost_fn(params, w, kp, r0, pair_w):
        r = jax.vmap(kp_res, in_axes=(0, None, 0, 0))(params, w, kp, r0)
        s = jnp.sum(r.reshape(params.shape[0], -1, 2) ** 2, axis=-1)
        c_kp = jnp.sum(_huber_rho(s, cfg.huber_delta))
        c_pose = bp * bp * jnp.sum(params[:, aa_slice] ** 2)
        c_shape = bs * bs * jnp.sum(w * w)
        diff = (params[:-1] - params[1:]) * tmask
        c_temp = jnp.sum((lam * pair_w)[:, None] ** 2 * diff * diff)
        return 0.5 * (c_kp + c_pose + c_shape + c_temp)

    def normal_eq(params, w, kp, r0, pair_w):
        """Assemble gradient and Hessian pieces of the weighted problem."""
        f_dim = params.shape[0]

        n_s = w.shape[0]
        p_dim_l = params.shape[-1]
        eye_p = jnp.eye(p_dim_l, dtype=params.dtype)
        eye_w = jnp.eye(n_s, dtype=params.dtype)
        zer_p = jnp.zeros((n_s, p_dim_l), dtype=params.dtype)
        zer_w = jnp.zeros((p_dim_l, n_s), dtype=params.dtype)

        def one_frame(p_f, kp_f, r0_f):
            # one linearize, then both Jacobians via batched JVP pushes —
            # a single FK trace instead of three (value + two jacfwds)
            r, f_jvp = jax.linearize(
                lambda q, v: kp_res(q, v, kp_f, r0_f), p_f, w)
            jp = jax.vmap(f_jvp)(eye_p, zer_w).T                 # (2K, P)
            jw = jax.vmap(f_jvp)(zer_p, eye_w).T                 # (2K, nS)
            blocks = r.reshape(-1, 2)
            s = jnp.sum(blocks * blocks, axis=-1)
            irls = jnp.sqrt(jnp.minimum(1.0, cfg.huber_delta /
                                        jnp.sqrt(jnp.maximum(s, 1e-24))))
            row_w = jnp.repeat(irls, 2)
            r = r * row_w
            jp = jp * row_w[:, None]
            jw = jw * row_w[:, None]
            return (jp.T @ jp, jp.T @ jw, jw.T @ jw,
                    jp.T @ r, jw.T @ r)

        h_pp, b_pw, h_ww, g_p, g_w = jax.vmap(one_frame)(params, kp, r0)
        # (F,P,P), (F,P,nS), (F,nS,nS), (F,P), (F,nS)

        # pose prior (linear): H += bp^2 diag(psel); g += bp^2 * sel*params
        h_pp = h_pp + (bp * bp) * jnp.diag(psel)[None]
        g_p = g_p + (bp * bp) * psel[None, :] * params

        # temporal (linear): stencil on the block-tridiagonal
        lam_pair = (lam * pair_w) ** 2                       # (F-1,)
        deg = jnp.zeros(f_dim, dtype).at[:-1].add(lam_pair).at[1:].add(lam_pair)
        h_pp = h_pp + deg[:, None, None] * jnp.diag(tmask * tmask)[None]
        off_scale = -lam_pair                                # E_f = off*diag(m^2)
        diff = (params[:-1] - params[1:]) * (tmask * tmask)
        g_p = g_p.at[:-1].add(lam_pair[:, None] * diff)
        g_p = g_p.at[1:].add(-lam_pair[:, None] * diff)

        # shape prior
        c_ww = jnp.sum(h_ww, axis=0) + (bs * bs) * jnp.eye(w.shape[0], dtype=dtype)
        g_w_tot = jnp.sum(g_w, axis=0) + (bs * bs) * w

        if cfg.freeze_scale:
            m = jnp.ones(p_dim, dtype).at[0].set(0.0)
            h_pp = (h_pp * m[None, :, None] * m[None, None, :]
                    + jnp.diag(1.0 - m)[None])
            b_pw = b_pw * m[None, :, None]
            g_p = g_p * m[None, :]
        return h_pp, off_scale, b_pw, c_ww, g_p, g_w_tot

    def step(state: MultiFrameState, inp):
        kp, r0, pair_w = inp
        params, w = state.params, state.shape
        h_pp, off_scale, b_pw, c_ww, g_p, g_w = normal_eq(params, w, kp, r0, pair_w)

        # LM damping on every diagonal
        damp_p = jnp.clip(jnp.diagonal(h_pp, axis1=1, axis2=2),
                          cfg.diag_min, cfg.diag_max) / state.radius
        d_blocks = h_pp + jax.vmap(jnp.diag)(damp_p + cfg.diag_eps)
        damp_w = jnp.clip(jnp.diagonal(c_ww), cfg.diag_min, cfg.diag_max) / state.radius
        c_damped = c_ww + jnp.diag(damp_w + cfg.diag_eps)

        # arrowhead solve: T y = g_p, T Y = B  (tridiag), then 10x10 Schur
        rhs = jnp.concatenate([g_p[:, :, None], b_pw], axis=-1)  # (F,P,1+nS)
        sol = block_tridiag_solve(d_blocks, off_scale, tmask, rhs)
        y = sol[:, :, 0]          # (F, P)   T^{-1} g_p
        cap_y = sol[:, :, 1:]     # (F, P, nS) T^{-1} B
        schur = c_damped - jnp.einsum("fps,fpt->st", b_pw, cap_y)
        rhs_w = -g_w + jnp.einsum("fps,fp->s", b_pw, y)
        dw = jnp.linalg.solve(schur, rhs_w)
        dp = -y - jnp.einsum("fps,s->fp", cap_y, dw)

        params_new = params + dp
        if cfg.freeze_scale:
            params_new = params_new.at[:, 0].set(params[:, 0])
        else:  # backstop clamp (see module docstring)
            params_new = params_new.at[:, 0].set(
                jnp.clip(params_new[:, 0], SCALE_MIN, SCALE_MAX))
        dp = params_new - params  # actual step after projection
        w_new = w + dw
        cost_new = cost_fn(params_new, w_new, kp, r0, pair_w)

        # model decrease from the undamped quadratic:
        # -g.d - 0.5 d^T H d, with H d assembled blockwise
        hd = jnp.einsum("fab,fb->fa", h_pp, dp)
        hd = hd.at[:-1].add(off_scale[:, None] * tmask * dp[1:])
        hd = hd.at[1:].add(off_scale[:, None] * tmask * dp[:-1])
        hd = hd + jnp.einsum("fps,s->fp", b_pw, dw)
        hd_w = jnp.einsum("fps,fp->s", b_pw, dp) + c_ww @ dw
        gd = jnp.sum(g_p * dp) + g_w @ dw
        dhd = jnp.sum(hd * dp) + hd_w @ dw
        model_decrease = -gd - 0.5 * dhd
        rho = (state.cost - cost_new) / jnp.maximum(model_decrease, 1e-30)
        valid = jnp.isfinite(cost_new) & (model_decrease > 0)
        accept = valid & (rho > cfg.min_rel_decrease)

        grow = state.radius / jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        shrink = state.radius / state.decrease_factor
        radius = jnp.clip(jnp.where(accept, grow, shrink), 1e-32, 1e16)
        decrease_factor = jnp.where(accept, 2.0, state.decrease_factor * 2.0)

        f_conv = jnp.abs(state.cost - cost_new) <= cfg.ftol * state.cost
        converged = state.converged | (accept & f_conv)
        do_move = accept & jnp.logical_not(state.converged)

        new_state = MultiFrameState(
            params=jnp.where(do_move, params_new, params),
            shape=jnp.where(do_move, w_new, w),
            radius=jnp.where(state.converged, state.radius, radius),
            decrease_factor=jnp.where(state.converged, state.decrease_factor,
                                      decrease_factor),
            cost=jnp.where(do_move, cost_new, state.cost),
            converged=converged,
            n_accepted=state.n_accepted + do_move.astype(jnp.int32),
            iters_run=state.iters_run + (1 - state.converged.astype(jnp.int32)),
        )
        return new_state, new_state.cost

    def fit(params0, shape0, kp, r0, frame_valid=None):
        f_dim = params0.shape[0]
        if frame_valid is None:
            frame_valid = jnp.ones(f_dim, dtype)
        pair_w = frame_valid[:-1] * frame_valid[1:]
        init = MultiFrameState(
            params=params0.astype(dtype),
            shape=shape0.astype(dtype),
            radius=jnp.asarray(cfg.init_radius, dtype),
            decrease_factor=jnp.asarray(2.0, dtype),
            cost=cost_fn(params0.astype(dtype), shape0.astype(dtype), kp, r0, pair_w),
            converged=jnp.asarray(False),
            n_accepted=jnp.asarray(0, jnp.int32),
            iters_run=jnp.asarray(0, jnp.int32),
        )
        final, costs = jax.lax.scan(
            lambda s, _: step(s, (kp, r0, pair_w)), init, None,
            length=cfg.max_iters)
        return MultiFrameResult(*final, cost_history=costs)

    return jax.jit(fit)


_multi_cache: dict = {}


def fit_multi_frame(
    spec: SkeletonSpec,
    cam: Camera,
    cfg: MultiFrameConfig,
    params0: jnp.ndarray,
    shape0: jnp.ndarray,
    kp: jnp.ndarray,
    r0: jnp.ndarray,
    frame_valid: Optional[jnp.ndarray] = None,
) -> MultiFrameState:
    """Convenience wrapper with a per-(problem, config) compile cache."""
    key = (id(spec), id(cam), cfg, int(params0.shape[0]),
           jnp.dtype(params0.dtype).name, int(shape0.shape[0]))
    if key not in _multi_cache:
        # pin (spec, cam) in the value: id() keys are only unique while the
        # objects are alive — a recycled id must not hit a stale fitter
        _multi_cache[key] = ((spec, cam), build_multi_fitter(
            spec, cam, cfg, int(shape0.shape[0]), dtype=params0.dtype))
    return _multi_cache[key][1](params0, shape0, kp, r0, frame_valid)
