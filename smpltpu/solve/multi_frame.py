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
from smpltpu.energy.jacobian import keypoint_residuals_and_jacobian
from smpltpu.energy.params import frame_param_layout
from smpltpu.energy.temporal import temporal_mask
from smpltpu.solve.lm import _huber_rho, huber_correct_weight
from smpltpu.solve.tridiag import block_tridiag_solve, block_tridiag_solve_cr


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
    # Powell-dogleg trust region (default) instead of ceres-style
    # lambda=1/radius damping: ONE lightly-regularized GN solve + the
    # Cauchy point, interpolated to the trust boundary. Round-2 finding
    # (see solve/lm.py exact_tr): damped steps chronically under-use the
    # radius on cold inits and stall at non-stationary points — the
    # parity-oracle certificate (scipy polish < 1%) only passes with a
    # boundary-reaching step rule. Dogleg needs no lambda search, so the
    # per-iteration cost is the same as damped.
    dogleg: bool = True
    dogleg_init_radius: float = 1.0   # per-frame scale; total = this*sqrt(F)
    # linear solver for the arrowhead GN system. "tridiag" (default)/"cr":
    # exact block elimination — "tridiag" = Thomas scan (~2F sequential
    # batched factorizations), "cr" = cyclic reduction (ceil(log2 F)
    # batched Cholesky levels; densified couplers after level 1).
    # Measured on the 1000-frame bench (TPU v5e-1): cr 673 frames/s vs
    # tridiag 644 — stage-1 (F=100) 122->97 ms, stage-2 (67x F=20 windows)
    # 1430->1390 ms — so bench.py and the CLI's fast path pick "cr"
    # explicitly. It is NOT the library default because its unrolled
    # recursion makes XLA CPU compiles (the f64 test suite) many times
    # slower; both exact modes give identical optima (dense-oracle tests).
    # The small stage-2 delta also shows the round-2 "tridiag is 21 of
    # 24 ms/iter" tunnel profile over-attributed the linear solve.
    # "pcg": Jacobi-preconditioned conjugate gradient — batched matvecs
    # only, fully parallel over frames, but needs ~128 iterations to match
    # the exact step's convergence quality, erasing the advantage — kept
    # as an option and as the building block the sharded solver uses.
    # "pcg_block": the same CG recursion with a BLOCK-diagonal
    # preconditioner — the (P,P) diagonal blocks of the INIT linearization
    # inverted ONCE per fit (batched inv before the LM loop) and applied
    # as one batched matvec per CG step. Distinct from the rejected
    # round-2 block-Jacobi (which factorized per LM iteration and paid
    # setup every step of the way): here the factorization is amortized
    # across the WHOLE solve, which is also the only formulation that
    # stays cheap under vmap (a refresh-every-k lax.cond would lower to
    # select and run the inverse every iteration for every window). The
    # stale-but-close preconditioner only shapes the Krylov space — optima
    # are unchanged (tests/test_multi_frame.py); warm-started window
    # solves stay near their init linearization so staleness is small.
    linear: str = "tridiag"
    cg_iters: int = 64
    cg_unroll: int = 1
    # cg_rtol > 0: the XLA pcg loop becomes a while_loop that ALSO exits
    # when ||r||^2 <= rtol^2 ||r0||^2 (cap stays cg_iters). Late LM
    # iterations have tiny gradients, so their CG converges in a few
    # steps — the fixed-trip loop keeps paying the ~78 us/step dispatch
    # floor for all of them. Truncating earlier is still a Steihaug step
    # (same Krylov space, monotone step norm), unlike warm-starting
    # (rejected, docs/ROADMAP.md). Under vmap the exit lifts to "all
    # windows converged". 0 keeps the fixed-trip fori_loop (supports
    # cg_unroll). Honored by pcg, pcg_kernel (in-kernel while_loop), and
    # the sharded LM's halo-exchange PCG; ignored by tridiag/cr (exact).
    cg_rtol: float = 0.0
    # fused_cost=True: ONE residual evaluation per LM iteration — the
    # candidate's cost comes out of its own normal-equation assembly
    # (||corrected residual||^2 == the Huber cost by construction), and
    # the accepted assembly is carried in the loop state instead of being
    # recomputed next iteration. Trades a wasted assembly on REJECTED
    # steps (rare under dogleg) for dropping the separate cost pass on
    # every step. Same optima (tests/test_fused_cost.py); opt-in.
    fused_cost: bool = False
    # Jacobian assembly. "analytic": closed-form geometric Jacobian
    # (energy/jacobian.py — rigid-subtree cross products + shape prefix
    # recursion, ~2 FK-equivalent passes) with the Huber correction applied
    # as a rank-1 per-block update; "jvp": the round-1 jax.linearize + 86
    # batched JVP pushes. Identical to machine precision
    # (tests/test_jacobian.py pins both the raw Jacobians in f64 and the
    # full-fitter optima).
    jacobian: str = "analytic"


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


def corrected_frame_assembly(p_f, w, kp_f, r0_f, cam, spec, huber_delta,
                             jacobian="analytic", with_cost=False):
    """One frame's normal-equation pieces for the Huber-CORRECTED keypoint
    residuals c = sqrt(rho(s)/s) r — weight inside the linearization so the
    Jacobian carries the loss curvature (solve/lm.py module docstring).
    Returns (J_p^T J_p, J_p^T J_w, J_w^T J_w, J_p^T c, J_w^T c).

    ``jacobian="analytic"``: closed-form geometric Jacobian
    (energy/jacobian.py), corrected per 2-row block by the rank-1 rule
    J_c = hw J + 2 hw'(s) b (b^T J) with hw' traced through the same
    guards autodiff sees. ``"jvp"``: the round-1 linearize + batched JVP
    pushes. Machine-precision identical (tests/test_jacobian.py); shared
    by the single-chip multi-frame solver and both sharded assemblies."""
    p_dim = p_f.shape[-1]
    n_s = w.shape[0]
    if jacobian == "analytic":
        r_raw, jp_raw, jw_raw = keypoint_residuals_and_jacobian(
            p_f, w, kp_f, cam, spec, r0_f)
        blocks = r_raw.reshape(-1, 2)
        s = jnp.sum(blocks * blocks, axis=-1)
        hw = huber_correct_weight(s, huber_delta)
        # d hw / d s by FORWARD mode: reverse-mode grad of the s<=delta^2
        # guard divides by s_safe^2 = 1e-48, which UNDERFLOWS to 0 in f32
        # and yields 0/0 = NaN on masked rows (s=0) — exactly the padded
        # window/anchor rows, whose NaN h_pp would poison the sharded
        # psum. JVP uses u'/v - (u/v)(v'/v) (no v^2), matching what the
        # "jvp" assembly path differentiates; hwp(0) = 0.
        _, hwp = jax.jvp(lambda t: huber_correct_weight(t, huber_delta),
                         (s,), (jnp.ones_like(s),))
        jp_b = jp_raw.reshape(-1, 2, p_dim)
        jw_b = jw_raw.reshape(-1, 2, n_s)
        btj_p = jnp.einsum("kc,kcp->kp", blocks, jp_b)
        btj_w = jnp.einsum("kc,kcs->ks", blocks, jw_b)
        jp = (hw[:, None, None] * jp_b
              + 2.0 * hwp[:, None, None] * blocks[:, :, None]
              * btj_p[:, None, :]).reshape(-1, p_dim)
        jw = (hw[:, None, None] * jw_b
              + 2.0 * hwp[:, None, None] * blocks[:, :, None]
              * btj_w[:, None, :]).reshape(-1, n_s)
        r = (blocks * hw[:, None]).reshape(-1)
        out = (jp.T @ jp, jp.T @ jw, jw.T @ jw, jp.T @ r, jw.T @ r)
        if with_cost:
            # ||c||^2 == rho(s) by construction of the corrected residual
            # (hw = sqrt(rho/s)) — the frame's Huber keypoint cost for
            # free, enabling the fused one-eval-per-iteration loop
            out = out + (jnp.sum(hw * hw * s),)
        return out

    def corrected(q, v):
        r = keypoint_residuals(q, v, kp_f, cam, spec, r0_f)
        blocks = r.reshape(-1, 2)
        s = jnp.sum(blocks * blocks, axis=-1)
        hw = huber_correct_weight(s, huber_delta)
        return (blocks * hw[:, None]).reshape(-1)

    eye_p = jnp.eye(p_dim, dtype=p_f.dtype)
    eye_w = jnp.eye(n_s, dtype=p_f.dtype)
    zer_p = jnp.zeros((n_s, p_dim), dtype=p_f.dtype)
    zer_w = jnp.zeros((p_dim, n_s), dtype=p_f.dtype)
    r, f_jvp = jax.linearize(corrected, p_f, w)
    jp = jax.vmap(f_jvp)(eye_p, zer_w).T                 # (2K, P)
    jw = jax.vmap(f_jvp)(zer_p, eye_w).T                 # (2K, nS)
    out = (jp.T @ jp, jp.T @ jw, jw.T @ jw, jp.T @ r, jw.T @ r)
    if with_cost:
        out = out + (jnp.sum(r * r),)
    return out


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

    def normal_eq(params, w, kp, r0, pair_w, with_cost=False):
        """Assemble gradient and Hessian pieces of the weighted problem.
        with_cost=True additionally returns the total objective at
        (params, w) — term-for-term the same expression as cost_fn, with
        the keypoint part read off the corrected residuals the assembly
        already computed (fused_cost path)."""
        f_dim = params.shape[0]

        def one_frame(p_f, kp_f, r0_f):
            return corrected_frame_assembly(
                p_f, w, kp_f, r0_f, cam, spec, cfg.huber_delta,
                jacobian=cfg.jacobian, with_cost=with_cost)

        pieces = jax.vmap(one_frame)(params, kp, r0)
        h_pp, b_pw, h_ww, g_p, g_w = pieces[:5]
        # (F,P,P), (F,P,nS), (F,nS,nS), (F,P), (F,nS)
        cost = None
        if with_cost:
            c_pose = bp * bp * jnp.sum(params[:, aa_slice] ** 2)
            c_shape = bs * bs * jnp.sum(w * w)
            cdiff = (params[:-1] - params[1:]) * tmask
            c_temp = jnp.sum((lam * pair_w)[:, None] ** 2 * cdiff * cdiff)
            cost = 0.5 * (jnp.sum(pieces[5]) + c_pose + c_shape + c_temp)

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
        asm = (h_pp, off_scale, b_pw, c_ww, g_p, g_w_tot)
        return (asm, cost) if with_cost else asm

    def step(state: MultiFrameState, inp, asm=None, prec=None):
        """One trust-region iteration. When ``asm`` is given (fused_cost
        loop) it is the assembly AT state.params carried from the previous
        iteration; the return gains the assembly to carry next. ``prec``
        (pcg_block) is the fit-level block-inverse preconditioner pair
        ((F,P,P), (nS,nS)) closed over the whole LM loop."""
        kp, r0, pair_w = inp
        params, w = state.params, state.shape
        if asm is None:
            asm = normal_eq(params, w, kp, r0, pair_w)
        h_pp, off_scale, b_pw, c_ww, g_p, g_w = asm

        def arrow_tridiag(d_blocks, c_reg):
            """Exact solve of [T B; B^T C] d = -g: T y = g_p / T Y = B
            (block-tridiag elimination — Thomas scan or cyclic reduction
            per cfg.linear), then the nS x nS Schur."""
            solver = (block_tridiag_solve_cr if cfg.linear == "cr"
                      else block_tridiag_solve)
            rhs = jnp.concatenate([g_p[:, :, None], b_pw], axis=-1)
            sol = solver(d_blocks, off_scale, tmask, rhs)
            y = sol[:, :, 0]          # (F, P)   T^{-1} g_p
            cap_y = sol[:, :, 1:]     # (F, P, nS) T^{-1} B
            schur = c_reg - jnp.einsum("fps,fpt->st", b_pw, cap_y)
            rhs_w = -g_w + jnp.einsum("fps,fp->s", b_pw, y)
            dw = jnp.linalg.solve(schur, rhs_w)
            dp = -y - jnp.einsum("fps,s->fp", cap_y, dw)
            return dp, dw

        def arrow_pcg(d_blocks, c_reg):
            """Jacobi-preconditioned CG on the same SPD system — batched
            matvecs only, no sequential factorizations (cfg.linear)."""
            def matvec(v_p, v_w):
                u = jnp.einsum("fab,fb->fa", d_blocks, v_p)
                u = u.at[:-1].add(off_scale[:, None] * tmask * v_p[1:])
                u = u.at[1:].add(off_scale[:, None] * tmask * v_p[:-1])
                u = u + jnp.einsum("fps,s->fp", b_pw, v_w)
                u_w = jnp.einsum("fps,fp->s", b_pw, v_p) + c_reg @ v_w
                return u, u_w

            if prec is not None:
                pinv_pp, pinv_w = prec

                def prec_fn(r_p, r_w):
                    return (jnp.einsum("fab,fb->fa", pinv_pp, r_p),
                            pinv_w @ r_w)
            else:
                dinv = 1.0 / jnp.maximum(
                    jnp.diagonal(d_blocks, axis1=1, axis2=2), 1e-20)
                cinv = 1.0 / jnp.maximum(jnp.diagonal(c_reg), 1e-20)

                def prec_fn(r_p, r_w):
                    return dinv * r_p, cinv * r_w

            x_p = jnp.zeros_like(g_p)
            x_w = jnp.zeros_like(g_w)
            r_p, r_w = -g_p, -g_w
            z_p, z_w = prec_fn(r_p, r_w)
            rho = jnp.sum(r_p * z_p) + r_w @ z_w

            def body(_, c):
                x_p, x_w, r_p, r_w, d_p, d_w, rho = c
                q_p, q_w = matvec(d_p, d_w)
                alpha = rho / jnp.maximum(
                    jnp.sum(d_p * q_p) + d_w @ q_w, 1e-30)
                x_p = x_p + alpha * d_p
                x_w = x_w + alpha * d_w
                r_p = r_p - alpha * q_p
                r_w = r_w - alpha * q_w
                z_p, z_w = prec_fn(r_p, r_w)
                rho_n = jnp.sum(r_p * z_p) + r_w @ z_w
                beta = rho_n / jnp.maximum(rho, 1e-30)
                return (x_p, x_w, r_p, r_w, z_p + beta * d_p,
                        z_w + beta * d_w, rho_n)

            # the loop is latency/overhead-bound at ~78 us/step (ROADMAP
            # bf16 experiment), so unrolling trades code size for trip
            # overhead; cg_unroll=1 keeps the round-2 shipping behavior
            if cfg.cg_rtol > 0.0:
                # tolerance exit (see MultiFrameConfig.cg_rtol): identical
                # recursion, loop ends early once the UNpreconditioned
                # residual drops below rtol^2 * ||r0||^2
                rr0 = jnp.sum(r_p * r_p) + r_w @ r_w
                tol2 = (cfg.cg_rtol * cfg.cg_rtol) * rr0

                def cond_cg(c):
                    it = c[0]
                    rr = jnp.sum(c[3] * c[3]) + c[4] @ c[4]
                    return (it < cfg.cg_iters) & (rr > tol2)

                def body_cg(c):
                    return (c[0] + 1,) + body(None, c[1:])

                c = jax.lax.while_loop(
                    cond_cg, body_cg,
                    (jnp.asarray(0, jnp.int32),
                     x_p, x_w, r_p, r_w, z_p, z_w, rho))
                return c[1], c[2]
            c = jax.lax.fori_loop(0, cfg.cg_iters, body,
                                  (x_p, x_w, r_p, r_w, z_p, z_w, rho),
                                  unroll=cfg.cg_unroll)
            return c[0], c[1]

        def arrow_pcg_kernel(d_blocks, c_reg):
            """Same Jacobi-PCG recursion, but ALL cg_iters iterations run
            inside one Pallas program with the window system VMEM-resident
            (ops/cg.py) — removes the ~78 us/iteration scheduling overhead
            of the fori_loop formulation. f32 on-kernel (matches the TPU
            production dtype); interpret mode off-TPU."""
            from smpltpu.ops.cg import arrow_pcg_pallas
            return arrow_pcg_pallas(
                d_blocks, off_scale, tmask, b_pw, c_reg, g_p, g_w,
                iters=cfg.cg_iters, rtol=cfg.cg_rtol,
                interpret=jax.default_backend() == "cpu")

        lin = cfg.linear
        if lin not in ("tridiag", "cr", "pcg", "pcg_block", "pcg_kernel"):
            raise ValueError(f"unknown linear solver {cfg.linear!r} "
                             "(tridiag | cr | pcg | pcg_block | pcg_kernel)")
        if lin == "pcg_kernel" and params.shape[0] > 96:
            # VMEM guard: the kernel holds the whole (F, 128, 128) system
            # on-chip (~65 KB/frame for D alone); past ~96 frames it would
            # exceed the ~16 MB/core VMEM at compile time. Long single-
            # window solves (e.g. stage-1 over all anchors) fall back to
            # the XLA pcg loop; the kernel targets the window-sized
            # systems it was built for.
            lin = "pcg"
        arrow_solve = {"pcg": arrow_pcg,
                       "pcg_block": arrow_pcg,
                       "pcg_kernel": arrow_pcg_kernel,
                       "tridiag": arrow_tridiag,
                       "cr": arrow_tridiag}[lin]

        def hmul(v_p, v_w):
            """Undamped Hessian application (blockwise)."""
            u = jnp.einsum("fab,fb->fa", h_pp, v_p)
            u = u.at[:-1].add(off_scale[:, None] * tmask * v_p[1:])
            u = u.at[1:].add(off_scale[:, None] * tmask * v_p[:-1])
            u = u + jnp.einsum("fps,s->fp", b_pw, v_w)
            u_w = jnp.einsum("fps,fp->s", b_pw, v_p) + c_ww @ v_w
            return u, u_w

        diag_p = jnp.clip(jnp.diagonal(h_pp, axis1=1, axis2=2),
                          cfg.diag_min, cfg.diag_max)
        diag_w = jnp.clip(jnp.diagonal(c_ww), cfg.diag_min, cfg.diag_max)

        if cfg.dogleg:
            # Gauss-Newton point (lightly regularized) + Cauchy point,
            # dogleg-interpolated to the trust boundary
            d_blocks = h_pp + jax.vmap(jnp.diag)(1e-9 * diag_p + cfg.diag_eps)
            c_reg = c_ww + jnp.diag(1e-9 * diag_w + cfg.diag_eps)
            dp_gn, dw_gn = arrow_solve(d_blocks, c_reg)
            n_gn = jnp.sqrt(jnp.sum(dp_gn * dp_gn) + dw_gn @ dw_gn)

            hg_p, hg_w = hmul(g_p, g_w)
            gg = jnp.sum(g_p * g_p) + g_w @ g_w
            ghg = jnp.maximum(jnp.sum(g_p * hg_p) + g_w @ hg_w, 1e-30)
            alpha = gg / ghg
            sd_p, sd_w = -alpha * g_p, -alpha * g_w
            n_sd = jnp.sqrt(alpha * alpha * gg)

            radius = state.radius
            # case C tau: ||sd + tau (gn - sd)||^2 = radius^2
            df_p, df_w = dp_gn - sd_p, dw_gn - sd_w
            a = jnp.maximum(jnp.sum(df_p * df_p) + df_w @ df_w, 1e-30)
            b = 2.0 * (jnp.sum(sd_p * df_p) + sd_w @ df_w)
            c = (n_sd * n_sd) - radius * radius
            disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
            tau = jnp.clip((-b + jnp.sqrt(disc)) / (2.0 * a), 0.0, 1.0)

            use_gn = n_gn <= radius
            use_sd = jnp.logical_not(use_gn) & (n_sd >= radius)
            sd_scale = radius / jnp.maximum(n_sd, 1e-30)

            def pick(gn, sd, df):
                return jnp.where(use_gn, gn,
                                 jnp.where(use_sd, sd_scale * sd,
                                           sd + tau * df))
            dp = pick(dp_gn, sd_p, df_p)
            dw = pick(dw_gn, sd_w, df_w)
            boundary = jnp.logical_not(use_gn)
        else:
            # ceres-style LM damping on every diagonal
            d_blocks = h_pp + jax.vmap(jnp.diag)(
                diag_p / state.radius + cfg.diag_eps)
            c_reg = c_ww + jnp.diag(diag_w / state.radius + cfg.diag_eps)
            dp, dw = arrow_solve(d_blocks, c_reg)
            boundary = jnp.asarray(True)

        params_new = params + dp
        if cfg.freeze_scale:
            params_new = params_new.at[:, 0].set(params[:, 0])
        else:  # backstop clamp (see module docstring)
            params_new = params_new.at[:, 0].set(
                jnp.clip(params_new[:, 0], SCALE_MIN, SCALE_MAX))
        dp = params_new - params  # actual step after projection
        w_new = w + dw
        if cfg.fused_cost:
            asm_new, cost_new = normal_eq(params_new, w_new, kp, r0,
                                          pair_w, with_cost=True)
        else:
            cost_new = cost_fn(params_new, w_new, kp, r0, pair_w)

        # model decrease from the undamped quadratic
        hd, hd_w = hmul(dp, dw)
        gd = jnp.sum(g_p * dp) + g_w @ dw
        dhd = jnp.sum(hd * dp) + hd_w @ dw
        model_decrease = -gd - 0.5 * dhd
        rho = (state.cost - cost_new) / jnp.maximum(model_decrease, 1e-30)
        valid = jnp.isfinite(cost_new) & (model_decrease > 0)

        if cfg.dogleg:
            accept = valid & (state.cost - cost_new > 0)
            step_norm = jnp.sqrt(jnp.sum(dp * dp) + dw @ dw)
            radius = jnp.where(
                rho < 0.25, 0.25 * step_norm,
                jnp.where((rho > 0.75) & boundary, 2.0 * state.radius,
                          state.radius))
            radius = jnp.clip(radius, 1e-12, 1e10)
            decrease_factor = state.decrease_factor
        else:
            accept = valid & (rho > cfg.min_rel_decrease)
            grow = state.radius / jnp.maximum(
                1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
            shrink = state.radius / state.decrease_factor
            radius = jnp.clip(jnp.where(accept, grow, shrink), 1e-32, 1e16)
            decrease_factor = jnp.where(accept, 2.0,
                                        state.decrease_factor * 2.0)

        f_conv = jnp.abs(state.cost - cost_new) <= cfg.ftol * state.cost
        converged = state.converged | (accept & f_conv)
        if cfg.dogleg:
            # accept-any-decrease rejects every trial AT an optimum — also
            # converge when the radius collapses to parameter tolerance
            x_norm = jnp.sqrt(jnp.sum(params * params) + w @ w)
            converged = converged | (radius <= 1e-8 * (x_norm + 1e-8))
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
        if cfg.fused_cost:
            asm_keep = jax.tree_util.tree_map(
                lambda a, b: jnp.where(do_move, b, a), asm, asm_new)
            return new_state, asm_keep, new_state.cost
        return new_state, new_state.cost

    def fit(params0, shape0, kp, r0, frame_valid=None):
        f_dim = params0.shape[0]
        if frame_valid is None:
            frame_valid = jnp.ones(f_dim, dtype)
        pair_w = frame_valid[:-1] * frame_valid[1:]
        # dogleg radius scales with the VALID frame count so padded and
        # unpadded solves of the same real frames follow identical
        # trajectories (tests/test_multi_frame.py::test_padding_equivalence)
        n_valid = jnp.maximum(jnp.sum(frame_valid), 1.0)
        r0_init = (cfg.dogleg_init_radius * jnp.sqrt(n_valid.astype(dtype))
                   if cfg.dogleg else jnp.asarray(cfg.init_radius, dtype))
        if cfg.fused_cost:
            asm0, cost0 = normal_eq(params0.astype(dtype),
                                    shape0.astype(dtype), kp, r0, pair_w,
                                    with_cost=True)
        else:
            asm0 = None
            cost0 = cost_fn(params0.astype(dtype), shape0.astype(dtype),
                            kp, r0, pair_w)
        prec = None
        if cfg.linear == "pcg_block":
            # fit-level block preconditioner: invert the (P,P) diagonal
            # blocks of the INIT linearization once (batched), reuse for
            # every CG solve of the LM loop (MultiFrameConfig.linear doc)
            asm_p = asm0 if asm0 is not None else normal_eq(
                params0.astype(dtype), shape0.astype(dtype), kp, r0, pair_w)
            h_pp0, _, _, c_ww0, _, _ = asm_p
            dg_p0 = jnp.clip(jnp.diagonal(h_pp0, axis1=1, axis2=2),
                             cfg.diag_min, cfg.diag_max)
            dg_w0 = jnp.clip(jnp.diagonal(c_ww0), cfg.diag_min, cfg.diag_max)
            prec = (jnp.linalg.inv(
                        h_pp0 + jax.vmap(jnp.diag)(
                            1e-9 * dg_p0 + cfg.diag_eps)),
                    jnp.linalg.inv(
                        c_ww0 + jnp.diag(1e-9 * dg_w0 + cfg.diag_eps)))
        init = MultiFrameState(
            params=params0.astype(dtype),
            shape=shape0.astype(dtype),
            radius=r0_init.astype(dtype),
            decrease_factor=jnp.asarray(2.0, dtype),
            cost=cost0,
            converged=jnp.asarray(False),
            n_accepted=jnp.asarray(0, jnp.int32),
            iters_run=jnp.asarray(0, jnp.int32),
        )
        # while_loop with a convergence exit: Ceres terminates the moment
        # its tolerances fire (ceres::Solve honors function_tolerance
        # mid-run) — a fixed-length scan keeps paying full per-iteration
        # cost after convergence. Under vmap the condition lifts to "any
        # instance still unconverged", so a window batch runs until its
        # slowest member finishes, never past max_iters. cost_history is
        # carried as a preallocated buffer (post-exit slots hold the final
        # cost so downstream loss curves stay monotone-flat).
        hist0 = jnp.full((cfg.max_iters,), init.cost, dtype)

        if cfg.fused_cost:
            def cond_f(carry):
                st, _, it, _ = carry
                return (it < cfg.max_iters) & jnp.logical_not(st.converged)

            def body_f(carry):
                st, asm, it, hist = carry
                st2, asm2, c = step(st, (kp, r0, pair_w), asm=asm, prec=prec)
                hist = jnp.where(jnp.arange(cfg.max_iters) >= it, c, hist)
                return st2, asm2, it + 1, hist

            final, _, _, costs = jax.lax.while_loop(
                cond_f, body_f, (init, asm0, jnp.asarray(0, jnp.int32), hist0))
            return MultiFrameResult(*final, cost_history=costs)

        def cond(carry):
            st, it, _ = carry
            return (it < cfg.max_iters) & jnp.logical_not(st.converged)

        def body(carry):
            st, it, hist = carry
            st2, c = step(st, (kp, r0, pair_w), prec=prec)
            hist = jnp.where(jnp.arange(cfg.max_iters) >= it, c, hist)
            return st2, it + 1, hist

        final, _, costs = jax.lax.while_loop(
            cond, body, (init, jnp.asarray(0, jnp.int32), hist0))
        return MultiFrameResult(*final, cost_history=costs)

    return jax.jit(fit)


def build_chunked_window_fit(fitter, chunk_size: int):
    """Batch many independent window solves in chunks of ``chunk_size``.

    ``jax.vmap`` lifts the convergence-exit while_loop's condition to "any
    window in the batch still unconverged", so the whole batch runs until
    its SLOWEST member finishes. The tail grows with batch width: on the
    10k-frame bench workload the slowest of 667 windows needs ~1.9x the
    iterations of the slowest of 67 (8.2 -> 15.5 ms/window, 1618 -> 945
    frames/s). A ``lax.map`` over fixed-size chunks gives every chunk its
    own while_loop exit, so total work is the SUM of per-chunk iteration
    maxima instead of the global maximum paid across the full width.

    Per-window results are identical to the single vmapped batch: a
    converged window freezes (``step``'s do_move / radius masks), so its
    trajectory never depends on how many extra iterations its batch ran.
    Pinned by tests/test_multi_frame.py::test_chunked_window_fit_matches_vmap.

    CAVEAT — ``cfg.cg_rtol > 0`` breaks that invariant: the PCG tolerance
    exit is a while_loop whose condition vmap lifts to "any window above
    tolerance", so the CG trip count (and therefore each window's
    truncated step) depends on the batch WIDTH. Unlike the LM loop there
    is no per-window freeze inside CG — chunked and unchunked solves then
    follow genuinely different trajectories. Use chunking with the
    fixed-trip CG (cg_rtol=0, the default) when reproducibility across
    batch layouts matters; the multi CLI warns on the combination. (In
    f32 a truncated fixed-trip PCG is still reduction-order sensitive to
    the batch layout — bit-identity holds in f64, trajectories stay in
    the same basin in f32.)

    The batch is padded to a chunk multiple by replicating the last
    window (well-conditioned by construction); padded outputs are
    stripped. All five per-window arguments are required (pass an
    all-ones frame_valid if every frame is real).
    """
    from smpltpu.utils.chunked import chunked_map

    vfit = jax.vmap(lambda a, b, c, d, e: fitter(a, b, c, d, e))

    return jax.jit(lambda params0, shape0, kp, r0, frame_valid: chunked_map(
        vfit, chunk_size, params0, shape0, kp, r0, frame_valid))


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
