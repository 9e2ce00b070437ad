"""Single-frame pose / pose+shape fitting.

Replaces ``OptimizePoseReprojection`` (include/Sim3BA.h:515-683) and
``OptimizePoseShapeReprojection`` (include/Sim3BA.h:348-511). Where the
reference builds one Ceres problem per frame and solves frames serially
(src/main_single_frame.cpp:192-246), this module fits EVERY frame of a
video at once: the per-frame LM solves are independent, so they vmap into
one batched on-device program.

Problem layout per frame (opt_shape=True appends the shape block):
    x = [ frame params (76) | shape w (nS, optional) ]

Reference semantics reproduced:
  * Huber(3.0) on keypoint blocks only; priors unwrapped (Sim3BA.h:446,462).
  * scale bounds [0.3, 3.0] (Sim3BA.h:450-451,613-614).
  * pose-only path hard-freezes joints 10/11/22/23 (Sim3BA.h:607-611);
    the pose+shape path does NOT (they differ in the reference too).
  * GMM prior only when requested (--use-gmm); else L2 on angle-axes.
  * pose-only path with betaShape>0 adds a shape prior but no
    shape-dependent reprojection (Sim3BA.h:628-638) — the shape stays at
    its initial zero, so we simply omit the block there (same optimum).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from smpltpu.constants import (
    FIXED_JOINTS_POSE_ONLY,
    HUBER_DELTA,
    SCALE_MAX,
    SCALE_MIN,
)
from smpltpu.energy import (
    Camera,
    GMMPrior,
    SkeletonSpec,
    gmm_pose_prior_residual,
    keypoint_residuals,
    l2_pose_prior_residual,
    shape_prior_residual,
)
from smpltpu.energy.params import frame_param_layout
from smpltpu.models.smpl import SMPLModel
from smpltpu.solve.lm import LMConfig, LMState, lm_solve


class SingleFrameProblem(NamedTuple):
    spec: SkeletonSpec
    cam: Camera
    gmm: Optional[GMMPrior]
    beta_pose: float
    beta_shape: float
    opt_shape: bool
    n_joints: int
    n_shapes: int
    # framework extension (NOT reference behavior, which optimizes scale
    # freely, Sim3BA.h:612-614): hold scale at its init. The reference's
    # OWN evaluation and render write-back DISCARD the fitted scale
    # (Utils.h:102-116 projects avatar.jointPos, which has no scale), so
    # free-scale optima degrade log.csv/renders on both sides; fixing the
    # gauge at scale=1 keeps the solve consistent with those consumers.
    freeze_scale: bool = False


def make_single_frame_problem(
    model: SMPLModel,
    r0,
    cam: Camera,
    beta_pose: float = 0.0,
    beta_shape: float = 0.0,
    opt_shape: bool = False,
    gmm_dict: Optional[dict] = None,
    freeze_scale: bool = False,
    dtype=jnp.float32,
) -> SingleFrameProblem:
    from smpltpu.energy import make_skeleton_spec

    spec = make_skeleton_spec(model, r0, with_shape=opt_shape and beta_shape > 0.0)
    gmm = None
    if gmm_dict is not None and beta_pose > 0.0:
        gmm = GMMPrior.from_dict(gmm_dict, beta=beta_pose, dtype=dtype)
    return SingleFrameProblem(
        spec=spec, cam=cam, gmm=gmm,
        beta_pose=float(beta_pose), beta_shape=float(beta_shape),
        opt_shape=bool(opt_shape),
        n_joints=len(spec.parents), n_shapes=model.num_shapes,
        freeze_scale=bool(freeze_scale),
    )


def _split_x(x, prob: SingleFrameProblem):
    lay = frame_param_layout(prob.n_joints)
    p = lay["total"]
    params = x[:p]
    shape = x[p:] if prob.opt_shape else jnp.zeros(prob.n_shapes, x.dtype)
    return params, shape, lay


def _residual_fn(x, kp_dense, prob: SingleFrameProblem):
    params, shape, lay = _split_x(x, prob)
    r_kp = keypoint_residuals(params, shape, kp_dense, prob.cam, prob.spec)
    robust_blocks = r_kp.reshape(-1, 2)

    plain = []
    joint_aa = params[lay["joint_aa"][0]:lay["joint_aa"][1]]
    if prob.beta_pose > 0.0:
        if prob.gmm is not None:
            plain.append(gmm_pose_prior_residual(joint_aa, prob.gmm))
        else:
            plain.append(l2_pose_prior_residual(
                joint_aa, jnp.asarray(prob.beta_pose, x.dtype)))
    if prob.opt_shape and prob.beta_shape > 0.0:
        plain.append(shape_prior_residual(
            shape, jnp.asarray(prob.beta_shape, x.dtype)))
    if plain:
        plain_rows = jnp.concatenate(plain)
    else:
        plain_rows = jnp.zeros(0, x.dtype)
    return robust_blocks, plain_rows


def _bounds_and_frozen(prob: SingleFrameProblem, dtype):
    lay = frame_param_layout(prob.n_joints)
    p = lay["total"]
    n = p + (prob.n_shapes if prob.opt_shape else 0)
    lower = np.full(n, -np.inf)
    upper = np.full(n, np.inf)
    lower[0], upper[0] = SCALE_MIN, SCALE_MAX
    frozen = np.zeros(n, dtype=bool)
    if prob.freeze_scale:
        frozen[0] = True
    if not prob.opt_shape:
        # pose-only path freezes unobserved joints (Sim3BA.h:607-611)
        for j in FIXED_JOINTS_POSE_ONLY:
            if j < prob.n_joints:
                s = lay["joint_aa"][0] + 3 * (j - 1)
                frozen[s:s + 3] = True
    return jnp.asarray(lower, dtype), jnp.asarray(upper, dtype), jnp.asarray(frozen)


def build_fitter(prob: SingleFrameProblem, max_iters: int, dtype=jnp.float32,
                 lm_cfg: Optional[LMConfig] = None, chunk: int = 0):
    """Return a jitted fn(x0 (F, P[+nS]), kp_dense (F, K, 4)) -> LMState
    that fits all frames at once (vmapped batched LM). The problem's arrays
    are closure-captured as compile-time constants — one compilation per
    problem definition, reused across calls. lm_cfg overrides the shipped
    LMConfig (max_iters is still taken from the explicit argument).

    chunk > 0 dispatches the batch as a lax.map over chunk-sized vmapped
    sub-batches, each with its own convergence-exit while_loop — the
    single-frame analogue of solve/multi_frame.build_chunked_window_fit.
    The plain vmapped batch runs until its SLOWEST frame converges (both
    the LM while_loop and the chol TR solver's secular-Newton while_loop
    lift their conditions over the whole batch); on the bench workload
    going 128 -> 1000 frames wide costs 3.7 -> 7.9 ms/frame from that
    tail alone. Per-frame optima are unchanged (converged frames freeze
    — same invariant as the window version, pinned bit-tight in f64 by
    tests/test_single_frame_solver.py::test_chunked_fitter_matches_vmap);
    the batch is padded to a chunk multiple by replicating the last frame
    and padded outputs are stripped."""
    lower, upper, frozen = _bounds_and_frozen(prob, dtype)
    if lm_cfg is None:
        cfg = LMConfig(max_iters=max_iters, huber_delta=HUBER_DELTA)
    else:
        cfg = lm_cfg._replace(max_iters=max_iters)

    def solve_one(x0_i, kp_i):
        return lm_solve(lambda x: _residual_fn(x, kp_i, prob),
                        x0_i, cfg, lower=lower, upper=upper, frozen=frozen)

    vfit = jax.vmap(solve_one)
    if chunk <= 0:
        return jax.jit(vfit)

    from smpltpu.utils.chunked import chunked_map

    return jax.jit(lambda x0, kp_dense: chunked_map(vfit, chunk,
                                                    x0, kp_dense))


_fitter_cache: dict = {}


def fit_frames(
    prob: SingleFrameProblem,
    x0: jnp.ndarray,          # (F, P[+nS]) initial params per frame
    kp_dense: jnp.ndarray,    # (F, K, 4)
    max_iters: int,
) -> LMState:
    """Convenience wrapper around build_fitter with a per-problem cache.

    Frames whose keypoints are fully masked converge immediately to their
    init (zero residuals) — the batched equivalent of the reference's
    skip-empty-frame control flow (src/main_single_frame.cpp:200-203)."""
    key = (id(prob), int(max_iters), jnp.dtype(x0.dtype).name)
    if key not in _fitter_cache:
        # pin `prob` in the value: id() keys are only unique while the
        # object is alive, so the cache must hold a strong reference or a
        # recycled id could silently return a fitter for a dead problem
        _fitter_cache[key] = (prob, build_fitter(prob, max_iters, dtype=x0.dtype))
    return _fitter_cache[key][1](x0, kp_dense)
