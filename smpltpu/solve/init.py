"""Data-driven frame initialization + multi-start fitting.

The reference initializes every frame blindly at s=1, rootAA=0,
t=(0,0,3) (src/main_single_frame.cpp:219-224) and hopes Ceres finds the
right basin. On real keypoints that is a basin lottery: the robustified
reprojection energy (Huber delta=3 px against initial residuals of
hundreds of px) is riddled with local minima where whole limbs are given
up as outliers, and different solvers land in different basins from the
same cold start (measured in tests/test_parity_oracle.py's development:
scipy TRF, MINPACK LM and the batched LM all reach different optima on
video1 frames).

Two mitigations, both TPU-cheap because fitting is batched:

* ``estimate_frame_init`` — closed-form init from the detections
  themselves: depth from the pinhole relation between the observed
  keypoints' pixel span and the rest skeleton's metric span over the SAME
  joints, translation from back-projecting the keypoint centroid at that
  depth. No optimization, pure numpy.

* ``make_start_set`` — a small grid of root-yaw hypotheses around the
  data-driven init (front/back/left/right facing). The batched LM fits
  all starts of all frames as ONE vmapped solve and keeps each frame's
  lowest-cost result — multi-start costs one extra batch dimension, not
  wall-clock serialization (TPU-idiomatic replacement for a smarter
  CPU-serial initializer).
"""

from __future__ import annotations

import numpy as np

from smpltpu.energy.params import frame_param_layout, init_frame_params


def rest_joints_cam(spec) -> np.ndarray:
    """Rest-pose joint positions in the camera frame at identity pose,
    unit scale, zero translation: R0 @ (root-anchored rest skeleton)."""
    import jax.numpy as jnp

    from smpltpu.energy import skeleton_joints_cam

    n_j = len(spec.parents)
    x0 = np.asarray(init_frame_params(n_j, depth=0.0, dtype=jnp.float64))
    return np.asarray(skeleton_joints_cam(
        jnp.asarray(x0), jnp.zeros(1, jnp.float64),
        spec._replace(joint_shape_reg=None)))


def estimate_frame_init(
    kp_dense: np.ndarray,   # (K, 4) [jid, u, v, valid]
    rest_cam: np.ndarray,   # (nJ, 3) from rest_joints_cam(spec)
    cam,
    n_joints: int = 24,
    depth_bounds: tuple = (0.5, 15.0),
    min_kps: int = 4,
    default_depth: float = 3.0,
) -> np.ndarray:
    """Closed-form (P,) init for one frame. Falls back to the reference
    init (s=1, t=(0,0,default_depth)) when fewer than min_kps detections.
    """
    x0 = np.array(init_frame_params(n_joints, depth=default_depth,
                                    dtype=np.float64))  # np.array: writable
    kp_dense = np.asarray(kp_dense, np.float64)
    valid = kp_dense[:, 3] > 0
    if valid.sum() < min_kps:
        return x0
    fx, fy = float(cam.fx), float(cam.fy)
    cx, cy = float(cam.cx), float(cam.cy)
    uv = kp_dense[valid, 1:3]
    jid = kp_dense[valid, 0].astype(int)
    span_px = float(uv[:, 1].max() - uv[:, 1].min())
    span_m = float(rest_cam[jid, 1].max() - rest_cam[jid, 1].min())
    if span_px < 1.0 or span_m <= 0.0:
        return x0
    # the span and the v back-projection are VERTICAL -> fy (fx only for u);
    # identical for the default_intrinsics fx==fy but not for a real
    # calibrated camera
    z = float(np.clip(fy * span_m / span_px, *depth_bounds))
    tx = (float(uv[:, 0].mean()) - cx) * z / fx - float(rest_cam[jid, 0].mean())
    ty = (float(uv[:, 1].mean()) - cy) * z / fy - float(rest_cam[jid, 1].mean())
    x0[4:7] = (tx, ty, z)
    return x0


def make_start_set(
    kp_batch: np.ndarray,   # (F, K, 4)
    spec,
    cam,
    yaws=(0.0, np.pi / 2, -np.pi / 2, np.pi),
    include_reference_init: bool = True,
    n_extra_dims: int = 0,   # append zeros (e.g. shape block) per start
    pose_seeds: np.ndarray = None,   # (S_extra, 3*(nJ-1)) joint-AA seeds
) -> np.ndarray:
    """(F, S, P[+extra]) start set: data-driven init x yaw hypotheses
    [+ the reference's blind init as one more start].

    ``pose_seeds``: extra starts with the data-driven root but the given
    joint angle-axes — pass the GMM prior's component means for
    SMPLify-style prior-seeded multi-start. Needed because the
    hard-assignment GMM energy (Sim3BA.h:275-284) is piecewise: each
    component owns a basin, the solver can never switch basins from a
    zero-pose init (the data term cannot outpull beta^2 * precision), and
    at the CLI-default beta_pose=20 the component constants c_k dominate —
    only poses near the argmin-c_k component are globally recoverable at
    all (measured round 4: GT at a non-dominant mode fits 17-46 px WORSE
    in ITS OWN basin than parked in the dominant one; the objective
    genuinely prefers the latter, Ceres included)."""
    rest = rest_joints_cam(spec)
    n_j = len(spec.parents)
    p_dim = frame_param_layout(n_j)["total"]
    starts = []
    for f in range(kp_batch.shape[0]):
        base = estimate_frame_init(kp_batch[f], rest, cam, n_joints=n_j)
        row = []
        for yaw in yaws:
            v = base.copy()
            v[2] = yaw   # rotation about the camera-frame y axis slot
            row.append(v)
        if include_reference_init:
            row.append(np.asarray(init_frame_params(n_j, dtype=np.float64)))
        if pose_seeds is not None:
            for seed in np.asarray(pose_seeds, np.float64):
                v = base.copy()
                v[7:p_dim] = seed
                row.append(v)
        starts.append(np.stack(row))
    out = np.stack(starts)                      # (F, S, P)
    if n_extra_dims > 0:
        out = np.concatenate(
            [out, np.zeros(out.shape[:2] + (n_extra_dims,))], axis=-1)
    return out


def build_px_eval(prob, dtype=None):
    """Jitted fn(x (F, P[+nS]), kp (F, K, 4)) -> (F,) mean pixel error
    over each frame's valid keypoints (0.0 for empty frames) under the
    SOLVER's forward — fitted scale included, unlike the reference's
    scale-discarding log.csv metric (Utils.h:102-116) which is a render
    write-back quirk, not a fit-quality measure. Used by fit_adaptive to
    pick the frames worth multi-starting."""
    import jax
    import jax.numpy as jnp

    from smpltpu.energy import skeleton_joints_cam
    from smpltpu.energy.reproj import project

    lay = frame_param_layout(len(prob.spec.parents))
    p = lay["total"]

    def one(x, kp):
        params = x[:p]
        shape = (x[p:] if prob.opt_shape
                 else jnp.zeros(prob.n_shapes, x.dtype))
        uv = project(skeleton_joints_cam(params, shape, prob.spec), prob.cam)
        jid = kp[:, 0].astype(jnp.int32)
        d = jnp.linalg.norm(uv[jid] - kp[:, 1:3], axis=-1)
        v = kp[:, 3]
        return jnp.sum(d * v) / jnp.maximum(jnp.sum(v), 1.0)

    return jax.jit(jax.vmap(one))


class AdaptiveResult:
    """fit_adaptive output: per-frame best params/cost/pixel error, which
    frames were escalated, and the cost history of each frame's selected
    solve (for loss_curve.txt)."""

    def __init__(self, x, cost, px, converged, iters_run, cost_history,
                 hard_idx, escalated):
        self.x = x                      # (F, P[+nS]) np
        self.cost = cost                # (F,) np
        self.px = px                    # (F,) np mean pixel error
        self.converged = converged     # (F,) np bool
        self.iters_run = iters_run     # (F,) np
        self.cost_history = cost_history  # (F, H) np
        self.hard_idx = hard_idx        # (n_hard,) frames escalated
        self.escalated = escalated      # (F,) bool: multi-start result kept


def fit_adaptive(
    prob,
    kp_batch: np.ndarray,     # (F, K, 4)
    max_iters: int,
    px_thresh: float = 6.0,
    chunk: int = 0,
    lm_cfg=None,
    dtype=None,
    yaws=(np.pi / 2, -np.pi / 2, np.pi),
    fitter=None,
):
    """Adaptive multi-start single-frame fitting (two phases, batched):

    1. fit EVERY frame once from the data-driven init (the cheapest start,
       ``estimate_frame_init``);
    2. multi-start ONLY the frames whose phase-1 mean pixel error exceeds
       ``px_thresh`` — a second (much smaller) batched solve over the
       remaining start hypotheses (the extra ``yaws`` around the data
       init + the reference's blind init, i.e. exactly the starts
       ``make_start_set`` would have added), keeping each hard frame's
       lowest-cost result across ALL its starts.

    The full ``--multi-start`` path fits F x 5 solves to fix the few
    frames the blind init loses (src/main_single_frame.cpp:208-224); this
    pays the 5x only where phase 1 demonstrably failed. A frame phase 1
    got under the threshold keeps its (possibly improvable) basin — the
    quality target is the MEAN error, and the measured gap vs always-on
    multi-start is well inside it (see BASELINE.md round-4 row).

    ``fitter``: pass a prebuilt/preshared build_fitter result to reuse its
    compile cache; default builds one with (max_iters, lm_cfg, chunk).
    Returns :class:`AdaptiveResult` (numpy)."""
    import jax.numpy as jnp

    from smpltpu.solve.single_frame import build_fitter

    dtype = jnp.float32 if dtype is None else dtype
    kp_batch = np.asarray(kp_batch)
    f_dim = kp_batch.shape[0]
    n_j = len(prob.spec.parents)
    n_extra = prob.n_shapes if prob.opt_shape else 0
    rest = rest_joints_cam(prob.spec)

    x0 = np.stack([estimate_frame_init(kp_batch[f], rest, prob.cam,
                                       n_joints=n_j)
                   for f in range(f_dim)])
    if n_extra:
        x0 = np.concatenate([x0, np.zeros((f_dim, n_extra))], axis=-1)

    if fitter is None:
        fitter = build_fitter(prob, max_iters=max_iters, dtype=dtype,
                              lm_cfg=lm_cfg, chunk=chunk)
    px_eval = build_px_eval(prob)

    kp_j = jnp.asarray(kp_batch, dtype)
    st_a = fitter(jnp.asarray(x0, dtype), kp_j)
    px_a = np.asarray(px_eval(st_a.x, kp_j))

    # np.array (copy): np.asarray of a jax.Array is a read-only view and
    # the phase-2 escalation writes into these
    x = np.array(st_a.x)
    cost = np.array(st_a.cost)
    conv = np.array(st_a.converged)
    iters = np.array(st_a.iters_run)
    hist = np.array(st_a.cost_history)
    px = px_a.copy()
    escalated = np.zeros(f_dim, bool)

    hard = np.nonzero(px_a > px_thresh)[0]
    if hard.size:
        # with a GMM prior, escalation also seeds each component mean
        # (see make_start_set.pose_seeds)
        seeds = (np.asarray(prob.gmm.means, np.float64)
                 if getattr(prob, "gmm", None) is not None else None)
        s_dim = len(yaws) + 1 + (0 if seeds is None else len(seeds))
        starts = make_start_set(kp_batch[hard], prob.spec, prob.cam,
                                yaws=tuple(yaws),
                                include_reference_init=True,
                                n_extra_dims=n_extra, pose_seeds=seeds)
        xb0 = jnp.asarray(starts.reshape(hard.size * s_dim, -1), dtype)
        kp_b = jnp.asarray(np.repeat(kp_batch[hard], s_dim, axis=0), dtype)
        st_b = fitter(xb0, kp_b)
        px_b = np.asarray(px_eval(st_b.x, kp_b)).reshape(hard.size, s_dim)
        cost_b = np.asarray(st_b.cost).reshape(hard.size, s_dim)
        best = np.argmin(cost_b, axis=1)
        rows = np.arange(hard.size)
        better = cost_b[rows, best] < cost[hard]
        sel = hard[better]
        flat = rows[better] * s_dim + best[better]
        x[sel] = np.asarray(st_b.x)[flat]
        cost[sel] = cost_b[rows[better], best[better]]
        px[sel] = px_b[rows[better], best[better]]
        conv[sel] = np.asarray(st_b.converged)[flat]
        iters[sel] = np.asarray(st_b.iters_run)[flat]
        hist[sel] = np.asarray(st_b.cost_history)[flat]
        escalated[sel] = True

    return AdaptiveResult(x, cost, px, conv, iters, hist, hard, escalated)


def best_of_starts(states, f_dim: int, s_dim: int):
    """Select each frame's lowest-cost start from an LMState/LMResult
    whose leading axis is F*S (starts fastest-varying). Returns
    (x (F, P), cost (F,), best_idx (F,))."""
    cost = np.asarray(states.cost).reshape(f_dim, s_dim)
    best = np.argmin(cost, axis=1)
    x = np.asarray(states.x).reshape(f_dim, s_dim, -1)
    return (x[np.arange(f_dim), best],
            cost[np.arange(f_dim), best],
            best)
