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
) -> np.ndarray:
    """(F, S, P[+extra]) start set: data-driven init x yaw hypotheses
    [+ the reference's blind init as one more start]."""
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
        starts.append(np.stack(row))
    out = np.stack(starts)                      # (F, S, P)
    if n_extra_dims > 0:
        out = np.concatenate(
            [out, np.zeros(out.shape[:2] + (n_extra_dims,))], axis=-1)
    return out


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
