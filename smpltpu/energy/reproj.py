"""Keypoint reprojection residuals.

Replaces the reference's per-keypoint autodiff functors ``ReprojCost``
(include/Sim3BA.h:22-99) and ``ReprojCostShape`` (include/Sim3BA.h:102-240),
which re-walk the kinematic chain once per keypoint per Ceres evaluation.
TPU-first reformulation: ONE whole-skeleton forward-kinematics pass
computes every joint's camera-space position, all keypoint residuals are
emitted as a dense masked (N_KP_SLOTS, 2) tensor, and ``jax.jacfwd`` over
the packed 76-dof frame vector yields the full Jacobian — vmapped over
frames so an entire video's residuals/Jacobians assemble as one batched op.

The math reproduces the reference functor semantics exactly, including its
root quirks (verified in tests/test_energy.py against an independent
chain-walk oracle):

  * rotations along the chain exclude the root's own local rotation; the
    fixed initial root orientation R0 (= yaw(pi) @ diag(1,-1,1), det -1)
    is applied afterwards, then the optimized root angle-axis, scale and
    translation (Sim3BA.h:70-80);
  * with shape optimization, each chain offset gains (delta_j - delta_parent)
    with delta = jointShapeReg . w (Sim3BA.h:144-207);
  * joint 0's own position is delta_0 (shape-only), but children of the
    root do NOT inherit that delta_0 offset — the reference chain stops at
    the root without adding the root's position (Sim3BA.h:56,174), so the
    skeleton is evaluated as if the root sat at the origin. We reproduce
    this (it matters only when shape is optimized, |delta_0| ~ cm).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from smpltpu.models.smpl import SMPLModel, rodrigues


class Camera(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray


class SkeletonSpec(NamedTuple):
    """Static per-model data for the solver's skeleton-only FK."""

    parents: np.ndarray            # (nJ,) static
    base_offsets: jnp.ndarray      # (nJ, 3) zero-shape parent-relative offsets
    r0: jnp.ndarray                # (3, 3) fixed initial root orientation
    joint_shape_reg: Optional[jnp.ndarray]  # (nJ, 3, nS) or None




def make_skeleton_spec(model: SMPLModel, r0, with_shape: bool) -> SkeletonSpec:
    """Precompute rest-pose bone offsets from the zero-shape, zero-pose
    model, root-anchored (parity: include/Sim3BA.h:532-555 computes them
    from a zero-pose avatar; at zero pose FK is the identity, so rest
    joints are just J_regressor @ v_template)."""
    joints_rest = model.J_regressor @ model.v_template  # (nJ, 3)
    parents = model.parents
    pj = np.where(parents < 0, 0, parents)
    base_offsets = joints_rest - joints_rest[pj]
    base_offsets = base_offsets.at[0].set(jnp.zeros(3, dtype=base_offsets.dtype))
    n_j = model.num_joints
    jsr = None
    if with_shape:
        jsr = model.joint_shape_reg.reshape(n_j, 3, model.num_shapes)
    return SkeletonSpec(
        parents=parents,
        base_offsets=base_offsets,
        r0=jnp.asarray(r0, dtype=base_offsets.dtype),
        joint_shape_reg=jsr,
    )


def skeleton_joints_cam(
    params_vec: jnp.ndarray,   # (P,) packed frame params
    shape: jnp.ndarray,        # (nS,) — ignored when spec has no shape reg
    spec: SkeletonSpec,
    r0: Optional[jnp.ndarray] = None,  # per-frame fixed root orientation
                                       # override (the multi-frame BA passes
                                       # each frame's avatar r[0],
                                       # MultiFrameBA.h:87); default spec.r0
) -> jnp.ndarray:
    """Camera-space positions of all joints under the reference's skeleton
    model. Returns (nJ, 3)."""
    from smpltpu.energy.params import unpack_frame_params

    n_j = len(spec.parents)
    fp = unpack_frame_params(params_vec, n_j)

    offsets = spec.base_offsets
    delta0 = jnp.zeros(3, dtype=offsets.dtype)
    if spec.joint_shape_reg is not None:
        delta = jnp.einsum("jxs,s->jx", spec.joint_shape_reg, shape)  # (nJ,3)
        pj = np.where(spec.parents < 0, 0, spec.parents)
        delta_parent = jnp.where((spec.parents >= 0)[:, None], delta[pj], 0.0)
        offsets = offsets + (delta - delta_parent)
        delta0 = delta[0]

    # local rotations for non-root joints; root slot unused (identity)
    rot = rodrigues(fp.joint_aa)  # (nJ-1, 3, 3)
    eye = jnp.eye(3, dtype=offsets.dtype)

    # FK with the root pinned at the origin and G_root = I (the chain walk
    # excludes the root's rotation and position, Sim3BA.h:56-67).
    # Unrolled per-joint chain: measured FASTER on TPU than a
    # level-synchronous gather/scatter formulation (23 ms vs 53 ms per LM
    # iteration on the 67x20-window workload — XLA fuses the tiny chain
    # ops; batched gathers/scatters do not fuse).
    g = [eye]
    x = [jnp.zeros(3, dtype=offsets.dtype)]
    for j in range(1, n_j):
        p = int(spec.parents[j])
        g_j = g[p] @ rot[j - 1]
        x_j = g[p] @ offsets[j] + x[p]
        g.append(g_j)
        x.append(x_j)
    joints = jnp.stack(x)  # (nJ, 3)
    # root-quirk: joint 0 reports its shape delta even though children
    # ignore it (Sim3BA.h:142-170 with jid=0)
    joints = joints.at[0].set(delta0)

    # fixed initial orientation, optimized root rotation, scale, translation
    r_root = rodrigues(fp.root_aa)
    joints = joints @ (spec.r0 if r0 is None else r0).T
    joints = joints @ r_root.T
    joints = fp.scale[..., None] * joints + fp.root_t
    return joints


def project(points: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """Pinhole projection (..., 3) -> (..., 2) pixels (Sim3BA.h:83-86).

    z is guarded away from 0 so degenerate points (e.g. zero-padded window
    frames) produce large-but-finite values instead of inf/NaN — a NaN here
    would poison the masked residual rows (NaN * 0 = NaN) and silently fail
    the whole window's solve."""
    z = points[..., 2]
    z = jnp.where(jnp.abs(z) < 1e-8, jnp.where(z < 0, -1e-8, 1e-8), z)
    u = cam.fx * points[..., 0] / z + cam.cx
    v = cam.fy * points[..., 1] / z + cam.cy
    return jnp.stack([u, v], axis=-1)


def keypoint_residuals(
    params_vec: jnp.ndarray,
    shape: jnp.ndarray,
    kp_dense: jnp.ndarray,   # (K, 4) rows [jid, u, v, valid]
    cam: Camera,
    spec: SkeletonSpec,
    r0: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked reprojection residuals, flattened (K*2,).

    Invalid slots produce exactly-zero rows (and zero Jacobian rows, since
    the mask multiplies the traced value), keeping shapes static across
    frames with differing detections — the TPU version of the reference's
    skip-frame / skip-keypoint control flow (src/main_single_frame.cpp:
    200-203, Sim3BA.h:573-576).
    """
    joints_cam = skeleton_joints_cam(params_vec, shape, spec, r0)  # (nJ, 3)
    jids = kp_dense[:, 0].astype(jnp.int32)
    pred = project(joints_cam[jids], cam)                      # (K, 2)
    res = (pred - kp_dense[:, 1:3]) * kp_dense[:, 3:4]
    return res.reshape(-1)
