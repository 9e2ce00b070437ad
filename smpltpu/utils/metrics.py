"""Evaluation metric: mean 2D pixel reprojection error.

Parity: include/Utils.h:102-116 — project the FULL model's posed joint
positions (avatar.jointPos: shape applied, solver scale NOT applied — see
utils/writeback.py) with the pinhole intrinsics and average the Euclidean
pixel distance over the observed keypoints. The duplicated pelvis slot
counts twice in the average, exactly as the reference's kps vector does.
"""

from __future__ import annotations

import jax.numpy as jnp

from smpltpu.energy.reproj import Camera, project


def mean_pixel_error(joints_world: jnp.ndarray, kp_dense: jnp.ndarray,
                     cam: Camera) -> jnp.ndarray:
    """joints_world: (nJ, 3) posed joints; kp_dense: (K, 4) [jid,u,v,valid].
    Returns () mean pixel error over valid slots (0.0 if none, matching
    Utils.h:106's empty-keypoints early return). vmap over frames."""
    jids = kp_dense[:, 0].astype(jnp.int32)
    pred = project(joints_world[jids], cam)
    d = jnp.linalg.norm(pred - kp_dense[:, 1:3], axis=-1)
    valid = kp_dense[:, 3]
    n = jnp.sum(valid)
    return jnp.where(n > 0, jnp.sum(d * valid) / jnp.maximum(n, 1.0), 0.0)
