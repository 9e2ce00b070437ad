"""Solver write-back: packed frame parameter vectors -> full-model pose.

Parity with the reference's post-solve avatar update (include/Sim3BA.h:
649-670 and include/MultiFrameBA.h:154-174): the optimized root angle-axis
is COMPOSED with the fixed initial orientation (r[0] <- R(rootAA) @ R0),
non-root joints get R(jointAA_j), the root position becomes rootT, and —
reference quirk — the optimized Sim3 SCALE IS DISCARDED (the avatar has no
scale field), so the evaluation/render skeleton is the unscaled one. We
reproduce that exactly; the scale still lives in the returned params for
logging, matching Sim3Params write-back (Sim3BA.h:673-679).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from smpltpu.energy.params import unpack_frame_params
from smpltpu.models.smpl import rodrigues


class Pose(NamedTuple):
    rotations: jnp.ndarray  # (nJ, 3, 3) local rotations (row 0 = root)
    root_pos: jnp.ndarray   # (3,)
    scale: jnp.ndarray      # () — informational; NOT applied (see above)


def params_to_pose(params_vec: jnp.ndarray, r0: jnp.ndarray,
                   n_joints: int) -> Pose:
    """Convert one packed frame vector to full-model pose. vmap-friendly."""
    fp = unpack_frame_params(params_vec, n_joints)
    root_rot = rodrigues(fp.root_aa) @ r0
    joint_rots = rodrigues(fp.joint_aa)  # (nJ-1, 3, 3)
    rotations = jnp.concatenate([root_rot[None], joint_rots], axis=0)
    return Pose(rotations=rotations, root_pos=fp.root_t, scale=fp.scale)
