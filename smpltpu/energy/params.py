"""Per-frame parameter vector layout.

The reference scatters a frame's unknowns over many tiny Ceres parameter
blocks (scale(1), rootAA(3), rootT(3), 23 x jointAA(3); include/Sim3BA.h:
421-430). On TPU we pack them into ONE flat vector per frame so a whole
video is a dense (F, P) tensor and the normal equations are dense
(P, P) blocks:

    [ scale | rootAA(3) | rootT(3) | jointAA[1..nJ-1] (3 each) ]

P = 7 + 3*(nJ-1) = 76 for SMPL's 24 joints. Shape coefficients are a
separate (possibly shared) vector, mirroring the reference's shared shape
block (include/MultiFrameBA.h:67-68).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from smpltpu.constants import SMPL_NUM_JOINTS


def frame_param_layout(n_joints: int = SMPL_NUM_JOINTS) -> dict:
    """Slice indices into the packed frame vector."""
    return {
        "scale": (0, 1),
        "root_aa": (1, 4),
        "root_t": (4, 7),
        "joint_aa": (7, 7 + 3 * (n_joints - 1)),
        "total": 7 + 3 * (n_joints - 1),
    }


N_FRAME_PARAMS = frame_param_layout()["total"]  # 76


class FrameParams(NamedTuple):
    """Unpacked view of one frame's parameters."""

    scale: jnp.ndarray     # ()
    root_aa: jnp.ndarray   # (3,)
    root_t: jnp.ndarray    # (3,)
    joint_aa: jnp.ndarray  # (nJ-1, 3) for joints 1..nJ-1


def pack_frame_params(fp: FrameParams) -> jnp.ndarray:
    return jnp.concatenate([
        jnp.reshape(fp.scale, (1,)),
        fp.root_aa,
        fp.root_t,
        fp.joint_aa.reshape(-1),
    ])


def unpack_frame_params(vec: jnp.ndarray, n_joints: int = SMPL_NUM_JOINTS) -> FrameParams:
    lay = frame_param_layout(n_joints)
    return FrameParams(
        scale=vec[..., 0],
        root_aa=vec[..., lay["root_aa"][0]:lay["root_aa"][1]],
        root_t=vec[..., lay["root_t"][0]:lay["root_t"][1]],
        joint_aa=vec[..., lay["joint_aa"][0]:lay["joint_aa"][1]].reshape(
            vec.shape[:-1] + (n_joints - 1, 3)),
    )


def init_frame_params(n_joints: int = SMPL_NUM_JOINTS, depth: float = 3.0,
                      dtype=jnp.float32) -> jnp.ndarray:
    """Reference initialization: s=1, rootAA=0, t=(0,0,depth), jointAA=0
    (src/main_single_frame.cpp:219-224, src/main_multi_frame.cpp:96-100)."""
    vec = jnp.zeros(frame_param_layout(n_joints)["total"], dtype=dtype)
    vec = vec.at[0].set(1.0)
    vec = vec.at[6].set(depth)
    return vec
