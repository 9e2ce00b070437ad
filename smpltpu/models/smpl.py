"""SMPL forward pass in JAX: shape blendshapes -> joint regression ->
forward kinematics -> linear blend skinning.

Replaces the reference's ``ark::Avatar::update()`` (avatar submodule; call
sites src/main_single_frame.cpp:213,254, include/MultiFrameBA.h:53,173 —
behavioral contract documented in SURVEY.md section 3.4). All functions are
jit/vmap-clean with static shapes; the vertex-skinning hot path has a fused
Pallas kernel variant in :mod:`smpltpu.ops.lbs`.

Conventions (matching the consumed outputs of the reference):
  * ``rotations`` are per-joint LOCAL rotation matrices r[j] (nJ, 3, 3);
    r[0] is the global root orientation (may be improper — the reference
    initializes r[0] = yaw(pi) @ diag(1,-1,1), det = -1, and we reproduce
    that quirk, see smpltpu.constants.init_root_rotation).
  * ``root_pos`` p is the world position of joint 0: the body is rotated
    about the shaped root joint and translated so jointPos[:, 0] == p.
    This makes the solver write-back consistent: the optimized rootT maps
    exactly to the projected pelvis, as in include/Utils.h:102-116 where
    jointPos.col(0) projects to the optimized translation.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SMPLModel:
    """Immutable model container (the reference's ark::AvatarModel).

    All array fields are jnp arrays; ``parents`` is a static numpy int array
    (topology is compile-time constant so FK unrolls/scan cleanly).
    """

    v_template: jnp.ndarray        # (nV, 3)
    shapedirs: jnp.ndarray         # (nV, 3, nS)
    J_regressor: jnp.ndarray       # (nJ, nV)
    weights: jnp.ndarray           # (nV, nJ)
    joint_shape_reg: jnp.ndarray   # (3*nJ, nS)
    posedirs: Optional[jnp.ndarray]  # (nV, 3, nP) or None
    faces: np.ndarray              # (nF, 3) static int
    parents: np.ndarray            # (nJ,) static int

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]

    @property
    def num_shapes(self) -> int:
        return self.shapedirs.shape[-1]

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_faces(self) -> int:
        return self.faces.shape[0]

    @classmethod
    def from_dict(cls, d: dict, dtype=jnp.float32) -> "SMPLModel":
        """Build from an io/synthetic model dict (numpy arrays)."""
        as_j = lambda a: jnp.asarray(a, dtype=dtype)
        return cls(
            v_template=as_j(d["v_template"]),
            shapedirs=as_j(d["shapedirs"]),
            J_regressor=as_j(d["J_regressor"]),
            weights=as_j(d["weights"]),
            joint_shape_reg=as_j(d["joint_shape_reg"]),
            posedirs=None if d.get("posedirs") is None else as_j(d["posedirs"]),
            faces=np.asarray(d["faces"], dtype=np.int32),
            parents=np.asarray(d["parents"], dtype=np.int32),
        )

    def tree_flatten(self):
        children = (self.v_template, self.shapedirs, self.J_regressor,
                    self.weights, self.joint_shape_reg, self.posedirs)
        aux = (self.faces.tobytes(), self.faces.shape,
               self.parents.tobytes(), self.parents.shape)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        faces_b, faces_s, parents_b, parents_s = aux
        faces = np.frombuffer(faces_b, dtype=np.int32).reshape(faces_s)
        parents = np.frombuffer(parents_b, dtype=np.int32).reshape(parents_s)
        return cls(*children, faces=faces, parents=parents)


def rodrigues(aa: jnp.ndarray) -> jnp.ndarray:
    """Angle-axis (..., 3) -> rotation matrices (..., 3, 3).

    Taylor-safe at theta -> 0 (matches ceres::AngleAxisRotatePoint semantics,
    include/Sim3BA.h:61, and the write-back's 1e-12 identity guard at
    include/Sim3BA.h:486-488 — here the formula itself is smooth through 0,
    which is also what autodiff needs).
    """
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)[..., None]  # (...,1,1)
    small = theta2 < 1e-12
    # double-where: sanitize the argument of the non-taken branch so its
    # gradient is NaN-free at theta -> 0
    safe_theta2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(safe_theta2)
    # sin(t)/t and (1-cos t)/t^2 with series fallbacks near zero
    sin_over = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    one_minus_cos_over = jnp.where(small, 0.5 - theta2 / 24.0,
                                   (1.0 - jnp.cos(theta)) / safe_theta2)
    x, y, z = aa[..., 0], aa[..., 1], aa[..., 2]
    zeros = jnp.zeros_like(x)
    k = jnp.stack([
        jnp.stack([zeros, -z, y], axis=-1),
        jnp.stack([z, zeros, -x], axis=-1),
        jnp.stack([-y, x, zeros], axis=-1),
    ], axis=-2)  # (..., 3, 3) skew matrix
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), k.shape)
    return eye + sin_over * k + one_minus_cos_over * (k @ k)


def tree_levels(parents: np.ndarray):
    """Group non-root joints by tree depth. FK applied level-by-level has
    sequential depth ~8 for SMPL instead of 23 (each level is one batched
    gather+matmul+scatter), which matters on TPU where the solver cost is
    small-op latency, not FLOPs."""
    n_j = len(parents)
    depth = np.zeros(n_j, dtype=np.int64)
    for j in range(1, n_j):
        depth[j] = depth[parents[j]] + 1
    return [np.where(depth == d)[0] for d in range(1, int(depth.max()) + 1)]


def _fk_global(parents: np.ndarray, rotations: jnp.ndarray,
               joints_rest: jnp.ndarray):
    """Forward kinematics over the joint tree.

    parents is static. Returns (G, joint_world) where G[j] is the global
    rotation of joint j (product of local rotations down the chain,
    including the root's) and joint_world[j] the posed joint position with
    the root joint pinned at the origin (the caller adds root translation).

    Implemented as an unrolled python loop over the 24 static joints — XLA
    fuses the tiny chain matmuls; a level-synchronous gather/scatter
    formulation measured ~2x SLOWER on TPU (scatters do not fuse).
    """
    n_j = len(parents)
    g = [rotations[..., 0, :, :]]
    x = [jnp.zeros_like(joints_rest[..., 0, :])]
    for j in range(1, n_j):
        p = int(parents[j])
        off = joints_rest[..., j, :] - joints_rest[..., p, :]
        g_j = g[p] @ rotations[..., j, :, :]
        x_j = jnp.einsum("...ab,...b->...a", g[p], off) + x[p]
        g.append(g_j)
        x.append(x_j)
    return jnp.stack(g, axis=-3), jnp.stack(x, axis=-2)


@partial(jax.jit, static_argnames=("use_posedirs", "want_verts"))
def smpl_forward(
    model: SMPLModel,
    shape: jnp.ndarray,       # (nS,)
    rotations: jnp.ndarray,   # (nJ, 3, 3) local rotations, row 0 = root
    root_pos: jnp.ndarray,    # (3,) world position of joint 0
    use_posedirs: bool = False,
    want_verts: bool = True,
):
    """Full SMPL forward. Returns dict with:
         joints (nJ, 3)  posed world joint positions (jointPos parity)
         verts  (nV, 3)  posed skinned vertices (cloud parity), if requested

    ``use_posedirs`` applies pose-corrective blendshapes when the model has
    them (standard SMPL; off by default to match the reference solver's
    skeleton model, which never uses them).

    Works under vmap over leading batch axes of (shape, rotations, root_pos).
    """
    # 1) shaped template: V = v_template + shapedirs . w
    v_shaped = model.v_template + jnp.einsum("vxs,...s->...vx", model.shapedirs, shape)
    # 2) rest-pose joints: J = J_regressor @ V
    joints_rest = jnp.einsum("jv,...vx->...jx", model.J_regressor, v_shaped)

    if use_posedirs and model.posedirs is not None:
        n_j = model.num_joints
        eye = jnp.eye(3, dtype=rotations.dtype)
        pose_feat = (rotations[..., 1:, :, :] - eye).reshape(
            rotations.shape[:-3] + (9 * (n_j - 1),))
        v_shaped = v_shaped + jnp.einsum("vxp,...p->...vx", model.posedirs, pose_feat)

    # 3) FK (root pinned at origin), then translate so joint 0 sits at p
    g, joints_local = _fk_global(model.parents, rotations, joints_rest)
    joints_world = joints_local + root_pos[..., None, :]

    out = {"joints": joints_world}
    if want_verts:
        # 4) LBS: v' = sum_j W[v,j] * (G_j (v - J_rest_j) + x_j) + p
        #    expressed as two MXU matmuls:
        #      rot_part:  (nV, nJ) @ (nJ, 9)  then contracted with verts
        #      off_part:  (nV, nJ) @ (nJ, 3)
        t_j = joints_local - jnp.einsum(
            "...jab,...jb->...ja", g, joints_rest)     # per-joint translations
        rot_blend = jnp.einsum("vj,...jab->...vab", model.weights, g)
        off_blend = jnp.einsum("vj,...ja->...va", model.weights, t_j)
        verts = (jnp.einsum("...vab,...vb->...va", rot_blend, v_shaped)
                 + off_blend + root_pos[..., None, :])
        out["verts"] = verts
    return out
