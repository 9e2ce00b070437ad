"""Fused shape-blendshape + linear-blend-skinning Pallas kernel.

This is the TPU-native replacement for the vertex hot loop inside the
reference's ``ark::Avatar::update()`` (avatar submodule; OpenMP-parallel
LBS over 6890 verts, SURVEY.md section 3.4 "the single biggest port the
native thing item"). One kernel pass fuses, per (batch block, vertex tile):

    vsh_c = shapes @ shapedirs[:, c, :] + v_template[c]   (MXU, c = x,y,z)
    A_k   = G_k @ W                                       (MXU, k = the 12
                                                           entries of the
                                                           3x4 transform)
    out_c = A_{c,0} * vsh_x + A_{c,1} * vsh_y + A_{c,2} * vsh_z + A_{c,3}

so the blended per-vertex transforms never materialize in HBM (the XLA
einsum formulation in models/smpl.py writes a (B, nV, 3, 3) intermediate —
12x the output bytes). Everything is MXU matmuls over (B_BLK, nS/nJ, T)
plus full-width VPU FMAs; vertices live on the 128-lane axis
(coordinate-major layout), batch rows on the sublane axis.

Measured on v5e (B=256, 6890 verts): marginal kernel cost ~25 us — at the
HBM-bandwidth speed of light for the 21 MB output — vs ~220 us for XLA's
einsum LBS (~9x). The surrounding FK/rodrigues stage dominates the full
forward at small batch, so end-to-end forward parity is ~equal until FK is
also fused (future work). Correctness: tests/test_ops.py vs smpl_forward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8
NJ_PAD = 32          # joint axis padded for the MXU contraction
DEFAULT_TILE = 256   # vertex tile (lanes)
DEFAULT_BBLK = 64    # batch block (sublanes)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def prepare_lbs_operands(model) -> dict:
    """Repack model arrays into the kernel's coordinate-major, lane-padded
    layout (do once per model; cheap numpy)."""
    n_v = model.num_verts
    n_pad = _round_up(n_v, LANE)
    vt = np.zeros((3, n_pad), np.float32)
    vt[:, :n_v] = np.asarray(model.v_template).T
    sd = np.zeros((model.num_shapes, 3, n_pad), np.float32)
    sd[:, :, :n_v] = np.transpose(np.asarray(model.shapedirs), (2, 1, 0))
    wts = np.zeros((NJ_PAD, n_pad), np.float32)
    wts[:model.num_joints, :n_v] = np.asarray(model.weights).T
    return {
        "v_template_t": jnp.asarray(vt),
        "shapedirs_t": jnp.asarray(sd),
        "weights_t": jnp.asarray(wts),
        "n_verts": n_v,
        "n_pad": n_pad,
        "n_joints": model.num_joints,
    }


def _lbs_kernel(shapes_ref, g_ref, vt_ref, sd_ref, w_ref, out_ref):
    """One (batch block, vertex tile) program.

    shapes_ref: (B_BLK, nS)      shape coefficients
    g_ref:      (12, B_BLK, 32)  joint transforms, k = 4*c + d
    vt_ref:     (3, T)           template tile (coordinate-major)
    sd_ref:     (nS, 3, T)       blendshape tile
    w_ref:      (32, T)          skinning-weight tile (zero-padded joints)
    out_ref:    (3, B_BLK, T)    skinned tile
    """
    sh = shapes_ref[:, :]
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    vsh = [dot(sh, sd_ref[:, c, :]) + vt_ref[c, :][None, :] for c in range(3)]
    w_tile = w_ref[:, :]
    for c in range(3):
        a = [dot(g_ref[4 * c + d], w_tile) for d in range(4)]
        out_ref[c, :, :] = (a[0] * vsh[0] + a[1] * vsh[1]
                            + a[2] * vsh[2] + a[3])


def lbs_pallas(
    shapes: jnp.ndarray,      # (B, nS)
    g_affine: jnp.ndarray,    # (B, nJ, 3, 4) per-joint world transforms
    operands: dict,           # from prepare_lbs_operands
    tile: int = DEFAULT_TILE,
    batch_block: int = DEFAULT_BBLK,
    interpret: bool = False,
) -> jnp.ndarray:
    """Skinned vertices (B, 3, nPad) — slice [:, :, :n_verts] for the cloud.

    g_affine[b, j] = [G_j | t_j] with t_j = x_j - G_j @ J_rest_j + p, i.e.
    exactly the transforms smpl_forward blends (models/smpl.py LBS step).
    """
    vt = operands["v_template_t"]
    sd = operands["shapedirs_t"]
    wts = operands["weights_t"]
    n_pad = operands["n_pad"]
    n_j = operands["n_joints"]
    b, n_s = shapes.shape

    # largest lane multiple <= requested that divides the padded extent
    tile = min(tile, n_pad)
    while n_pad % tile != 0:
        tile -= LANE
    n_tiles = n_pad // tile

    b_blk = min(batch_block, b)
    b_pad = _round_up(b, b_blk)
    if b_pad != b:
        shapes = jnp.pad(shapes.astype(jnp.float32), ((0, b_pad - b), (0, 0)))
        g_affine = jnp.pad(g_affine.astype(jnp.float32),
                           ((0, b_pad - b), (0, 0), (0, 0), (0, 0)))
    n_bblk = b_pad // b_blk

    # (B, nJ, 3, 4) -> (12, B, NJ_PAD), k-major = 4*c + d
    g_packed = jnp.transpose(g_affine.astype(jnp.float32),
                             (2, 3, 0, 1)).reshape(12, b_pad, n_j)
    g_packed = jnp.pad(g_packed, ((0, 0), (0, 0), (0, NJ_PAD - n_j)))

    out = pl.pallas_call(
        _lbs_kernel,
        grid=(n_bblk, n_tiles),
        in_specs=[
            pl.BlockSpec((b_blk, n_s), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, b_blk, NJ_PAD), lambda i, t: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i, t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((operands["shapedirs_t"].shape[0], 3, tile),
                         lambda i, t: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((NJ_PAD, tile), lambda i, t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, b_blk, tile), lambda i, t: (0, i, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, b_pad, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * (3 * n_s + 12 * NJ_PAD) + 7 * b_pad * n_pad * 3,
            bytes_accessed=4 * (n_pad * (3 + 3 * n_s + NJ_PAD)
                                + b_pad * (n_s + 12 * NJ_PAD)
                                + 3 * b_pad * n_pad),
            transcendentals=0,
        ),
        interpret=interpret,
    )(shapes.astype(jnp.float32), g_packed, vt, sd, wts)
    return jnp.transpose(out, (1, 0, 2))[:b]


def joint_affines(model, shape, rotations, root_pos):
    """Per-joint world affine transforms (nJ, 3, 4) feeding lbs_pallas —
    the FK stage of smpl_forward, exposed so callers can fuse FK on XLA
    and skinning (the hot op) on Pallas. vmap over batch.

    The FK stage here is O(nJ), not O(nV): rest joints come from the
    precomputed reduced regressor ``joint_shape_reg = J_reg @ shapedirs``
    (the reference's jointShapeReg, Sim3BA.h:417) instead of regressing
    the full shaped vertex cloud — identical math by linearity
    (J_reg @ (v_t + S·w) = J_reg@v_t + (J_reg@S)·w), so the only O(nV)
    work left in the fused forward is the skinning kernel itself. Pinned
    against smpl_forward in tests/test_ops.py."""
    from smpltpu.models.smpl import _fk_global

    n_j = model.num_joints
    jrt = jnp.einsum("jv,vx->jx", model.J_regressor, model.v_template)
    jsr = model.joint_shape_reg.reshape(n_j, 3, -1)
    joints_rest = jrt + jnp.einsum("jxs,...s->...jx", jsr, shape)
    g, joints_local = _fk_global(model.parents, rotations, joints_rest)
    t = (joints_local - jnp.einsum("...jab,...jb->...ja", g, joints_rest)
         + root_pos[..., None, :])
    return jnp.concatenate([g, t[..., None]], axis=-1), joints_local + root_pos[..., None, :]
