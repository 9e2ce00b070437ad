"""Closed-form Jacobian of the keypoint reprojection residuals.

Round-1 assembled the per-frame Jacobian with ``jax.linearize`` + 86
batched JVP pushes (one per packed-param/shape column), each re-running
the FK chain's tangent ops (solve/multi_frame.py one_frame). This module
computes the same Jacobian geometrically in roughly two FK-equivalent
passes:

  * joint-angle columns by the rigid-subtree rule: a local tangent
    perturbation ``d`` of joint j's rotation moves every STRICT descendant
    k rigidly about joint j's origin,

        d x_k = (G_j J_r(theta_j) d) x (x_k - x_j),

    where ``G_j`` is the chain-global rotation of joint j (the chain that
    EXCLUDES the root's own rotation, Sim3BA.h:56-67) and ``J_r`` is the
    SO(3) right Jacobian of the axis-angle exponential
    (Exp(t + d) = Exp(t) Exp(J_r(t) d));
  * shape columns by the same parent-prefix recursion FK itself uses:
    ``d x_k/d w = d x_parent/d w + G_parent (jsr_k - jsr_parent)``;
  * root angle-axis / scale / translation columns in closed form
    (d(R(a)u)/da = -R(a) [u]_x J_r(a));
  * the pinhole chain rule with the SAME z-guard branch derivative that
    autodiff sees through ``project``'s ``jnp.where`` (reproj.py:135-146).

Reference-parity quirks are inherited from energy/reproj.py verbatim:
root excluded from the chain, R0-then-rootAA-then-Sim3 order
(Sim3BA.h:70-80), joint 0 reporting its shape delta while children ignore
it (Sim3BA.h:56,174 — automatically satisfied here because the root has
no strict ancestors, so its theta rows vanish, and its shape row is
overridden to jsr_0).

Exactness is pinned against ``jax.jacfwd`` of ``keypoint_residuals`` in
float64 (tests/test_jacobian.py); the multi-frame solver keeps the JVP
assembly available as ``MultiFrameConfig.jacobian="jvp"`` and the two
paths are pinned to reach identical optima.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from smpltpu.energy.params import frame_param_layout, unpack_frame_params
from smpltpu.energy.reproj import Camera, SkeletonSpec
from smpltpu.models.smpl import rodrigues


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrices."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([o, -z, y], axis=-1),
        jnp.stack([z, o, -x], axis=-1),
        jnp.stack([-y, x, o], axis=-1),
    ], axis=-2)


def so3_right_jacobian(aa: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian of the axis-angle exponential, (..., 3) -> (..., 3, 3).

    Exp(t + d) = Exp(t) Exp(J_r(t) d);
    J_r(t) = I - (1-cos p)/p^2 [t]_x + (p - sin p)/p^3 [t]_x^2.
    Taylor-safe at p -> 0 with the same double-where guard style as
    models/smpl.rodrigues.
    """
    theta2 = jnp.sum(aa * aa, axis=-1)[..., None, None]
    small = theta2 < 1e-12
    safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    th = jnp.sqrt(safe)
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(th)) / safe)
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (th - jnp.sin(th)) / (safe * th))
    k = _skew(aa)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), k.shape)
    return eye - a * k + b * (k @ k)


def _strict_ancestor_mask(parents: np.ndarray) -> np.ndarray:
    """(nJ, nJ-1) bool: column j-1 true for strict descendants of joint j
    (j = 1..nJ-1; the root has no angle dofs). Static per model."""
    n = len(parents)
    m = np.zeros((n, n), np.bool_)
    for k in range(n):
        p = parents[k]
        while p >= 0:
            m[k, p] = True
            p = parents[p]
    return m[:, 1:]


def keypoint_residuals_and_jacobian(
    params_vec: jnp.ndarray,
    shape: jnp.ndarray,
    kp_dense: jnp.ndarray,   # (K, 4) rows [jid, u, v, valid]
    cam: Camera,
    spec: SkeletonSpec,
    r0: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Masked residuals and their Jacobians, all in one FK-sized pass.

    Returns ``(res (K*2,), J_p (K*2, P), J_w (K*2, nS))`` — bit-for-math
    identical to ``keypoint_residuals`` and its ``jax.jacfwd`` wrt the
    packed frame vector and the shape vector. vmap over frames for the
    batched multi-frame assembly.
    """
    n_j = len(spec.parents)
    fp = unpack_frame_params(params_vec, n_j)
    wdt = spec.base_offsets.dtype
    n_s = shape.shape[0]
    lay = frame_param_layout(n_j)

    offsets = spec.base_offsets
    delta0 = jnp.zeros(3, dtype=wdt)
    jsr_off = None
    if spec.joint_shape_reg is not None:
        jsr = spec.joint_shape_reg                                  # (nJ,3,nS)
        delta = jnp.einsum("jxs,s->jx", jsr, shape)
        pj = np.where(spec.parents < 0, 0, spec.parents)
        has_par = (spec.parents >= 0)
        delta_parent = jnp.where(has_par[:, None], delta[pj], 0.0)
        offsets = offsets + (delta - delta_parent)
        delta0 = delta[0]
        jsr_off = jsr - jnp.where(has_par[:, None, None], jsr[pj], 0.0)

    # --- chain FK (root pinned, G_root = I), carrying d x/d w alongside ---
    rot = rodrigues(fp.joint_aa)                                    # (nJ-1,3,3)
    eye3 = jnp.eye(3, dtype=wdt)
    g = [eye3]
    x = [jnp.zeros(3, dtype=wdt)]
    dxdw = [jnp.zeros((3, n_s), dtype=wdt)]
    for j in range(1, n_j):
        p = int(spec.parents[j])
        g.append(g[p] @ rot[j - 1])
        x.append(g[p] @ offsets[j] + x[p])
        if jsr_off is not None:
            dxdw.append(dxdw[p] + g[p] @ jsr_off[j])
    gs = jnp.stack(g)                                               # (nJ,3,3)
    xc = jnp.stack(x)                                               # (nJ,3)
    x_out = xc.at[0].set(delta0)      # root-quirk output position
    if jsr_off is not None:
        dxdw = jnp.stack(dxdw).at[0].set(jsr[0])                    # (nJ,3,nS)
    else:
        dxdw = None

    # --- joint-angle columns: rigid subtree about each joint anchor ---
    jr_loc = so3_right_jacobian(fp.joint_aa)                        # (nJ-1,3,3)
    # w_cols[j, m, :] = column m of G_j J_r(theta_j)  (world tangent axes)
    w_cols = jnp.einsum("jab,jbm->jma", gs[1:], jr_loc)             # (nJ-1,3,3)
    v = xc[:, None, :] - xc[None, 1:, :]                            # (nJ,nJ-1,3)
    dxdth = jnp.cross(w_cols[None, :, :, :], v[:, :, None, :])      # (nJ,nJ-1,3m,3)
    anc = jnp.asarray(_strict_ancestor_mask(spec.parents), dtype=wdt)
    dxdth = dxdth * anc[:, :, None, None]

    # --- world transform y = s * R(a) R0 x + t and its param columns ---
    r0m = spec.r0 if r0 is None else r0
    r_root = rodrigues(fp.root_aa)
    u = x_out @ r0m.T                                               # (nJ,3)
    dyds = u @ r_root.T                                             # (nJ,3)
    y = fp.scale * dyds + fp.root_t
    q = r_root @ r0m
    jr_root = so3_right_jacobian(fp.root_aa)
    dyda = -fp.scale * jnp.einsum(
        "ab,kbc,cd->kad", r_root, _skew(u), jr_root)                # (nJ,3,3)
    dydth = fp.scale * jnp.einsum("ab,kjmb->kjma", q, dxdth)        # (nJ,nJ-1,3m,3)
    dydw = (fp.scale * jnp.einsum("ab,kbs->kas", q, dxdw)
            if dxdw is not None else None)                          # (nJ,3,nS)

    # --- pinhole chain rule, guard-branch-consistent with reproj.project ---
    jids = kp_dense[:, 0].astype(jnp.int32)
    vis = kp_dense[:, 3].astype(wdt)
    k_dim = kp_dense.shape[0]
    yk = y[jids]                                                    # (K,3)
    zraw = yk[:, 2]
    zg = jnp.where(jnp.abs(zraw) < 1e-8,
                   jnp.where(zraw < 0, -1e-8, 1e-8), zraw)
    pred = jnp.stack([cam.fx * yk[:, 0] / zg + cam.cx,
                      cam.fy * yk[:, 1] / zg + cam.cy], axis=-1)
    res = (pred - kp_dense[:, 1:3]) * vis[:, None]
    zlive = (jnp.abs(zraw) >= 1e-8).astype(wdt)   # where-branch derivative
    zero = jnp.zeros_like(zg)
    p2 = jnp.stack([
        jnp.stack([cam.fx / zg, zero,
                   -cam.fx * yk[:, 0] / (zg * zg) * zlive], axis=-1),
        jnp.stack([zero, cam.fy / zg,
                   -cam.fy * yk[:, 1] / (zg * zg) * zlive], axis=-1),
    ], axis=-2) * vis[:, None, None]                                # (K,2,3)

    jds = jnp.einsum("kca,ka->kc", p2, dyds[jids])[..., None]       # (K,2,1)
    jda = jnp.einsum("kca,kab->kcb", p2, dyda[jids])                # (K,2,3)
    jdt = p2                                                        # dy/dt = I
    jdth = jnp.einsum("kca,kjma->kcjm", p2, dydth[jids])            # (K,2,nJ-1,3)
    j_p = jnp.concatenate(
        [jds, jda, jdt, jdth.reshape(k_dim, 2, -1)], axis=-1)       # (K,2,P)
    if dydw is not None:
        j_w = jnp.einsum("kca,kas->kcs", p2, dydw[jids])            # (K,2,nS)
    else:
        j_w = jnp.zeros((k_dim, 2, n_s), dtype=wdt)
    return (res.reshape(-1),
            j_p.reshape(k_dim * 2, lay["total"]),
            j_w.reshape(k_dim * 2, n_s))
