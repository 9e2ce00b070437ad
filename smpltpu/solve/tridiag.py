"""Block-tridiagonal symmetric positive-definite solver (Thomas / block
Cholesky elimination) via lax.scan.

This is the TPU-native replacement for the linear-solve inside the
reference's multi-frame Ceres problem (include/MultiFrameBA.h:145-151,
DENSE_QR over ALL frames' parameters jointly): the temporal smoothness
terms (MultiFrameBA.h:121-142) couple only CONSECUTIVE frames, so the
pose-pose block of the normal equations is block-tridiagonal —
O(F * P^3) by elimination instead of O((F*P)^3) dense. The shared shape
block is handled by a Schur complement on top (see multi_frame.py).

Off-diagonal blocks here are scaled diagonal matrices E_f = c_f * diag(m)
(the temporal stencil: m masks out the scale dim, c_f carries
-lambda^2 * pair-validity), which is what the temporal term produces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve


def _chol(a):
    c, _ = cho_factor(a, lower=False)
    return c


def _solve(fac, b):
    return cho_solve((fac, False), b)


def block_tridiag_solve(
    diag_blocks: jnp.ndarray,   # (F, P, P) SPD diagonal blocks D_f
    off_scale: jnp.ndarray,     # (F-1,) scalars c_f
    off_mask: jnp.ndarray,      # (P,) diagonal mask m (E_f = c_f * diag(m))
    rhs: jnp.ndarray,           # (F, P, R) right-hand sides
) -> jnp.ndarray:
    """Solve the block-tridiagonal SPD system T x = rhs. Returns (F, P, R).

    Forward block elimination (Schur complements) then back-substitution,
    each a lax.scan of tiny dense Cholesky ops — sequential over frames but
    each step is one (P, P) factorization, negligible at P=76.
    """
    p = diag_blocks.shape[-1]
    mm = off_mask[:, None] * off_mask[None, :]  # (P, P)
    eye = jnp.eye(p, dtype=diag_blocks.dtype)

    def fwd(carry, inp):
        fac_prev, z_prev = carry
        d_f, c_f, r_f = inp
        # S_f = D_f - c^2 * diag(m) S_prev^{-1} diag(m)
        s_inv = _solve(fac_prev, eye)
        s_f = d_f - (c_f * c_f) * (s_inv * mm)
        # z_f = r_f - c * diag(m) S_prev^{-1} z_prev
        z_f = r_f - c_f * off_mask[:, None] * _solve(fac_prev, z_prev)
        fac_f = _chol(s_f)
        return (fac_f, z_f), (fac_f, z_f)

    fac_0 = _chol(diag_blocks[0])
    (_, _), (facs, zs) = jax.lax.scan(
        fwd, (fac_0, rhs[0]),
        (diag_blocks[1:], off_scale, rhs[1:]))
    facs = jnp.concatenate([fac_0[None], facs])  # (F, P, P)
    zs = jnp.concatenate([rhs[0][None], zs])     # (F, P, R)

    # back-substitution: x_{F-1} = S^{-1} z; x_f = S_f^{-1}(z_f - E_f x_{f+1})
    x_last = _solve(facs[-1], zs[-1])

    def bwd(x_next, inp):
        fac_f, z_f, c_f = inp
        x_f = _solve(fac_f, z_f - c_f * off_mask[:, None] * x_next)
        return x_f, x_f

    _, xs_rev = jax.lax.scan(
        bwd, x_last,
        (facs[:-1][::-1], zs[:-1][::-1], off_scale[::-1]))
    return jnp.concatenate([xs_rev[::-1], x_last[None]])
