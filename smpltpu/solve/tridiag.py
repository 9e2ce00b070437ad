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
import numpy as np
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


def block_tridiag_solve_cr(
    diag_blocks: jnp.ndarray,   # (F, P, P) SPD diagonal blocks D_f
    off_scale: jnp.ndarray,     # (F-1,) scalars c_f
    off_mask: jnp.ndarray,      # (P,) diagonal mask m (E_f = c_f * diag(m))
    rhs: jnp.ndarray,           # (F, P, R) right-hand sides
) -> jnp.ndarray:
    """Same system as block_tridiag_solve, solved by block CYCLIC
    REDUCTION: each level eliminates all ODD-indexed blocks with ONE
    batched Cholesky and recurses on the evens — ceil(log2 F) sequential
    batched factorizations instead of ~2F sequential small ones.
    Round-2 profiling: the Thomas scan's sequential factorization steps
    are 21 of the 24 ms/LM-iteration on the bench workload while TPU
    batched-Cholesky cost is nearly batch-size independent at P = 76, so
    fewer, fatter levels win. Off-diagonal couplers densify to general
    (P, P) blocks after the first level.

    Row i of the system: E_{i-1}^T x_{i-1} + D_i x_i + E_i x_{i+1} = b_i
    with E_i coupling (i, i+1); initially E_i = c_i * diag(m).
    """
    p = diag_blocks.shape[-1]
    dtype = diag_blocks.dtype
    e0 = off_scale[:, None, None] * jnp.diag(off_mask)[None]  # (F-1, P, P)

    def mm(a, b):
        return jnp.einsum("npq,nqr->npr", a, b)

    def t(a):
        return jnp.swapaxes(a, -1, -2)

    def level(d, e, b):
        n = d.shape[0]
        if n == 1:
            return _solve(_chol(d[0]), b[0])[None]

        zero = jnp.zeros((1, p, p), dtype)
        e_l = jnp.concatenate([zero, e])        # e_l[i] = E_{i-1}
        e_r = jnp.concatenate([e, zero])        # e_r[i] = E_i

        odd = np.arange(1, n, 2)
        even = np.arange(0, n, 2)
        n_o, n_e = len(odd), len(even)

        # one batched factorization of every odd block; solve against the
        # stacked [E_{i-1}^T | E_i | b_i] block row
        r_dim = b.shape[-1]
        stack = jnp.concatenate([t(e_l[odd]), e_r[odd], b[odd]], axis=-1)
        sol = _solve(_chol(d[odd]), stack)      # (n_o, P, 2P+R)
        gl = sol[:, :, :p]                      # D_i^{-1} E_{i-1}^T
        gr = sol[:, :, p:2 * p]                 # D_i^{-1} E_i
        gb = sol[:, :, 2 * p:]                  # D_i^{-1} b_i

        # odd neighbors of even j: below = (j-1)//2, above = j//2 (indices
        # into the odd arrays); out-of-range gathers are masked because the
        # padded couplers e_l[0] / e_r[n-1] are exactly zero
        below = np.clip((even - 1) // 2, 0, n_o - 1)
        above = np.clip(even // 2, 0, n_o - 1)

        el_e = e_l[even]                        # E_{j-1}
        er_e = e_r[even]                        # E_j
        d_new = (d[even]
                 - mm(t(el_e), gr[below])
                 - mm(er_e, gl[above]))
        b_new = (b[even]
                 - mm(t(el_e), gb[below])
                 - mm(er_e, gb[above]))
        # coupler between even j and even j+2 (k = j//2): -E_j GR_{j+1}
        if n_e > 1:
            ks = np.arange(n_e - 1)
            e_new = -mm(er_e[ks], gr[ks])
        else:
            e_new = jnp.zeros((0, p, p), dtype)

        x_even = level(d_new, e_new, b_new)     # (n_e, P, R)

        # back-substitute the odds: x_i = GB_i - GL_i x_{i-1} - GR_i x_{i+1}
        xm = x_even[np.clip((odd - 1) // 2, 0, n_e - 1)]
        xp = x_even[np.clip((odd + 1) // 2, 0, n_e - 1)]
        x_odd = gb - mm(gl, xm) - mm(gr, xp)

        out = jnp.zeros((n,) + b.shape[1:], dtype)
        out = out.at[even].set(x_even).at[odd].set(x_odd)
        return out

    return level(diag_blocks, e0, rhs)
