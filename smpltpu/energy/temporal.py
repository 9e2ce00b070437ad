"""First-order temporal smoothness.

Replaces ``Vec3DiffCost`` (include/MultiFrameBA.h:20-28): r = w * (a - b)
on consecutive frames' rootT, rootAA and every non-root jointAA — i.e. on
every packed frame-parameter dim EXCEPT scale (the reference never couples
scale temporally, MultiFrameBA.h:126-140).

TPU-first: instead of 3-vector pairs, one masked diff over the whole
(F, P) parameter tensor; the residual is linear, so its normal-equation
contribution (a block-tridiagonal lambda^2 * M stencil) is added
analytically in the multi-frame solver rather than autodiffed.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from smpltpu.energy.params import frame_param_layout


def temporal_mask(n_joints: int, dtype=jnp.float32) -> jnp.ndarray:
    """(P,) mask of dims coupled by temporal smoothness: everything except
    scale (index 0)."""
    p = frame_param_layout(n_joints)["total"]
    m = np.ones(p, dtype=np.float64)
    m[0] = 0.0
    return jnp.asarray(m, dtype=dtype)


def temporal_residuals(params: jnp.ndarray, lam: jnp.ndarray,
                       n_joints: int) -> jnp.ndarray:
    """params: (F, P). Returns ((F-1) * P,) masked diffs lam*(p_f - p_{f+1})."""
    mask = temporal_mask(n_joints, params.dtype)
    diff = (params[:-1] - params[1:]) * mask
    return (lam * diff).reshape(-1)
