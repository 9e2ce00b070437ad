"""Robust loss handling.

The reference wraps every keypoint residual block in ceres::HuberLoss(3.0)
(Sim3BA.h:407,570; MultiFrameBA.h:64). Our batched LM applies the robust
loss by iteratively-reweighted least squares (IRLS): each 2-row keypoint
block is scaled by sqrt(rho'(s)) with s = ||r||^2, the weights held fixed
within one LM step. This has the same stationary points as Ceres's
corrector (Ceres additionally applies a Triggs second-order term, which
changes step shape but not the optimum); documented deviation, covered by
the accuracy-parity benchmark.

Huber: rho(s) = s                    for s <= delta^2
       rho(s) = 2*delta*sqrt(s) - delta^2  otherwise
=> rho'(s) = min(1, delta / sqrt(s)).
"""

from __future__ import annotations

import jax.numpy as jnp


def huber_block_weights(res_blocks: jnp.ndarray, delta: float) -> jnp.ndarray:
    """sqrt(rho'(s)) per residual block.

    res_blocks: (..., B, R) residuals grouped in blocks of R rows.
    Returns (..., B) weights; multiply each block's residual AND Jacobian
    rows by its weight before forming normal equations.
    """
    s = jnp.sum(res_blocks * res_blocks, axis=-1)
    sqrt_s = jnp.sqrt(jnp.maximum(s, 1e-24))
    rho_prime = jnp.minimum(1.0, delta / sqrt_s)
    return jnp.sqrt(rho_prime)
