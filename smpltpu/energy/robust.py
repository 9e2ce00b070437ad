"""Robust loss handling.

The reference wraps every keypoint residual block in ceres::HuberLoss(3.0)
(Sim3BA.h:407,570; MultiFrameBA.h:64).

ROUND-2 STATUS: the production solvers no longer use the IRLS weight
sqrt(rho'(s)) from this module — they linearize the CORRECTED residual
c = sqrt(rho(s)/s) * r with the weight INSIDE the trace
(solve/lm.py::huber_correct_weight), so ||c||^2 == rho exactly and the
Jacobian carries the loss curvature. Round-2 finding: the stop-gradient
IRLS weight (equivalent to Ceres's corrector, which zeroes its
second-order term for Huber's rho'' < 0 region) crawls on cold-init real
data where every block sits deep in the L1-like regime. This module
remains the documented reference formulation of the Huber pieces and the
home of the standalone weight helper used in tests.

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
