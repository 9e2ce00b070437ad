"""Pose and shape priors.

Replaces the reference's analytic Ceres cost functions
``PosePriorAAAnalytic`` (include/Sim3BA.h:245-320) and
``ShapePriorL2Analytic`` (include/Sim3BA.h:323-346).

GMM residual contract: the reference delegates to
``ark::GaussianMixture::residual(x, &compIdx)`` from the avatar submodule,
which is NOT checked out in the reference repo — only its interface is
documented (Sim3BA.h:246-249,257,278-301): a (3*nJ + 1)-row residual,
"already whitened by component precision", with a hard (per-evaluation)
component assignment, last row a mixture constant, and Jacobian blocks read
from the chosen component's precision Cholesky L (Precision = L @ L.T).
We therefore re-derive the standard SMPLify-style formulation and document
it as THIS framework's contract:

  component:  k* = argmin_k [ 0.5*||L_k^T (x - mu_k)||^2 + c_k ],
              c_k = -log(weight_k) + 0.5*logdet(cov_k)
  residual:   r = beta * [ L_{k*}^T (x - mu_{k*}) ;  sqrt(2*(c_{k*} - min_k c_k)) ]

so that 0.5*||r||^2 = beta^2 * (negative log-likelihood of the chosen
component + a global constant), the constant row is sqrt-safe, and the
Jacobian (holding k* fixed, as the reference does at Sim3BA.h:286-299) is
beta * L_{k*}^T — which jax.jacfwd produces automatically because argmin
is piecewise constant.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class GMMPrior(NamedTuple):
    means: jnp.ndarray       # (K, D)
    prec_cho: jnp.ndarray    # (K, D, D), lower L with Precision = L @ L.T
    const: jnp.ndarray       # (K,) c_k = -log w_k + 0.5 logdet cov_k, min-shifted
    beta: jnp.ndarray        # scalar weight (betaPose)

    @classmethod
    def from_dict(cls, d: dict, beta: float, dtype=jnp.float32) -> "GMMPrior":
        c = -jnp.log(jnp.asarray(d["weights"])) + 0.5 * jnp.asarray(d["logdet_cov"])
        c = c - jnp.min(c)
        return cls(
            means=jnp.asarray(d["means"], dtype=dtype),
            prec_cho=jnp.asarray(d["prec_cho"], dtype=dtype),
            const=jnp.asarray(c, dtype=dtype),
            beta=jnp.asarray(beta, dtype=dtype),
        )


def gmm_pose_prior_residual(joint_aa_flat: jnp.ndarray, prior: GMMPrior) -> jnp.ndarray:
    """(D+1,) whitened GMM residual over the stacked non-root angle-axes
    x in R^{3*(nJ-1)} (D = 69 for SMPL)."""
    x = joint_aa_flat
    diff = x[None, :] - prior.means                      # (K, D)
    white = jnp.einsum("kdr,kd->kr", prior.prec_cho, diff)  # L^T (x-mu), (K, D)
    nll = 0.5 * jnp.sum(white * white, axis=-1) + prior.const
    k = jnp.argmin(nll)
    const_row = jnp.sqrt(2.0 * prior.const[k] + 1e-20)
    return prior.beta * jnp.concatenate([white[k], const_row[None]])


def l2_pose_prior_residual(joint_aa_flat: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """L2 fallback (no GMM): r = beta * x, D rows, no constant row
    (Sim3BA.h:281-284 'else' branch; also the multi-frame BA's per-frame
    prior, which always passes gmm=nullptr, MultiFrameBA.h:109)."""
    return beta * joint_aa_flat


def shape_prior_residual(shape: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """L2 shape prior r = betaShape * w (Sim3BA.h:331-343)."""
    return beta * shape
