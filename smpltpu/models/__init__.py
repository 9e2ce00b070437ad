"""Body-model runtime (reference layer L0: the `avatar` submodule's
ark::AvatarModel / ark::Avatar, re-designed as functional JAX)."""

from smpltpu.models.smpl import SMPLModel, smpl_forward, rodrigues  # noqa: F401
from smpltpu.models.synthetic import make_synthetic_model, make_synthetic_gmm  # noqa: F401
