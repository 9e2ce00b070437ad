"""smpltpu — a TPU-native (JAX / XLA / Pallas) framework for fitting SMPL body
models to monocular-video 2D keypoints and rendering the result.

Re-designed from scratch with the capabilities of the reference C++/Ceres
pipeline jonH34400/3DBodyAnimation (see /root/repo/SURVEY.md), but built
TPU-first:

* the SMPL forward pass (shape blendshapes -> joint regression -> forward
  kinematics -> linear blend skinning) is a jit/vmap-clean JAX function
  (``smpltpu.models.smpl``) with a fused Pallas LBS kernel on the hot path;
* the Ceres Levenberg-Marquardt solvers (reference ``include/Sim3BA.h`` /
  ``include/MultiFrameBA.h``) are replaced by a batched on-device LM engine
  (``smpltpu.solve``) — residuals for *all* frames are assembled as dense
  masked tensors, Jacobians come from ``jax.jacfwd``, and the tiny per-frame
  normal equations are solved with ``jnp.linalg`` vmapped across frames;
* the multi-frame bundle adjustment (shared shape + temporal smoothness)
  uses a block-tridiagonal Thomas factorization plus a Schur complement on
  the shared shape block, and scales over a ``jax.sharding.Mesh`` with
  ``shard_map`` + ``psum``/``ppermute`` (``smpltpu.parallel``).

Layer map (mirrors SURVEY.md section 1):
  L0 model container + forward  -> smpltpu.models
  L1 costs & priors             -> smpltpu.energy
  L2 solvers                    -> smpltpu.solve
  L3 data IO                    -> smpltpu.io
  L4 renderer                   -> smpltpu.render
  L5 CLI drivers                -> smpltpu.pipeline
  L6-L8 tooling                 -> scripts/, data/scripts/
"""

__version__ = "0.1.0"

from smpltpu import constants  # noqa: F401
