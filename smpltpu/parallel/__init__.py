"""Multi-chip scaling (SURVEY.md section 2.4: the reference has no
distributed layer — its concurrency is Ceres threads + OpenMP; here the
frame/window batch shards across a jax.sharding.Mesh over ICI)."""

from smpltpu.parallel.mesh import frames_mesh, shard_frames  # noqa: F401
from smpltpu.parallel.sharded import (  # noqa: F401
    build_sharded_lm_fitter,
    sharded_frame_fit,
    sharded_gn_step,
    sharded_window_fit,
)
