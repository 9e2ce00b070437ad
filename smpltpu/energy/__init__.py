"""Cost functions & priors (reference layer L1: include/Sim3BA.h:22-346,
include/MultiFrameBA.h:20-28) as batched, masked JAX residual builders."""

from smpltpu.energy.params import (  # noqa: F401
    FrameParams,
    N_FRAME_PARAMS,
    pack_frame_params,
    unpack_frame_params,
    frame_param_layout,
)
from smpltpu.energy.reproj import (  # noqa: F401
    Camera,
    SkeletonSpec,
    make_skeleton_spec,
    skeleton_joints_cam,
    keypoint_residuals,
    project,
)
from smpltpu.energy.priors import (  # noqa: F401
    GMMPrior,
    gmm_pose_prior_residual,
    l2_pose_prior_residual,
    shape_prior_residual,
)
from smpltpu.energy.robust import huber_block_weights  # noqa: F401
from smpltpu.energy.temporal import temporal_residuals  # noqa: F401
