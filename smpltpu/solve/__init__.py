"""Optimization entry points (reference layer L2: the Ceres solves in
include/Sim3BA.h:348-683 and include/MultiFrameBA.h:33-177), rebuilt as a
batched on-device Levenberg-Marquardt engine."""

from smpltpu.solve.init import (  # noqa: F401
    AdaptiveResult,
    aa_from_rotation,
    aa_from_rotation_batch,
    best_of_starts,
    build_px_eval,
    estimate_frame_init,
    estimate_frame_init_batch,
    estimate_root_orient,
    estimate_root_orient_batch,
    fit_adaptive,
    make_start_set,
    rotation_from_aa,
    rotation_from_aa_batch,
)
from smpltpu.solve.lm import LMConfig, LMState, lm_solve  # noqa: F401
from smpltpu.solve.multi_frame import (  # noqa: F401
    MultiFrameConfig,
    MultiFrameState,
    build_chunked_window_fit,
    build_multi_fitter,
    fit_multi_frame,
)
from smpltpu.solve.online import (  # noqa: F401
    OnlineConfig,
    OnlineFitter,
    OnlinePump,
    build_online_scan,
    build_online_step,
)
from smpltpu.solve.single_frame import (  # noqa: F401
    SingleFrameProblem,
    build_fitter,
    fit_frames,
    make_single_frame_problem,
)
from smpltpu.solve.two_stage import build_fused_two_stage  # noqa: F401
