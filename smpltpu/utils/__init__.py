"""Shared utilities: camera heuristics, evaluation metric, parameter
write-back, CSV logging."""

from smpltpu.utils.camera import default_intrinsics  # noqa: F401
from smpltpu.utils.metrics import mean_pixel_error  # noqa: F401
from smpltpu.utils.writeback import params_to_pose  # noqa: F401
