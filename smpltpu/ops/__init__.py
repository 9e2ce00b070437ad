"""Hand-written TPU kernels (Pallas) for the hot ops."""

from smpltpu.ops.lbs import lbs_pallas, prepare_lbs_operands  # noqa: F401
