"""Camera intrinsics heuristic.

Parity: src/main_single_frame.cpp:172-176 and src/main_multi_frame.cpp:60-61
— f = 0.9 * max(W, H), fx = fy = f, principal point at the image center.
"""

from __future__ import annotations

import jax.numpy as jnp

from smpltpu.constants import FOCAL_FACTOR
from smpltpu.energy.reproj import Camera


def default_intrinsics(width: int, height: int, dtype=jnp.float32) -> Camera:
    f = FOCAL_FACTOR * max(width, height)
    return Camera(
        fx=jnp.asarray(f, dtype),
        fy=jnp.asarray(f, dtype),
        cx=jnp.asarray(0.5 * width, dtype),
        cy=jnp.asarray(0.5 * height, dtype),
    )
