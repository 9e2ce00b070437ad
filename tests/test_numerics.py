"""Numerical-robustness tests (SURVEY.md section 5 sanitizer row: JAX's
functional core replaces TSan; jax_debug_nans guards the solves) and the
f32-vs-f64 verification mode (the Ceres baseline is f64; the 1% accuracy
budget is checked by running the same fit in both precisions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smpltpu.constants import init_root_rotation
from smpltpu.energy.params import init_frame_params
from smpltpu.models import SMPLModel
from smpltpu.solve import fit_frames, make_single_frame_problem
from smpltpu.utils import default_intrinsics
from tests.test_single_frame_solver import (
    H,
    W,
    make_gt_params,
    project_gt_keypoints,
)


def test_solver_nan_free_under_debug_nans(small_model_dict, rng):
    """The whole batched LM program must not produce NaNs even on frames
    with zero keypoints (masked rows) — run under jax_debug_nans."""
    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float64)
    cam = default_intrinsics(W, H, dtype=jnp.float64)
    prob = make_single_frame_problem(model, init_root_rotation(), cam,
                                     beta_pose=1.0, dtype=jnp.float64)
    gt = make_gt_params(rng)
    kp_good = project_gt_keypoints(gt, jnp.zeros(10), prob.spec, cam)
    kp = np.stack([kp_good, np.zeros_like(kp_good)])  # one empty frame
    kp[1, :, 0] = kp_good[:, 0]
    x0 = jnp.tile(init_frame_params(dtype=jnp.float64), (2, 1))
    with jax.debug_nans(True):
        state = fit_frames(prob, x0, jnp.asarray(kp), max_iters=30)
    assert bool(jnp.all(jnp.isfinite(state.x)))


def test_f32_matches_f64_within_budget(small_model_dict, rng):
    """f32 (TPU production dtype) vs f64 (Ceres-equivalent verification
    mode): final mean pixel residual must agree within the 1% parity budget
    (BASELINE.md accuracy target)."""
    from smpltpu.energy import skeleton_joints_cam
    from smpltpu.energy.reproj import project
    from smpltpu.constants import USE_SMPL

    results = {}
    for dtype in (jnp.float32, jnp.float64):
        model = SMPLModel.from_dict(small_model_dict, dtype=dtype)
        cam = default_intrinsics(W, H, dtype=dtype)
        prob = make_single_frame_problem(model, init_root_rotation(), cam,
                                         beta_pose=1.0, dtype=dtype)
        f = 4
        rng_local = np.random.default_rng(11)
        gts = [make_gt_params(rng_local, dtype=jnp.float64) for _ in range(f)]
        kps = np.stack([project_gt_keypoints(
            jnp.asarray(g, jnp.float64), jnp.zeros(10), prob.spec, cam)
            for g in gts])
        kps[:, :, 1:3] += rng_local.normal(size=(f, 17, 2))  # 1px noise
        x0 = jnp.tile(init_frame_params(dtype=dtype), (f, 1))
        # 200 iterations: the budget compares CONVERGED optima (at 100 the
        # corrected-residual LM is still descending and the two precisions'
        # trajectories differ more than the converged optima do)
        state = fit_frames(prob, x0, jnp.asarray(kps, dtype), max_iters=200)
        errs = []
        for i in range(f):
            uv = np.asarray(project(skeleton_joints_cam(
                state.x[i], jnp.zeros(10, dtype), prob.spec), cam))
            errs.append(np.linalg.norm(
                uv[USE_SMPL] - kps[i, :, 1:3], axis=-1).mean())
        results[jnp.dtype(dtype).name] = float(np.mean(errs))
    f32, f64 = results["float32"], results["float64"]
    assert abs(f32 - f64) <= 0.01 * max(f64, 1.0), results
