"""Closed-form geometric Jacobian (energy/jacobian.py) vs autodiff.

Pins, in float64:
  * keypoint_residuals_and_jacobian == (keypoint_residuals, jacfwd) to
    machine precision — with and without shape regressors, with masked
    rows, with an exactly-zero joint angle-axis (Taylor branch), and with
    a behind-camera joint (z-guard branch derivative);
  * the multi-frame fitter reaches the SAME optimum under
    jacobian="analytic" and jacobian="jvp" (the round-1 linearize + 86
    batched JVP pushes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smpltpu.constants import N_KP_SLOTS, USE_SMPL, init_root_rotation
from smpltpu.energy import keypoint_residuals, make_skeleton_spec, skeleton_joints_cam
from smpltpu.energy.jacobian import keypoint_residuals_and_jacobian
from smpltpu.energy.params import init_frame_params
from smpltpu.energy.reproj import Camera, project
from smpltpu.models import SMPLModel
from smpltpu.solve import MultiFrameConfig, build_multi_fitter
from smpltpu.utils import default_intrinsics


def _f64_spec(model, with_shape):
    spec = make_skeleton_spec(model, init_root_rotation(), with_shape=with_shape)
    return spec._replace(
        base_offsets=spec.base_offsets.astype(jnp.float64),
        r0=spec.r0.astype(jnp.float64),
        joint_shape_reg=(None if spec.joint_shape_reg is None
                         else spec.joint_shape_reg.astype(jnp.float64)))


@pytest.mark.parametrize("with_shape", [True, False])
def test_matches_jacfwd(small_model_dict, rng, with_shape):
    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float64)
    spec = _f64_spec(model, with_shape)
    cam = Camera(*[jnp.float64(c) for c in default_intrinsics(720, 1280)])

    p = np.array(init_frame_params(dtype=jnp.float64))
    p[0] = 1.15
    p[1:4] = rng.normal(size=3) * 0.3
    p[7:] = rng.normal(size=69) * 0.4
    p[10:13] = 0.0                       # exercise the J_r Taylor branch
    p = jnp.asarray(p)
    w = jnp.asarray(rng.normal(size=10) * 0.5)

    kp = np.zeros((N_KP_SLOTS, 4))
    kp[:, 0] = USE_SMPL
    kp[:, 1:3] = rng.normal(size=(N_KP_SLOTS, 2)) * 100 + 400
    kp[:, 3] = 1.0
    kp[3, 3] = 0.0                       # masked row -> zero residual+rows
    kp = jnp.asarray(kp)
    r0f = jnp.asarray(np.asarray(init_root_rotation(), np.float64))

    # jit with (cam, spec) in the closure — spec.parents is static numpy
    # (it shapes the unrolled FK chain); eager this test ran 15-19 s
    res_a, jp_a, jw_a = jax.jit(
        lambda a, b, c, d: keypoint_residuals_and_jacobian(
            a, b, c, cam, spec, d))(p, w, kp, r0f)

    def f(q, v):
        return keypoint_residuals(q, v, kp, cam, spec, r0f)

    res_r = f(p, w)
    jp_r = jax.jit(jax.jacfwd(f, argnums=0))(p, w)
    jw_r = jax.jit(jax.jacfwd(f, argnums=1))(p, w)
    np.testing.assert_allclose(res_a, res_r, atol=1e-12)
    np.testing.assert_allclose(jp_a, jp_r, atol=1e-10)
    np.testing.assert_allclose(jw_a, jw_r, atol=1e-10)
    # masked row contributes nothing
    assert float(jnp.abs(jp_a.reshape(-1, 2, 76)[3]).max()) == 0.0


def test_z_guard_branch(small_model_dict, rng):
    """A joint pushed behind the z-guard must keep the finite where-branch
    derivative autodiff produces (zero dz column), not the 1/z form."""
    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float64)
    spec = _f64_spec(model, False)
    cam = Camera(*[jnp.float64(c) for c in default_intrinsics(720, 1280)])
    p = np.array(init_frame_params(dtype=jnp.float64))
    p[6] = 0.0                           # whole skeleton at z ~ 0
    p = jnp.asarray(p)
    w = jnp.zeros(10, jnp.float64)
    kp = np.zeros((N_KP_SLOTS, 4))
    kp[:, 0] = USE_SMPL
    kp[:, 3] = 1.0
    kp = jnp.asarray(kp)
    r0f = jnp.asarray(np.asarray(init_root_rotation(), np.float64))
    res_a, jp_a, jw_a = jax.jit(
        lambda a, b, c, d: keypoint_residuals_and_jacobian(
            a, b, c, cam, spec, d))(p, w, kp, r0f)

    def f(q, v):
        return keypoint_residuals(q, v, kp, cam, spec, r0f)

    jp_r = jax.jit(jax.jacfwd(f, argnums=0))(p, w)
    assert np.isfinite(np.asarray(jp_a)).all()
    np.testing.assert_allclose(jp_a, jp_r, atol=1e-8)


def test_padded_row_assembly_is_zero_f32(small_model_dict):
    """A padded frame (all-zero keypoints, default pose, identity R0) must
    assemble to EXACT zeros in float32 under both assembly paths.

    Regression: reverse-mode grad of huber_correct_weight's s<=delta^2
    guard divides by s_safe^2 = 1e-48, which underflows to 0 in f32 and
    yields 0/0 = NaN on masked rows — silently poisoning the sharded
    stage-1 psum (every step rejected). The analytic path must use the
    forward-mode derivative like the jvp path implicitly does."""
    from smpltpu.solve.multi_frame import corrected_frame_assembly

    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float32)
    spec = make_skeleton_spec(model, init_root_rotation(), with_shape=True)
    cam = default_intrinsics(720, 1280)
    p = jnp.asarray(init_frame_params(dtype=jnp.float32))
    w = jnp.zeros(10, jnp.float32)
    kp = jnp.zeros((N_KP_SLOTS, 4), jnp.float32)
    r0 = jnp.eye(3, dtype=jnp.float32)
    for jac in ("analytic", "jvp"):
        # jit (vs the eager dispatch this ran as at first): same f32
        # underflow semantics, ~30x faster and persistently cached
        fn = jax.jit(lambda a, b, c, d, _j=jac: corrected_frame_assembly(
            a, b, c, d, cam, spec, 3.0, jacobian=_j))
        out = fn(p, w, kp, r0)
        for name, t in zip(["h_pp", "b_pw", "h_ww", "g_p", "g_w"], out):
            arr = np.asarray(t)
            assert np.isfinite(arr).all(), (jac, name)
            assert np.abs(arr).max() == 0.0, (jac, name)


def test_fitter_optimum_matches_jvp(small_model_dict, rng):
    """build_multi_fitter(jacobian='analytic') == ...('jvp') optimum."""
    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float64)
    spec = _f64_spec(model, True)
    cam = default_intrinsics(720, 1280)
    f_dim = 6
    gt = np.tile(np.array(init_frame_params(dtype=jnp.float64)), (f_dim, 1))
    gt[:, 7:] += rng.normal(size=(f_dim, 69)) * 0.2
    r0c = np.asarray(init_root_rotation(), np.float64)
    camj = Camera(*[jnp.float64(c) for c in cam])
    uv = np.asarray(jax.vmap(lambda q: project(
        skeleton_joints_cam(q, jnp.zeros(10), spec), camj))(jnp.asarray(gt)))
    kp = np.zeros((f_dim, N_KP_SLOTS, 4))
    kp[:, :, 0] = USE_SMPL
    kp[:, :, 1:3] = uv[:, USE_SMPL] + rng.normal(
        size=(f_dim, N_KP_SLOTS, 2)) * 2.0
    kp[:, :, 3] = 1.0
    p0 = jnp.asarray(np.tile(
        np.asarray(init_frame_params(dtype=jnp.float64)), (f_dim, 1)))
    args = (p0, jnp.zeros(10, jnp.float64), jnp.asarray(kp),
            jnp.tile(jnp.asarray(r0c), (f_dim, 1, 1)))
    outs = {}
    for jac in ("jvp", "analytic"):
        cfg = MultiFrameConfig(beta_pose=5.0, beta_shape=25.0,
                               lambda_temporal=3.0, max_iters=15, jacobian=jac)
        outs[jac] = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float64)(*args)
    np.testing.assert_allclose(outs["jvp"].params, outs["analytic"].params,
                               atol=1e-9)
    np.testing.assert_allclose(float(outs["jvp"].cost),
                               float(outs["analytic"].cost), rtol=1e-12)
