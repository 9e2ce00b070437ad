"""fused_cost=True (one residual evaluation per LM iteration, assembly
carried in the while_loop state) must be cost-identical to the two-eval
loop: the candidate cost read off the corrected-residual assembly equals
cost_fn to float roundoff, so the accept/reject trajectory is the same."""

import jax.numpy as jnp
import numpy as np

from smpltpu.constants import init_root_rotation
from smpltpu.energy import make_skeleton_spec, skeleton_joints_cam
from smpltpu.energy.params import init_frame_params
from smpltpu.energy.reproj import project
from smpltpu.io.keypoints import USE_SMPL
from smpltpu.models import SMPLModel
from smpltpu.models.synthetic import make_synthetic_model
from smpltpu.solve import MultiFrameConfig, build_multi_fitter
from smpltpu.utils import default_intrinsics


def _problem(rng, f=5, dtype=jnp.float64):
    model = SMPLModel.from_dict(make_synthetic_model(n_verts=150, seed=0),
                                dtype=dtype)
    cam = default_intrinsics(128, 160, dtype=dtype)
    spec = make_skeleton_spec(model, init_root_rotation(), with_shape=True)
    gt_shape = jnp.asarray(rng.normal(size=10) * 0.5).astype(dtype)
    base = rng.normal(size=(23, 3)) * 0.1
    gt, kp = [], []
    for i in range(f):
        p = np.array(init_frame_params(dtype=dtype))
        p[4:7] = [0.05 * i, 0.0, 3.0]
        p[7:] = (base + 0.02 * i).ravel()
        gt.append(p)
        joints = skeleton_joints_cam(jnp.asarray(p, dtype), gt_shape, spec)
        uv = np.asarray(project(joints, cam))
        k = np.zeros((17, 4))
        k[:, 0] = USE_SMPL
        k[:, 1:3] = uv[USE_SMPL] + rng.normal(size=(17, 2))
        k[:, 3] = 1.0
        kp.append(k)
    p0 = jnp.tile(init_frame_params(dtype=dtype), (f, 1))
    r0 = jnp.tile(jnp.asarray(init_root_rotation(), dtype), (f, 1, 1))
    return spec, cam, jnp.asarray(np.stack(kp), dtype), p0, r0


def test_fused_matches_two_eval_f64(rng):
    """f64: identical trajectory — same cost history, same optimum, same
    accepted-step count (the fused cost equals cost_fn to roundoff, so
    every accept/reject decision matches at f64 precision)."""
    spec, cam, kp, p0, r0 = _problem(rng)
    outs = {}
    for fused in (False, True):
        cfg = MultiFrameConfig(beta_pose=2.0, beta_shape=10.0,
                               lambda_temporal=2.0, max_iters=40,
                               linear="tridiag", fused_cost=fused)
        fit = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float64)
        outs[fused] = fit(p0, jnp.zeros(10, jnp.float64), kp, r0)
    np.testing.assert_allclose(float(outs[True].cost),
                               float(outs[False].cost), rtol=1e-9)
    assert int(outs[True].n_accepted) == int(outs[False].n_accepted)
    np.testing.assert_allclose(np.asarray(outs[True].params),
                               np.asarray(outs[False].params),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(outs[True].cost_history),
                               np.asarray(outs[False].cost_history),
                               rtol=1e-7)


def test_fused_with_pcg_f32(rng):
    """f32 + pcg (the production bench config): same basin, cost within
    the project's tolerance (float reassociation can flip borderline
    accepts, so bitwise equality is not required at f32)."""
    spec, cam, kp, p0, r0 = _problem(rng, dtype=jnp.float32)
    outs = {}
    for fused in (False, True):
        cfg = MultiFrameConfig(beta_pose=2.0, beta_shape=10.0,
                               lambda_temporal=2.0, max_iters=40,
                               linear="pcg", cg_iters=48, fused_cost=fused)
        fit = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float32)
        outs[fused] = fit(p0, jnp.zeros(10, jnp.float32), kp, r0)
    np.testing.assert_allclose(float(outs[True].cost),
                               float(outs[False].cost), rtol=5e-3)


def test_fused_with_jvp_assembly(rng):
    """The jvp assembly path's with_cost branch (||corrected r||^2) also
    agrees with cost_fn through the fused loop."""
    spec, cam, kp, p0, r0 = _problem(rng, f=3)
    cfg = MultiFrameConfig(beta_pose=2.0, beta_shape=10.0,
                           lambda_temporal=2.0, max_iters=25,
                           linear="tridiag", fused_cost=True, jacobian="jvp")
    cfg_ref = cfg._replace(fused_cost=False, jacobian="analytic")
    fit = build_multi_fitter(spec, cam, cfg, 10, dtype=jnp.float64)
    fit_ref = build_multi_fitter(spec, cam, cfg_ref, 10, dtype=jnp.float64)
    a = fit(p0, jnp.zeros(10, jnp.float64), kp, r0)
    b = fit_ref(p0, jnp.zeros(10, jnp.float64), kp, r0)
    np.testing.assert_allclose(float(a.cost), float(b.cost), rtol=1e-9)
