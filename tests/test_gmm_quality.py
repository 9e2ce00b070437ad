"""End-to-end GMM-prior quality gate (VERDICT r3 #4).

The round-3 bench GMM row proved speed but not quality: its synthetic
motion GT sits far from the prior's modes at beta_pose=20, so the 18.8 px
residual could not detect a GMM regression. Designing a quality-sensitive
workload required understanding the reference objective first (measured
round 4, /tmp probes -> docs/ROADMAP.md GMM entry):

* The hard-assignment GMM energy (Sim3BA.h:275-284; our
  energy/priors.py) is PIECEWISE — each component owns a basin, and a
  solve can practically never switch basins: inside component k's
  selection region the prior's beta^2 * precision pull dwarfs the data
  gradient, so the zero-pose init converges to a balance point inside
  whatever basin it started in (Ceres re-picks the component per
  Evaluate exactly the same way and shares the pathology).
* At the CLI-default beta_pose=20 the component constants c_k
  (-log w_k + 0.5 logdet cov_k, spread ~0-43 nats across the vendored
  SMPLify prior) are scaled by beta^2 = 400: parking in the dominant
  (argmin c_k) component's basin and eating tens of px of data error is
  GENUINELY CHEAPER than fitting the data in a non-dominant component's
  basin. GT poses from non-dominant components are unrecoverable BY THE
  OBJECTIVE, not by the solver (measured: GT at component 3's mean,
  global optimum parks in component 1's basin at 33 px).

So the quality-sensitive workload is: GT sampled near the DOMINANT
component's mean (prior and data agree there), fitted with prior-seeded
multi-start (make_start_set(pose_seeds=means) — the SMPLify recipe; a
plain cold solve starts in whatever basin contains aa=0 and stalls
there). On that workload a correct GMM lands within ~1 px of the same
data fitted under the default L2 prior; a whitening / component-selection
/ means-parse regression moves the balance point or seeds wrong basins
and opens the gap. The bench mirror is BENCH_SINGLE_GMM=1.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smpltpu.constants import N_KP_SLOTS, USE_SMPL, init_root_rotation
from smpltpu.energy import skeleton_joints_cam
from smpltpu.energy.params import init_frame_params
from smpltpu.energy.reproj import project
from smpltpu.io.gmm import load_pose_prior_txt
from smpltpu.models import SMPLModel, make_synthetic_model
from smpltpu.solve import (
    best_of_starts,
    build_fitter,
    build_px_eval,
    make_single_frame_problem,
    make_start_set,
)
from smpltpu.utils import default_intrinsics

PRIOR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "avatar-model", "pose_prior.txt")

F_DIM = 8


def _modal_workload(gmm_d, spec, cam, f_dim=F_DIM, disp=0.3, seed=11):
    """GT near the prior's dominant component; exact projections."""
    c_k = (-np.log(np.asarray(gmm_d["weights"]))
           + 0.5 * np.asarray(gmm_d["logdet_cov"]))
    top = int(np.argmin(c_k))
    rng = np.random.default_rng(seed)
    ell = np.linalg.cholesky(np.asarray(gmm_d["covs"], np.float64))[top]
    aa = (np.asarray(gmm_d["means"], np.float64)[top]
          + disp * (ell @ rng.normal(size=(ell.shape[-1], f_dim))).T)
    gt = np.tile(np.asarray(init_frame_params(dtype=jnp.float64)),
                 (f_dim, 1))
    gt[:, 4:6] = rng.normal(size=(f_dim, 2)) * 0.1
    gt[:, 6] = 3.2
    gt[:, 7:] = aa
    uv = np.asarray(jax.jit(jax.vmap(
        lambda p: project(skeleton_joints_cam(
            p, jnp.zeros(10, jnp.float64), spec), cam)))(jnp.asarray(gt)))
    kp = np.zeros((f_dim, N_KP_SLOTS, 4))
    kp[:, :, 0] = USE_SMPL
    kp[:, :, 1:3] = uv[:, USE_SMPL]
    kp[:, :, 3] = 1.0
    return gt, kp


def _fit_ms(prob, kp, cam, pose_seeds=None, max_iters=60):
    fit = build_fitter(prob, max_iters=max_iters, dtype=jnp.float64)
    starts = make_start_set(kp, prob.spec, cam, pose_seeds=pose_seeds)
    f_dim, s_dim = starts.shape[:2]
    st = fit(jnp.asarray(starts.reshape(f_dim * s_dim, -1)),
             jnp.asarray(np.repeat(kp, s_dim, axis=0)))
    xb, _, _ = best_of_starts(st, f_dim, s_dim)
    return np.asarray(build_px_eval(prob)(
        jnp.asarray(xb), jnp.asarray(kp)))


@pytest.mark.skipif(not os.path.isfile(PRIOR), reason="prior not vendored")
def test_gmm_fit_matches_l2_on_modal_workload():
    gmm_d = load_pose_prior_txt(PRIOR)
    model = SMPLModel.from_dict(make_synthetic_model(), dtype=jnp.float64)
    cam = default_intrinsics(720, 1280)
    r0 = init_root_rotation()

    prob_gmm = make_single_frame_problem(
        model, r0, cam, beta_pose=20.0, beta_shape=30.0,
        gmm_dict=gmm_d, dtype=jnp.float64)
    prob_l2 = make_single_frame_problem(
        model, r0, cam, beta_pose=20.0, beta_shape=30.0,
        dtype=jnp.float64)
    _, kp = _modal_workload(gmm_d, prob_gmm.spec, cam)

    px_g = _fit_ms(prob_gmm, kp, cam,
                   pose_seeds=np.asarray(gmm_d["means"]))
    px_l = _fit_ms(prob_l2, kp, cam)

    # the gate: with GT near the dominant mode and prior-seeded starts,
    # the GMM prior must AGREE with the data — within ~1 px of the L2
    # fit and itself a good fit on every frame
    assert px_g.mean() < px_l.mean() + 1.0, (px_g, px_l)
    assert px_g.mean() < 3.0, px_g
    assert px_g.max() < 6.0, px_g


@pytest.mark.skipif(not os.path.isfile(PRIOR), reason="prior not vendored")
def test_gmm_prior_seeding_required():
    """The negative control pinning WHY the gate uses prior-seeded starts:
    the same workload fitted from the standard (yaw-only) start set stalls
    in whatever component basin contains the zero pose — the piecewise
    objective documented in the module docstring. If this ever starts
    PASSING at ~L2 quality from yaw starts alone, the seeding machinery
    (and the bench row's config) can be simplified."""
    gmm_d = load_pose_prior_txt(PRIOR)
    model = SMPLModel.from_dict(make_synthetic_model(), dtype=jnp.float64)
    cam = default_intrinsics(720, 1280)
    prob = make_single_frame_problem(
        model, init_root_rotation(), cam, beta_pose=20.0, beta_shape=30.0,
        gmm_dict=gmm_d, dtype=jnp.float64)
    _, kp = _modal_workload(gmm_d, prob.spec, cam, f_dim=4)
    px = _fit_ms(prob, kp, cam)        # no pose seeds
    assert px.mean() > 6.0, px
