"""L2 pose-prior pathology at high articulation (round-5 oracle probe).

The 1000-frame bench workload triangle-folds a motion ramp whose tail GT
reaches ||joint_aa|| ~ 22 (bench.py workload synthesis). This file pins
the measured fact that explains the single-frame rows' ~13-14 px plateau
there (BASELINE round-5): at ANY beta_pose >= 5 the reference objective's
GLOBAL optimum abandons the pose — the beta^2 * ||aa||^2 prior dwarfs
the Huber data term (which grows only linearly in pixel error), so a
zero-pose "crushed" fit at ~14 px data error costs LESS than the exact
GT fit. Measured on the numpy oracle (tests/oracle_ref.py, the Ceres
functor semantics): beta=20 -> cost 98k at GT vs 3.4k crushed; beta=5 ->
6.2k vs 3.4k; beta=0 -> GT optimal.

Consequences pinned elsewhere:
  * no solver, multi-start, orientation estimate or temporal propagation
    can (or should) reach GT there — they would be raising the objective
    (fit_adaptive's phase P correctly refuses: it adopts only
    cost-improving results);
  * the two-stage pipeline's 1.32 px on the same frames is the GT-BASIN
    LOCAL optimum preserved by warm-start chaining (anchors ->
    interpolation -> windows), not the objective's global preference;
  * same structure as the round-4 GMM finding (component constants
    dominating at beta=20, tests/test_gmm_quality.py) — for the L2 prior.
"""

import numpy as np

from tests.oracle_ref import OracleProblem, single_frame_cost

from smpltpu.constants import N_KP_SLOTS, USE_SMPL, init_root_rotation
from smpltpu.models import make_synthetic_model
from smpltpu.utils import default_intrinsics


def _ramp_tail_rig():
    rng = np.random.default_rng(0)
    md = make_synthetic_model()
    cam = default_intrinsics(720, 1280)
    prob = OracleProblem(md, np.asarray(init_root_rotation(), np.float64),
                         cam, with_shape=False)
    # the bench workload's synthesis at motion phase ~900 (bench.py)
    base = rng.normal(size=(23, 3)) * 0.15
    drift = rng.normal(size=(23, 3)) * 0.003
    ph = 900.0
    gt = np.zeros(76)
    gt[0] = 1.0
    gt[1], gt[2] = 2e-3 * ph, 1e-3 * ph
    gt[4], gt[5], gt[6] = 0.1 + 1e-3 * ph, -0.1, 3.2
    gt[7:] = (base + ph * drift).ravel()
    kp = np.zeros((N_KP_SLOTS, 4))
    kp[:, 0] = USE_SMPL
    kp[:, 3] = 1.0
    for i, jid in enumerate(USE_SMPL):
        p = prob.chain_point(int(jid), gt, None)
        kp[i, 1] = prob.fx * p[0] / p[2] + prob.cx
        kp[i, 2] = prob.fy * p[1] / p[2] + prob.cy
    kp[:, 1:3] += rng.normal(size=(N_KP_SLOTS, 2))
    return prob, gt, kp


def test_high_amplitude_tail_prior_prefers_crushed_pose():
    prob, gt, kp = _ramp_tail_rig()
    assert np.linalg.norm(gt[7:]) > 15.0  # the tail really is extreme
    w = np.zeros(10)
    crushed = np.concatenate([gt[:7], np.zeros(69)])
    for beta in (20.0, 5.0):
        c_gt = single_frame_cost(prob, gt, w, kp, beta_pose=beta)
        c_cr = single_frame_cost(prob, crushed, w, kp, beta_pose=beta)
        # the GLOBAL preference: abandoning the pose beats fitting it
        assert c_cr < 0.6 * c_gt, (beta, c_gt, c_cr)
    # without the prior the data term rules and GT wins by orders
    c_gt0 = single_frame_cost(prob, gt, w, kp, beta_pose=0.0)
    c_cr0 = single_frame_cost(prob, crushed, w, kp, beta_pose=0.0)
    assert c_gt0 < 0.05 * c_cr0, (c_gt0, c_cr0)
