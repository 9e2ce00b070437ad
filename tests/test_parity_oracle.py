"""Solver-optimum parity against the independent CPU oracle (VERDICT
round-1 item 2).

The accuracy budget (BASELINE.json: final mean pixel error within 1% of
the Ceres baseline) is pinned here against tests/oracle_ref.py — an
independent numpy implementation of the reference objective exactly as
the Ceres functors define it (per-keypoint chain walk, Sim3BA.h:34-88),
minimized with scipy.optimize.least_squares.

Two layers of assertion:

1. FORMULATION parity — the oracle's chain-walk residuals equal the
   repo's whole-skeleton-FK residuals to f64 roundoff at random points,
   with and without shape. This proves both code bases implement the
   same objective.

2. OPTIMUM parity (local-optimality certificate) — for every solver
   surface (single-frame pose / pose+shape / GMM-with-the-REAL-prior,
   multi-frame window on real video1 keypoints), scipy started AT the
   repo solver's optimum must fail to improve the true objective by more
   than 1%, and the mean pixel error at both points must agree within
   1%. This is the honest version of the budget: the cold-start BASIN a
   nonconvex fit lands in is solver-dependent (scipy TRF, MINPACK LM and
   Ceres-style LM all reach different optima from the reference's blind
   init — measured during round 2), so parity is asserted on "every
   optimum we return is a genuine optimum of the reference objective",
   plus a fit-quality bound on the real fixture.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from smpltpu.constants import FIXED_JOINTS_POSE_ONLY, init_root_rotation
from smpltpu.energy import keypoint_residuals, make_skeleton_spec
from smpltpu.energy.params import init_frame_params
from smpltpu.io.gmm import load_pose_prior_txt
from smpltpu.io.keypoints import load_keypoint_dir
from smpltpu.models import SMPLModel
from smpltpu.solve import (
    MultiFrameConfig,
    best_of_starts,
    build_fitter,
    build_multi_fitter,
    make_single_frame_problem,
    make_start_set,
)
from smpltpu.utils import default_intrinsics
from tests import oracle_ref as ORC
from tests.conftest import fixture_path

VIDEO1 = fixture_path("data/keypoints/video1")
REAL_GMM = fixture_path("data/avatar-model/pose_prior.txt")
needs_fixture = pytest.mark.skipif(not os.path.isdir(VIDEO1),
                                   reason="video1 fixture unavailable")

# frames of the video1 fixture with detections (0000-0030 are empty)
FRAMES = [4, 12, 25]


@pytest.fixture(scope="module")
def rig(small_model_dict):
    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float64)
    cam = default_intrinsics(720, 1280, dtype=jnp.float64)
    cam_t = (float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy))
    r0 = np.asarray(init_root_rotation())
    kp = None
    if os.path.isdir(VIDEO1):
        kp, _ = load_keypoint_dir(VIDEO1, 720, 1280)
    return dict(md=small_model_dict, model=model, cam=cam, cam_t=cam_t,
                r0=r0, kp=kp)


def test_oracle_formulation_matches_energy(rig, rng):
    """Layer 1: identical residuals at random points (both the literal
    per-keypoint chain walk and the fast whole-skeleton path)."""
    md, model, cam, r0 = rig["md"], rig["model"], rig["cam"], rig["r0"]
    kp = np.zeros((17, 4))
    kp[:, 0] = [1, 2, 4, 5, 7, 8, 10, 11, 15, 16, 17, 18, 19, 20, 21, 0, 0]
    kp[:, 1:3] = 400 + 150 * rng.normal(size=(17, 2))
    kp[:, 3] = 1.0
    x = np.zeros(76)
    x[0] = 1.2
    x[1:4] = 0.2 * rng.normal(size=3)
    x[4:7] = [0.1, -0.05, 2.8]
    x[7:] = 0.3 * rng.normal(size=69)
    w = 0.5 * rng.normal(size=10)

    for with_shape in (False, True):
        spec = make_skeleton_spec(model, rig["r0"], with_shape=with_shape)
        ours = np.asarray(keypoint_residuals(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(kp), cam,
            spec)).reshape(-1, 2)
        prob = ORC.OracleProblem(md, rig["r0"], rig["cam_t"],
                                 with_shape=with_shape)
        walk = np.array([prob.project(prob.chain_point(int(kp[k, 0]), x, w))
                         - kp[k, 1:3] for k in range(17)])
        fast = prob.joints_cam_all(x, w)
        walk_fast = np.array([prob.project(fast[int(kp[k, 0])]) - kp[k, 1:3]
                              for k in range(17)])
        np.testing.assert_allclose(ours, walk, rtol=0, atol=1e-9)
        np.testing.assert_allclose(walk, walk_fast, rtol=0, atol=1e-9)


def _polish_improvement(c_ours, c_polished):
    return (c_ours - c_polished) / max(c_ours, 1e-12)


GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "data")


def _cached_polish(name, key, compute):
    """Memoize a scipy polish on the EXACT solver optimum it started from.

    The polishes dominate the suite's runtime (the 6-frame window TRF run
    alone is ~35 min: grouped finite differences over a 460-dim problem).
    Their inputs are fully deterministic (seeded synthetic model + the
    mounted video1 keypoints), so the optimum our solver returns moves
    ONLY when the solver changes. The committed golden npz stores
    {key_*: the optimum polished, val_*: scipy's result}; it is reused
    only when the current optimum matches the stored key to 1e-7 —
    otherwise the full scipy run happens live (still-correct slow path)
    and SMPLTPU_WRITE_GOLDEN=1 refreshes the file. Every ASSERTION stays
    live either way: costs/px errors are recomputed from the cached
    polished point, never cached themselves.
    """
    path = os.path.join(GOLDEN_DIR, f"oracle_golden_{name}.npz")
    if os.path.isfile(path):
        g = dict(np.load(path))
        if all(np.allclose(g["key_" + k], v, rtol=0, atol=1e-7)
               for k, v in key.items()):
            return {n[4:]: v for n, v in g.items() if n.startswith("val_")}
        import warnings
        warnings.warn(
            f"{path} is stale (solver optimum moved) — running the full "
            "scipy polish; refresh with SMPLTPU_WRITE_GOLDEN=1")
    out = compute()
    if os.environ.get("SMPLTPU_WRITE_GOLDEN"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez(path,
                 **{f"key_{k}": np.asarray(v) for k, v in key.items()},
                 **{f"val_{k}": np.asarray(v) for k, v in out.items()})
    return out


@needs_fixture
def test_single_frame_pose_certificate(rig):
    """Layer 2, pose-only path on real video1 keypoints: scipy polish
    from our optimum improves the true objective < 1%, px error agrees
    within 1%."""
    md, model, cam, r0, kp = (rig["md"], rig["model"], rig["cam"],
                              rig["r0"], rig["kp"])
    prob = make_single_frame_problem(model, r0, cam, beta_pose=2.0,
                                     dtype=jnp.float64)
    fit = build_fitter(prob, max_iters=150, dtype=jnp.float64)
    starts = make_start_set(kp[FRAMES], prob.spec, cam, orient=False)     # (F, S, 76)
    f_dim, s_dim = starts.shape[:2]
    kp_rep = np.repeat(kp[FRAMES], s_dim, axis=0)
    st = fit(jnp.asarray(starts.reshape(f_dim * s_dim, -1)),
             jnp.asarray(kp_rep))
    best_x, best_cost, _ = best_of_starts(st, f_dim, s_dim)

    prob_o = ORC.OracleProblem(md, r0, rig["cam_t"], with_shape=False)
    for k, i in enumerate(FRAMES):
        c_ours = ORC.single_frame_cost(prob_o, best_x[k], None, kp[i],
                                       beta_pose=2.0)
        # our jitted cost and the oracle's must agree (same objective)
        np.testing.assert_allclose(c_ours, best_cost[k], rtol=1e-8)
        xp = _cached_polish(
            f"single_pose_f{i}", dict(x=best_x[k]),
            lambda: dict(xp=ORC.fit_single_frame(
                prob_o, kp[i], best_x[k], beta_pose=2.0,
                frozen_joints=FIXED_JOINTS_POSE_ONLY, max_nfev=4000)[0]),
        )["xp"]
        c_pol = ORC.single_frame_cost(prob_o, xp, None, kp[i], beta_pose=2.0)
        imp = _polish_improvement(c_ours, c_pol)
        assert imp < 0.01, (i, c_ours, c_pol, imp)
        e_ours = prob_o.mean_px_error(best_x[k], None, kp[i])
        e_pol = prob_o.mean_px_error(xp, None, kp[i])
        assert abs(e_ours - e_pol) <= 0.01 * max(e_pol, 1e-9) + 1e-3, (
            i, e_ours, e_pol)


@needs_fixture
def test_single_frame_shape_certificate(rig):
    """Pose+shape path (ReprojCostShape objective) on one real frame."""
    md, model, cam, r0, kp = (rig["md"], rig["model"], rig["cam"],
                              rig["r0"], rig["kp"])
    i = FRAMES[0]
    prob = make_single_frame_problem(model, r0, cam, beta_pose=2.0,
                                     beta_shape=5.0, opt_shape=True,
                                     dtype=jnp.float64)
    fit = build_fitter(prob, max_iters=150, dtype=jnp.float64)
    # orient=False: these certificates pin the SOLVER against the scipy
    # oracle from a FIXED start set; the goldens are memoized on the
    # resulting optima, so the round-4 orientation-estimating start set
    # (covered by tests/test_orient_init.py) is disabled here.
    starts = make_start_set(kp[[i]], prob.spec, cam,
                            n_extra_dims=model.num_shapes, orient=False)
    s_dim = starts.shape[1]
    st = fit(jnp.asarray(starts[0]), jnp.asarray(np.repeat(kp[[i]], s_dim, 0)))
    best_xw, best_cost, _ = best_of_starts(st, 1, s_dim)
    x_ours, w_ours = best_xw[0, :76], best_xw[0, 76:]

    prob_o = ORC.OracleProblem(md, r0, rig["cam_t"], with_shape=True)
    c_ours = ORC.single_frame_cost(prob_o, x_ours, w_ours, kp[i],
                                   beta_pose=2.0, beta_shape=5.0,
                                   opt_shape=True)
    np.testing.assert_allclose(c_ours, best_cost[0], rtol=1e-8)
    def _polish():
        xp, wp = ORC.fit_single_frame(
            prob_o, kp[i], x_ours, beta_pose=2.0, beta_shape=5.0,
            shape0=w_ours, opt_shape=True, max_nfev=6000)
        return dict(xp=xp, wp=wp)

    pol = _cached_polish("single_shape", dict(x=x_ours, w=w_ours), _polish)
    xp, wp = pol["xp"], pol["wp"]
    c_pol = ORC.single_frame_cost(prob_o, xp, wp, kp[i], beta_pose=2.0,
                                  beta_shape=5.0, opt_shape=True)
    assert _polish_improvement(c_ours, c_pol) < 0.01, (c_ours, c_pol)


@needs_fixture
@pytest.mark.skipif(not os.path.isfile(REAL_GMM),
                    reason="real pose prior not mounted")
def test_single_frame_real_gmm_certificate(rig):
    """GMM path with the REFERENCE'S REAL 8x69 pose prior (VERDICT
    round-1 item 7: the near-singular covariances of real SMPLify GMMs
    are what synthetic fixtures miss)."""
    md, model, cam, r0, kp = (rig["md"], rig["model"], rig["cam"],
                              rig["r0"], rig["kp"])
    i = FRAMES[1]
    gd = load_pose_prior_txt(REAL_GMM)
    prob = make_single_frame_problem(model, r0, cam, beta_pose=2.0,
                                     gmm_dict=gd, dtype=jnp.float64)
    fit = build_fitter(prob, max_iters=150, dtype=jnp.float64)
    starts = make_start_set(kp[[i]], prob.spec, cam, orient=False)
    s_dim = starts.shape[1]
    st = fit(jnp.asarray(starts[0]), jnp.asarray(np.repeat(kp[[i]], s_dim, 0)))
    best_x, best_cost, _ = best_of_starts(st, 1, s_dim)

    gmm_o = ORC.OracleGMM(gd["weights"], gd["means"], gd["covs"])
    prob_o = ORC.OracleProblem(md, r0, rig["cam_t"], with_shape=False)
    c_ours = ORC.single_frame_cost(prob_o, best_x[0], None, kp[i],
                                   beta_pose=2.0, gmm=gmm_o)
    np.testing.assert_allclose(c_ours, best_cost[0], rtol=1e-6)
    xp = _cached_polish(
        "single_gmm", dict(x=best_x[0]),
        lambda: dict(xp=ORC.fit_single_frame(
            prob_o, kp[i], best_x[0], beta_pose=2.0,
            frozen_joints=FIXED_JOINTS_POSE_ONLY, gmm=gmm_o,
            max_nfev=4000)[0]),
    )["xp"]
    c_pol = ORC.single_frame_cost(prob_o, xp, None, kp[i], beta_pose=2.0,
                                  gmm=gmm_o)
    assert _polish_improvement(c_ours, c_pol) < 0.01, (c_ours, c_pol)


@needs_fixture
def test_multi_frame_window_certificate(rig):
    """Multi-frame BA window on real keypoints: scipy polish (shared
    shape + temporal terms, jac_sparsity-grouped) from our optimum
    improves < 1%."""
    md, model, cam, r0, kp = (rig["md"], rig["model"], rig["cam"],
                              rig["r0"], rig["kp"])
    frames = [4, 5, 7, 8, 9, 10]    # consecutive detected frames
    f_dim = len(frames)
    spec = make_skeleton_spec(model, r0, with_shape=True)
    cfg = MultiFrameConfig(beta_pose=5.0, beta_shape=25.0,
                           lambda_temporal=3.0, max_iters=200)
    fit = build_multi_fitter(spec, cam, cfg, model.num_shapes,
                             dtype=jnp.float64)
    p0 = jnp.tile(init_frame_params(dtype=jnp.float64), (f_dim, 1))
    r0b = np.tile(r0, (f_dim, 1, 1))
    res = fit(p0, jnp.zeros(model.num_shapes, jnp.float64),
              jnp.asarray(kp[frames]), jnp.asarray(r0b))
    xs_ours = np.asarray(res.params)
    w_ours = np.asarray(res.shape)

    prob_o = ORC.OracleProblem(md, r0, rig["cam_t"], with_shape=True)
    c_ours = ORC.multi_frame_cost(prob_o, xs_ours, w_ours, kp[frames], r0b,
                                  beta_pose=5.0, beta_shape=25.0,
                                  lambda_t=3.0)
    np.testing.assert_allclose(c_ours, float(res.cost), rtol=1e-8)
    def _polish():
        xsp, wp = ORC.fit_multi_frame(
            prob_o, kp[frames], xs_ours, w_ours, r0b, beta_pose=5.0,
            beta_shape=25.0, lambda_t=3.0, freeze_scale=True, max_nfev=3000)
        return dict(xsp=xsp, wp=wp)

    pol = _cached_polish("window", dict(xs=xs_ours, w=w_ours), _polish)
    xsp, wp = pol["xsp"], pol["wp"]
    c_pol = ORC.multi_frame_cost(prob_o, xsp, wp, kp[frames], r0b,
                                 beta_pose=5.0, beta_shape=25.0, lambda_t=3.0)
    assert _polish_improvement(c_ours, c_pol) < 0.01, (c_ours, c_pol)
    # px parity at the two optima
    e_ours = np.mean([prob_o.mean_px_error(xs_ours[f], w_ours, kp[frames[f]])
                      for f in range(f_dim)])
    e_pol = np.mean([prob_o.mean_px_error(xsp[f], wp, kp[frames[f]])
                     for f in range(f_dim)])
    assert abs(e_ours - e_pol) <= 0.01 * max(e_pol, 1e-9) + 1e-3


@needs_fixture
def test_online_frame_certificate(rig):
    """Streaming fixed point (VERDICT r3 #6): a streamed frame's optimum
    — the single-frame objective plus the temporal tether to the previous
    streamed optimum (solve/online.py) — is a genuine optimum of the same
    objective independently formulated: scipy polish started AT it (the
    tether row included, previous frame frozen exactly as the filter
    freezes it) improves the cost < 1%. Complements the replay==step
    equivalence tests with an INDEPENDENT-oracle certificate, like every
    offline surface has."""
    from smpltpu.solve import OnlineConfig, build_online_step

    md, model, cam, r0, kp = (rig["md"], rig["model"], rig["cam"],
                              rig["r0"], rig["kp"])
    ocfg = OnlineConfig(beta_pose=2.0, lambda_temporal=3.0, max_iters=150)
    spec = make_skeleton_spec(model, r0, with_shape=True)
    step = build_online_step(spec, cam, ocfg, model.num_joints,
                             dtype=jnp.float64)
    shape = jnp.zeros(model.num_shapes, jnp.float64)

    # frame 4 cold (has_prev=0), frame 5 tethered to frame 4's optimum —
    # the filter recursion exactly as OnlineFitter.step runs it
    x_init = init_frame_params(dtype=jnp.float64)
    r4 = step(x_init, shape, jnp.asarray(kp[4]), x_init,
              jnp.asarray(0.0, jnp.float64))
    r5 = step(r4.x, shape, jnp.asarray(kp[5]), r4.x,
              jnp.asarray(1.0, jnp.float64))
    x4 = np.asarray(r4.x)
    x5 = np.asarray(r5.x)

    prob_o = ORC.OracleProblem(md, r0, rig["cam_t"], with_shape=True)
    w0 = np.zeros(model.num_shapes)
    c_ours = ORC.online_frame_cost(prob_o, x5, w0, kp[5], x4, 1.0,
                                   beta_pose=2.0, lambda_t=3.0)
    # the jitted cost and the oracle's must agree (same objective)
    np.testing.assert_allclose(c_ours, float(r5.cost), rtol=1e-8)

    xp = _cached_polish(
        "online_f5", dict(x=x5, prev=x4),
        lambda: dict(xp=ORC.fit_online_frame(
            prob_o, kp[5], x5, x4, 1.0, shape=w0, beta_pose=2.0,
            lambda_t=3.0, frozen_joints=FIXED_JOINTS_POSE_ONLY,
            freeze_scale=True, max_nfev=4000)),
    )["xp"]
    c_pol = ORC.online_frame_cost(prob_o, xp, w0, kp[5], x4, 1.0,
                                  beta_pose=2.0, lambda_t=3.0)
    assert _polish_improvement(c_ours, c_pol) < 0.01, (c_ours, c_pol)
    e_ours = prob_o.mean_px_error(x5, w0, kp[5])
    e_pol = prob_o.mean_px_error(xp, w0, kp[5])
    assert abs(e_ours - e_pol) <= 0.01 * max(e_pol, 1e-9) + 1e-3, (
        e_ours, e_pol)


@needs_fixture
def test_fit_quality_on_fixture(rig):
    """Absolute fit-quality bound on the real fixture: the multi-start
    batched fit must land every test frame under 8 px mean error at
    720x1280 (the cold blind init of the reference leaves some frames an
    order of magnitude worse — this pins the data-driven-init +
    multi-start feature's value)."""
    md, model, cam, r0, kp = (rig["md"], rig["model"], rig["cam"],
                              rig["r0"], rig["kp"])
    prob = make_single_frame_problem(model, r0, cam, beta_pose=2.0,
                                     dtype=jnp.float64)
    fit = build_fitter(prob, max_iters=150, dtype=jnp.float64)
    starts = make_start_set(kp[FRAMES], prob.spec, cam, orient=False)
    f_dim, s_dim = starts.shape[:2]
    st = fit(jnp.asarray(starts.reshape(f_dim * s_dim, -1)),
             jnp.asarray(np.repeat(kp[FRAMES], s_dim, axis=0)))
    best_x, _, _ = best_of_starts(st, f_dim, s_dim)
    prob_o = ORC.OracleProblem(md, r0, rig["cam_t"], with_shape=False)
    errs = [prob_o.mean_px_error(best_x[k], None, kp[i])
            for k, i in enumerate(FRAMES)]
    assert max(errs) < 8.0, errs
