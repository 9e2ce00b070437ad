"""Online (streaming/causal) fitting: solve/online.py + pipeline/stream.py.

The reference has no streaming mode (it preloads the whole video,
src/main_multi_frame.cpp:72-77) — these tests pin the framework extension's
own contracts: untethered step == single-frame solve, tracking on smooth
synthetic motion, hold-on-empty-frame, calibration, and the CLI surface.

Local fixed-seed rngs (not the session fixture) keep every test's data
independent of suite ordering; all FK/projection evaluations go through
one jitted batched projector per spec (CLAUDE.md: never eager-dispatch the
FK chain in tests).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smpltpu.constants import (
    FIXED_JOINTS_POSE_ONLY,
    N_KP_SLOTS,
    USE_SMPL,
    init_root_rotation,
)
from smpltpu.energy import pack_frame_params, skeleton_joints_cam
from smpltpu.energy.params import FrameParams, init_frame_params
from smpltpu.energy.reproj import project
from smpltpu.models import SMPLModel
from smpltpu.solve import fit_frames, make_single_frame_problem
from smpltpu.solve.online import OnlineConfig, OnlineFitter
from smpltpu.utils import default_intrinsics

W, H = 720, 1280

_proj_cache: dict = {}


def _projector(spec, cam):
    """One jitted vmapped (params, shape) -> uv projector per spec."""
    key = (id(spec), id(cam))
    if key not in _proj_cache:
        _proj_cache[key] = (spec, cam, jax.jit(jax.vmap(
            lambda p, w: project(skeleton_joints_cam(p, w, spec), cam))))
    return _proj_cache[key][2]


def _gt_stream(seed, n_frames, dtype=jnp.float64):
    """Smoothly drifting ground-truth packed params (order-independent)."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(23, 3)) * 0.12
    for j in FIXED_JOINTS_POSE_ONLY:
        base[j - 1] = 0.0
    drift = rng.normal(size=(23, 3)) * 0.004
    return jnp.stack([pack_frame_params(FrameParams(
        scale=jnp.asarray(1.0, dtype),
        root_aa=jnp.asarray([0.002 * f, -0.001 * f, 0.0], dtype),
        root_t=jnp.asarray([0.1 + 0.002 * f, -0.1, 3.2], dtype),
        joint_aa=jnp.asarray(base + f * drift, dtype)))
        for f in range(n_frames)])


def _kp_batch_from(gts, shapes, spec, cam):
    """(F, K, 4) dense keypoints projected from GT params, one jitted call."""
    uv = np.asarray(_projector(spec, cam)(gts, shapes))
    f = uv.shape[0]
    kp = np.zeros((f, N_KP_SLOTS, 4))
    kp[:, :, 0] = USE_SMPL
    kp[:, :, 1:3] = uv[:, USE_SMPL]
    kp[:, :, 3] = 1.0
    return kp


@pytest.fixture(scope="module")
def online_rig(small_model_dict):
    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float64)
    cam = default_intrinsics(W, H, dtype=jnp.float64)
    return model, cam


def test_untethered_step_equals_single_frame(online_rig):
    """lambda_t=0, has_prev=0, shape=0 -> the step IS the single-frame
    pose-only solve (extra tether rows are identically zero residual AND
    Jacobian). Two differently-compiled programs of the same objective:
    trajectories agree up to fp reassociation, so compare the reached
    optima (same convention as tests/test_parallel.py)."""
    model, cam = online_rig
    gts = _gt_stream(seed=7, n_frames=1)
    cfg = OnlineConfig(beta_pose=1.0, lambda_temporal=0.0, max_iters=120,
                       freeze_scale=False)
    fit = OnlineFitter(model, cam, cfg, dtype=jnp.float64)
    kp = _kp_batch_from(gts, jnp.zeros((1, 10)), fit.spec, cam)[0]
    x_online, res = fit.step(kp)
    assert res is not None

    prob = make_single_frame_problem(model, init_root_rotation(), cam,
                                     beta_pose=1.0, dtype=jnp.float64)
    st = fit_frames(prob, init_frame_params(dtype=jnp.float64)[None],
                    jnp.asarray(kp)[None], max_iters=120)
    np.testing.assert_allclose(float(res.cost), float(st.cost[0]), rtol=1e-6)
    # param tolerance 5e-3: with freeze_scale=False the scale<->depth
    # direction is a near-gauge (documented in solve/multi_frame.py) —
    # the cost agrees to 1e-6 while iterates sit ~1e-3 apart along that
    # flat axis; the branchy chol TR safeguards make the two programs'
    # last accepted steps differ there (fp reassociation amplified)
    np.testing.assert_allclose(x_online, np.asarray(st.x[0]),
                               rtol=5e-3, atol=5e-3)


def test_online_tracks_smooth_motion(online_rig):
    """Warm-started causal solves track a drifting pose at low iteration
    budget; warm starts converge (iters_run well below the cold frame)."""
    model, cam = online_rig
    n = 8
    gts = _gt_stream(seed=11, n_frames=n)
    cfg = OnlineConfig(beta_pose=1.0, lambda_temporal=1.0, max_iters=80)
    fit = OnlineFitter(model, cam, cfg, dtype=jnp.float64)
    kps = _kp_batch_from(gts, jnp.zeros((n, 10)), fit.spec, cam)
    xs, iters = [], []
    for f in range(n):
        x, res = fit.step(kps[f])
        xs.append(x)
        iters.append(int(res.iters_run))
    uv = np.asarray(_projector(fit.spec, cam)(
        jnp.asarray(np.stack(xs)), jnp.zeros((n, 10))))
    errs = np.linalg.norm(uv[:, USE_SMPL] - kps[:, :, 1:3], axis=-1).mean(1)
    # frame 0 is a cold single-frame fit; subsequent frames start warm
    assert errs[0] < 2.0, errs
    assert errs[1:].max() < 2.0, errs
    assert np.mean(iters[1:]) < iters[0], (
        f"warm starts should need fewer iterations: {iters}")


def test_empty_frame_holds_previous(online_rig):
    model, cam = online_rig
    gts = _gt_stream(seed=13, n_frames=2)
    fit = OnlineFitter(model, cam,
                       OnlineConfig(beta_pose=1.0, max_iters=40),
                       dtype=jnp.float64)
    kps = _kp_batch_from(gts, jnp.zeros((2, 10)), fit.spec, cam)
    x1, res1 = fit.step(kps[0])
    assert res1 is not None
    empty = np.zeros((N_KP_SLOTS, 4))
    empty[:, 0] = USE_SMPL
    x2, res2 = fit.step(empty)
    assert res2 is None
    np.testing.assert_array_equal(x1, x2)
    # stream resumes cleanly after the gap
    x3, res3 = fit.step(kps[1])
    assert res3 is not None and np.all(np.isfinite(x3))


def test_calibration_recovers_shape_and_seeds_stream(online_rig):
    """calibrate() runs the shared-shape multi-frame fit on the buffer:
    shape becomes finite & non-trivial under a shaped GT, prev is seeded,
    solve-only timing is recorded, and subsequent steps use the locked
    shape."""
    model, cam = online_rig
    rng = np.random.default_rng(17)
    gt_shape = jnp.asarray(rng.normal(size=10) * 0.5)
    gts = _gt_stream(seed=17, n_frames=5)
    fit = OnlineFitter(model, cam,
                       OnlineConfig(beta_pose=1.0, max_iters=60),
                       dtype=jnp.float64)
    shp = jnp.tile(gt_shape, (5, 1))
    kps = _kp_batch_from(gts, shp, fit.spec, cam)
    calib_params = fit.calibrate(kps[:4], max_iters=80, beta_shape=1.0)
    assert calib_params.shape == (4, 76)
    assert fit.has_prev == 1.0
    assert fit.last_calib_ms > 0.0
    assert np.all(np.isfinite(np.asarray(fit.shape)))
    # the buffer's observations carry shape information, so the calibrated
    # shape must move off zero
    assert np.linalg.norm(np.asarray(fit.shape)) > 1e-3
    x, res = fit.step(kps[4])
    assert res is not None and np.all(np.isfinite(x))


def test_stream_cli(tmp_path, rng):
    """End-to-end CLI on a synthetic on-disk dataset: log.csv schema,
    params npz (held rows keep a valid pose), skip-empty-frame, latency
    report."""
    from smpltpu.pipeline import stream as stream_cli
    from test_pipeline import _make_dataset

    model_path, kp_dir, img_dir = _make_dataset(tmp_path, rng,
                                                empty_frames=(2,))
    out_dir = str(tmp_path / "out_stream")
    rc = stream_cli.main([model_path, kp_dir, img_dir, out_dir,
                          "12", "1.0", "1.0", "--calib", "2"])
    assert rc == 0
    log = open(os.path.join(out_dir, "log.csv")).read().splitlines()
    assert log[0] == "frame,mean_pixel_error_px,time_ms"
    frames_logged = [int(r.split(",")[0]) for r in log[1:]]
    assert 2 not in frames_logged          # empty frame skipped
    assert len(frames_logged) == 6          # 7 frames - 1 empty
    errs = [float(r.split(",")[1]) for r in log[1:]]
    assert max(errs) < 25.0, errs
    dat = np.load(os.path.join(out_dir, "params_stream.npz"))
    assert dat["params"].shape[0] == 7
    assert list(dat["calib_frames"]) == [0, 1]
    # the skipped frame's npz row HOLDS the previous pose (scale stays a
    # valid body, never the zero row of a never-written slot)
    assert not dat["emitted"][2]
    np.testing.assert_array_equal(dat["params"][2], dat["params"][1])


def test_stream_cli_usage_and_parse():
    from smpltpu.pipeline import stream as stream_cli

    assert stream_cli.main([]) == 0  # usage, reference-style rc 0
    opts = stream_cli.parse_args(
        ["m", "k", "i", "o", "30", "--calib", "5", "2.5", "--free-scale",
         "0.5", "--render"])
    assert opts["max_iters"] == 30 and opts["calib"] == 5
    assert opts["beta_pose"] == 2.5 and opts["lambda_t"] == 0.5
    assert opts["freeze_scale"] is False and opts["render"] is True


def test_scan_replay_matches_stepwise(online_rig):
    """build_online_scan is the SAME recursion as step-by-step streaming:
    whole-chain lax.scan params match the per-frame loop (f64, tight),
    empty frames hold in-graph exactly like the host-side skip, and the
    fitter state advances to the end of the sequence."""
    model, cam = online_rig
    n = 6
    gts = _gt_stream(seed=23, n_frames=n)
    cfg = OnlineConfig(beta_pose=1.0, lambda_temporal=1.0, max_iters=40)
    fit_loop = OnlineFitter(model, cam, cfg, dtype=jnp.float64)
    kps = _kp_batch_from(gts, jnp.zeros((n, 10)), fit_loop.spec, cam)
    kps[2, :, 1:] = 0.0                      # empty frame mid-stream

    loop_out = [fit_loop.step(kps[f]) for f in range(n)]
    xs_loop = np.stack([p for p, _ in loop_out])
    conv_loop = [r is not None and bool(r.converged) for _, r in loop_out]

    fit_scan = OnlineFitter(model, cam, cfg, dtype=jnp.float64)
    xs, solved, costs, iters, conv = fit_scan.replay(kps)

    np.testing.assert_array_equal(
        solved, [True, True, False, True, True, True])
    np.testing.assert_array_equal(xs[2], xs[1])   # in-graph hold
    assert costs[2] == 0.0 and iters[2] == 0
    # per-frame LM convergence flags match the stepwise loop (held
    # frames report False)
    np.testing.assert_array_equal(conv, conv_loop)
    np.testing.assert_allclose(xs, xs_loop, rtol=1e-9, atol=1e-10)
    # state advanced: a follow-up per-frame step starts warm from frame n-1
    np.testing.assert_array_equal(np.asarray(fit_scan.prev), xs[-1])
    assert fit_scan.has_prev == 1.0 and fit_scan.n_seen == n


def test_stream_cli_scan(tmp_path, rng):
    """--scan drives the causal-replay path end-to-end: same skip/log
    semantics as the per-frame loop, amortized time_ms, held npz rows."""
    from smpltpu.pipeline import stream as stream_cli
    from test_pipeline import _make_dataset

    model_path, kp_dir, img_dir = _make_dataset(tmp_path, rng,
                                                empty_frames=(2,))
    out_dir = str(tmp_path / "out_stream_scan")
    rc = stream_cli.main([model_path, kp_dir, img_dir, out_dir,
                          "12", "1.0", "1.0", "--calib", "2", "--scan"])
    assert rc == 0
    log = open(os.path.join(out_dir, "log.csv")).read().splitlines()
    assert log[0] == "frame,mean_pixel_error_px,time_ms"
    frames_logged = [int(r.split(",")[0]) for r in log[1:]]
    assert 2 not in frames_logged and len(frames_logged) == 6
    errs = [float(r.split(",")[1]) for r in log[1:]]
    assert max(errs) < 25.0, errs
    dat = np.load(os.path.join(out_dir, "params_stream.npz"))
    assert not dat["emitted"][2]
    np.testing.assert_array_equal(dat["params"][2], dat["params"][1])
    opts = stream_cli.parse_args(["m", "k", "i", "o", "--scan"])
    assert opts["scan"] is True and opts["warm_timing"] is False

    # --warm-timing re-runs the compiled scan for compile-excluded time_ms
    # and must emit IDENTICAL params (deterministic solve)
    out_dir2 = str(tmp_path / "out_stream_scan_warm")
    rc = stream_cli.main([model_path, kp_dir, img_dir, out_dir2,
                          "12", "1.0", "1.0", "--calib", "2", "--scan",
                          "--warm-timing"])
    assert rc == 0
    dat2 = np.load(os.path.join(out_dir2, "params_stream.npz"))
    np.testing.assert_array_equal(dat2["params"], dat["params"])
    np.testing.assert_array_equal(dat2["emitted"], dat["emitted"])


def test_pump_matches_step(online_rig):
    """OnlinePump (VERDICT r3 #2: the device-resident io_callback request
    pump) runs the SAME per-frame recursion as OnlineFitter.step inside
    ONE persistent dispatch: params/cost/solved match the per-dispatch
    loop frame for frame (f64, tight), empty frames hold in-graph, and
    stop() shuts the device loop down cleanly with the final state
    readable off the pump."""
    model, cam = online_rig
    n = 6
    gts = _gt_stream(seed=31, n_frames=n)
    cfg = OnlineConfig(beta_pose=1.0, lambda_temporal=1.0, max_iters=40)
    fit_loop = OnlineFitter(model, cam, cfg, dtype=jnp.float64)
    kps = _kp_batch_from(gts, jnp.zeros((n, 10)), fit_loop.spec, cam)
    kps[2, :, 1:] = 0.0                      # empty frame mid-stream

    loop_out = [fit_loop.step(kps[f]) for f in range(n)]
    xs_loop = np.stack([p for p, _ in loop_out])
    costs_loop = [float(r.cost) if r is not None else 0.0
                  for _, r in loop_out]

    fit_pump = OnlineFitter(model, cam, cfg, dtype=jnp.float64)
    pump = fit_pump.make_pump().start(
        fit_pump.prev, fit_pump.shape, fit_pump.has_prev)
    xs_pump, costs_pump, solved_pump = [], [], []
    for f in range(n):
        x, cost, _iters, solved = pump.submit(kps[f])
        xs_pump.append(x)
        costs_pump.append(cost)
        solved_pump.append(solved)
    pump.stop()

    np.testing.assert_array_equal(
        solved_pump, [True, True, False, True, True, True])
    np.testing.assert_array_equal(xs_pump[2], xs_pump[1])  # in-graph hold
    assert costs_pump[2] == 0.0
    np.testing.assert_allclose(np.stack(xs_pump), xs_loop,
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(costs_pump, costs_loop, rtol=1e-9)
    # final state readable after shutdown (the dispatch returned)
    np.testing.assert_allclose(pump.prev, xs_loop[-1], rtol=1e-9,
                               atol=1e-10)
    assert pump.has_prev == 1.0


def test_probe_io_callback_cpu(monkeypatch):
    """The pump-availability probe must report True on a backend that
    services host callbacks (CPU). The probe runs a SUBPROCESS inheriting
    os.environ; pop PYTHONPATH so the axon sitecustomize cannot latch the
    remote-TPU backend there (CLAUDE.md: the env var alone does not
    override a latched platform), and pin JAX_PLATFORMS=cpu explicitly —
    conftest already exports it, but the probe's correctness should not
    depend on import order."""
    monkeypatch.delenv("PYTHONPATH", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    from smpltpu.solve.online import probe_io_callback

    assert probe_io_callback(timeout=120.0)
