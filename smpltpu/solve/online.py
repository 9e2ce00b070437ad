"""Online (streaming / causal) fitting: one warm-started solve per frame.

Framework extension — the reference has no streaming mode: it preloads the
finished video (src/main_multi_frame.cpp:72-77) and batch-solves it. For a
live keypoint stream (the serving use case) the smoother must be CAUSAL:
each incoming frame is fitted with only past information, at per-frame
latency instead of per-video throughput.

Formulation: per frame, the single-frame objective (Huber keypoint
reprojection + pose prior, pose-only with shape HELD at its calibrated
value — the streaming analogue of stage-2's shape lock,
src/main_multi_frame.cpp:177-187) plus a temporal tether
``lambda_t * mask * (x - x_prev)`` to the previous fitted frame. That is
exactly one row of the multi-frame temporal stencil
(include/MultiFrameBA.h:121-142) with the earlier frame frozen — the
sliding-window smoother degenerated to a filter.

TPU-native design: the whole per-frame LM solve is ONE jitted dispatch
(convergence-exit while_loop, solve/lm.py), warm-started from the previous
optimum, all shapes static — per-frame latency is the dispatch floor plus
a handful of LM iterations, not a fresh trace/compile. Shape calibration
reuses the shared-shape multi-frame fitter on an initial buffer of frames
(the streaming analogue of stage-1 anchors).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from smpltpu.constants import (
    FIXED_JOINTS_POSE_ONLY,
    HUBER_DELTA,
    SCALE_MAX,
    SCALE_MIN,
    init_root_rotation,
)
from smpltpu.energy import (
    Camera,
    GMMPrior,
    SkeletonSpec,
    gmm_pose_prior_residual,
    keypoint_residuals,
    l2_pose_prior_residual,
    make_skeleton_spec,
)
from smpltpu.energy.params import frame_param_layout, init_frame_params
from smpltpu.energy.temporal import temporal_mask
from smpltpu.models.smpl import SMPLModel
from smpltpu.solve.lm import LMConfig, lm_solve


class OnlineConfig(NamedTuple):
    """Streaming-fit knobs (defaults mirror the multi CLI's stage-2:
    beta_pose=5, lambda_t=3, shape locked)."""

    beta_pose: float = 5.0
    lambda_temporal: float = 3.0
    max_iters: int = 20
    # gauge fix, same rationale as MultiFrameConfig.freeze_scale: the
    # temporal tether couples every dim EXCEPT scale, so a free per-frame
    # scale re-opens the scale/translation gauge the evaluation discards
    freeze_scale: bool = True
    huber_delta: float = HUBER_DELTA


def build_online_step(
    spec: SkeletonSpec,
    cam: Camera,
    cfg: OnlineConfig,
    n_joints: int,
    gmm: Optional[GMMPrior] = None,
    dtype=jnp.float32,
    jit: bool = True,
):
    """Return a jitted fn(x0 (P,), shape (nS,), kp (K,4), prev (P,),
    has_prev ()) -> LMResult fitting ONE frame. ``jit=False`` returns the
    raw traceable step (used by :func:`build_online_scan`).

    ``has_prev`` (0.0/1.0) gates the temporal tether so the first frame of
    a stream solves the plain single-frame problem; with
    ``lambda_temporal == 0`` the tether rows are identically zero (zero
    residual AND zero Jacobian), so the step is exactly the single-frame
    pose-only solve (pinned by tests/test_online.py).
    """
    lay = frame_param_layout(n_joints)
    p_dim = lay["total"]
    lower = np.full(p_dim, -np.inf)
    upper = np.full(p_dim, np.inf)
    lower[0], upper[0] = SCALE_MIN, SCALE_MAX
    frozen = np.zeros(p_dim, dtype=bool)
    if cfg.freeze_scale:
        frozen[0] = True
    # pose-only path: unobserved joints held constant (Sim3BA.h:607-611)
    for j in FIXED_JOINTS_POSE_ONLY:
        if j < n_joints:
            s = lay["joint_aa"][0] + 3 * (j - 1)
            frozen[s:s + 3] = True
    lower_j = jnp.asarray(lower, dtype)
    upper_j = jnp.asarray(upper, dtype)
    frozen_j = jnp.asarray(frozen)
    tmask = temporal_mask(n_joints, dtype)
    lam = jnp.asarray(cfg.lambda_temporal, dtype)
    bp = jnp.asarray(cfg.beta_pose, dtype)
    aa_slice = slice(lay["joint_aa"][0], lay["joint_aa"][1])
    lmcfg = LMConfig(max_iters=cfg.max_iters, huber_delta=cfg.huber_delta)

    def residual(x, shape, kp, prev, has_prev):
        r_kp = keypoint_residuals(x, shape, kp, cam, spec).reshape(-1, 2)
        plain = []
        if cfg.beta_pose > 0.0:
            joint_aa = x[aa_slice]
            if gmm is not None:
                plain.append(gmm_pose_prior_residual(joint_aa, gmm))
            else:
                plain.append(l2_pose_prior_residual(joint_aa, bp))
        plain.append(lam * has_prev * tmask * (x - prev))
        return r_kp, jnp.concatenate(plain)

    def step(x0, shape, kp, prev, has_prev):
        return lm_solve(
            lambda x: residual(x, shape, kp, prev, has_prev),
            x0, lmcfg, lower=lower_j, upper=upper_j, frozen=frozen_j)

    return jax.jit(step) if jit else step


def build_online_scan(
    spec: SkeletonSpec,
    cam: Camera,
    cfg: OnlineConfig,
    n_joints: int,
    gmm: Optional[GMMPrior] = None,
    dtype=jnp.float32,
):
    """Whole-stream causal replay: the per-frame online step scanned over
    the frame axis in ONE jitted dispatch.

    Same recursion as driving :func:`build_online_step` frame by frame
    (warm start + temporal tether to the previous optimum, shape locked),
    but the sequential dependency chain lives inside a ``lax.scan`` — so
    the per-frame cost on TPU is the LM solve alone, with no host
    round-trip between frames (the live-serving path pays a ~28 ms
    dispatch floor per frame through the tunnel; this is the causal
    THROUGHPUT number, and the true latency bound once a host loop runs
    chip-adjacent). Empty frames are held in-graph via ``lax.cond``
    (only the hold branch executes), matching OnlineFitter.step's
    host-side skip semantics: params hold at the previous frame, the
    tether gate is unchanged.

    Returns jitted ``fn(x0 (P,), shape (nS,), kp_seq (F, K, 4),
    has_prev0 ()) -> (xs (F, P), costs (F,), iters (F,), solved (F,),
    conv (F,))`` where ``conv`` is the per-frame LM convergence flag
    (False for held frames).
    """
    step = build_online_step(spec, cam, cfg, n_joints, gmm=gmm,
                             dtype=dtype, jit=False)

    def scan_fit(x0, shape, kp_seq, has_prev0):
        def body(carry, kp):
            prev, has_prev = carry

            def do(_):
                r = step(prev, shape, kp, prev, has_prev)
                return (r.x, r.cost.astype(dtype),
                        r.iters_run.astype(jnp.int32),
                        jnp.asarray(True), r.converged)

            def hold(_):
                return (prev, jnp.asarray(0.0, dtype),
                        jnp.asarray(0, jnp.int32), jnp.asarray(False),
                        jnp.asarray(False))

            valid = jnp.sum(kp[:, 3]) > 0.0
            x, cost, iters, solved, conv = jax.lax.cond(valid, do, hold, None)
            new_has = jnp.where(solved, jnp.asarray(1.0, dtype), has_prev)
            return (x, new_has), (x, cost, iters, solved, conv)

        (_, _), out = jax.lax.scan(
            body, (x0.astype(dtype), jnp.asarray(has_prev0, dtype)),
            kp_seq.astype(dtype))
        return out

    return jax.jit(scan_fit)


_PROBE_SRC = """
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import io_callback
out = jax.jit(lambda v: io_callback(
    lambda x: np.asarray(x), jax.ShapeDtypeStruct((1,), jnp.float32), v,
    ordered=True))(jnp.zeros(1, jnp.float32))
jax.block_until_ready(out)
print("io_callback_ok")
"""


def probe_io_callback(timeout: float = 60.0) -> bool:
    """True iff the environment's default backend delivers host callbacks.

    The axon remote-TPU tunnel executes compiled programs but never
    services io_callback host calls — a dispatch containing one hangs
    forever (measured 2026-08-20: a trivial ordered io_callback never
    returns; the same program is instant on CPU and on a co-located TPU
    runtime). OnlinePump is built on ordered io_callbacks, so callers
    (bench BENCH_STREAM_PUMP, stream CLI --pump) must gate on this probe
    instead of blocking a serving thread for the full submit timeout.

    The probe runs in a SUBPROCESS (inheriting the caller's env, so it
    tests the env-selected backend): a dispatch hung on an unserviced
    host call would otherwise queue-block every later launch from this
    process. The trivial program compiles sub-second everywhere; 60 s
    absorbs tunnel compile jitter."""
    import subprocess
    import sys

    try:
        r = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return False
    return "io_callback_ok" in r.stdout


class OnlinePump:
    """Device-resident request pump: the causal per-frame filter runs as
    ONE persistent dispatch, with keypoint frames fed from the host and
    fitted params streamed back through ordered ``io_callback``s.

    Why: the per-dispatch serving path (OnlineFitter.step) pays the full
    dispatch cost per frame — ~28 ms through the axon tunnel, where the
    dominant term is launching a new executable per request. Here ONE
    ``lax.while_loop`` program stays resident on the device; each
    iteration (a) pulls the next request from a host queue (ordered
    io_callback — BLOCKS device-side until a request arrives, which is
    exactly the serving idle state), (b) runs the identical warm-started
    LM step as OnlineFitter.step (same ``build_online_step`` recursion,
    pinned equal by tests/test_online.py::test_pump_matches_step), and
    (c) pushes the fitted params back. Per-frame cost = solve + two host
    round-trips, no executable launch, no argument staging.

    Empty frames (no valid detections) hold the previous pose in-graph
    via ``lax.cond`` — the same semantics as build_online_scan's hold
    branch. ``submit(None)``-style shutdown: ``stop()`` enqueues a
    sentinel; the device loop exits and the dispatch completes.

    The reference has no serving mode at all (it preloads the finished
    video, src/main_multi_frame.cpp:72-77) — this is the framework's
    serving extension, measured (BENCH_STREAM_PUMP=1) instead of
    projected (docs/SERVING.md round-3 design note)."""

    def __init__(
        self,
        spec: SkeletonSpec,
        cam: Camera,
        cfg: OnlineConfig,
        n_joints: int,
        n_kp_slots: int,
        gmm: Optional[GMMPrior] = None,
        dtype=jnp.float32,
    ):
        import queue

        self.dtype = dtype
        self.n_kp_slots = int(n_kp_slots)
        self._req: "queue.Queue" = queue.Queue()
        self._res: "queue.Queue" = queue.Queue()
        self._thread = None
        self._exc = None
        step = build_online_step(spec, cam, cfg, n_joints, gmm=gmm,
                                 dtype=dtype, jit=False)
        p_dim = frame_param_layout(n_joints)["total"]

        kp_struct = jax.ShapeDtypeStruct((self.n_kp_slots, 4), dtype)
        stop_struct = jax.ShapeDtypeStruct((), jnp.int32)

        def _fetch():
            item = self._req.get()
            if item is None:
                return (np.zeros((self.n_kp_slots, 4),
                                 jnp.dtype(dtype).name),
                        np.int32(1))
            return np.asarray(item, jnp.dtype(dtype).name), np.int32(0)

        def _push(x, cost, iters, solved, stop):
            if int(stop) == 0:
                self._res.put((np.asarray(x), float(cost), int(iters),
                               bool(solved)))

        from jax.experimental import io_callback

        def run(x0, shape, has_prev0):
            def cond(c):
                return c[2] == 0

            def body(c):
                prev, has_prev, _ = c
                kp, stop = io_callback(_fetch, (kp_struct, stop_struct),
                                       ordered=True)

                def do(_):
                    r = step(prev, shape, kp, prev, has_prev)
                    return (r.x, jnp.asarray(1.0, dtype),
                            r.cost.astype(dtype),
                            r.iters_run.astype(jnp.int32),
                            jnp.asarray(True))

                def hold(_):
                    return (prev, has_prev, jnp.asarray(0.0, dtype),
                            jnp.asarray(0, jnp.int32), jnp.asarray(False))

                valid = (stop == 0) & (jnp.sum(kp[:, 3]) > 0.0)
                x, has2, cost, iters, solved = jax.lax.cond(
                    valid, do, hold, None)
                io_callback(_push, None, x, cost, iters, solved, stop,
                            ordered=True)
                return (x, has2, stop)

            x, has, _ = jax.lax.while_loop(
                cond, body,
                (x0.astype(dtype), jnp.asarray(has_prev0, dtype),
                 jnp.asarray(0, jnp.int32)))
            return x, has

        self._run = jax.jit(run)
        self._p_dim = p_dim
        self.prev = None
        self.has_prev = 0.0

    def start(self, x0, shape, has_prev: float = 0.0):
        """Launch the persistent dispatch (returns immediately; the device
        loop blocks on the request queue)."""
        import threading

        x0 = jnp.asarray(x0, self.dtype)
        shape = jnp.asarray(shape, self.dtype)

        def _worker():
            try:
                out = self._run(x0, shape, has_prev)
                self.prev = np.asarray(out[0])
                self.has_prev = float(out[1])
            except BaseException as e:  # surfaced by submit()/stop()
                self._exc = e
                self._res.put(None)

        self._thread = threading.Thread(target=_worker, daemon=True)
        self._thread.start()
        return self

    def submit(self, kp_dense, timeout: float = 300.0):
        """Feed one (K, 4) frame; block for its result. Returns
        (params (P,) np, cost, iters, solved) — solved=False means the
        frame had no valid detections and the pose held."""
        if self._thread is None:
            raise RuntimeError("pump not started")
        self._req.put(np.asarray(kp_dense))
        out = self._res.get(timeout=timeout)
        if out is None:
            raise RuntimeError("pump dispatch failed") from self._exc
        return out

    def stop(self, timeout: float = 300.0):
        """Shut the device loop down and join the dispatch."""
        if self._thread is not None:
            self._req.put(None)
            self._thread.join(timeout=timeout)
            self._thread = None
        if self._exc is not None:
            raise RuntimeError("pump dispatch failed") from self._exc


class OnlineFitter:
    """Stateful causal fitter over an incoming keypoint stream.

    >>> fit = OnlineFitter(model, cam)
    >>> fit.calibrate(first_frames_kp)        # optional shared-shape solve
    >>> for kp in stream:                     # kp: (K, 4) dense rows
    ...     params, res = fit.step(kp)        # one jitted dispatch

    Empty frames (no valid detections) are skipped on the host — params
    hold at the previous frame, mirroring the reference's skip-empty-frame
    control flow (src/main_single_frame.cpp:200-203); solving them anyway
    would let the pose prior drag the held pose toward zero.
    """

    def __init__(
        self,
        model: SMPLModel,
        cam: Camera,
        cfg: OnlineConfig = OnlineConfig(),
        shape: Optional[np.ndarray] = None,
        gmm_dict: Optional[dict] = None,
        r0=None,
        dtype=jnp.float32,
    ):
        self.model = model
        self.cam = cam
        self.cfg = cfg
        self.dtype = dtype
        r0 = init_root_rotation() if r0 is None else r0
        # with_shape=True: the calibrated (constant) shape must still move
        # the rest-pose joints; it is data here, never an unknown
        self.spec = make_skeleton_spec(model, r0, with_shape=True)
        gmm = None
        if gmm_dict is not None and cfg.beta_pose > 0.0:
            gmm = GMMPrior.from_dict(gmm_dict, beta=cfg.beta_pose, dtype=dtype)
        self._gmm = gmm
        self._scan = None
        self._step = build_online_step(
            self.spec, cam, cfg, model.num_joints, gmm=gmm, dtype=dtype)
        self.shape = jnp.asarray(
            np.zeros(model.num_shapes) if shape is None else shape, dtype)
        self.prev = init_frame_params(model.num_joints, dtype=dtype)
        self.has_prev = 0.0
        self.n_seen = 0
        self.last_calib_ms = 0.0  # solve-only wall time of calibrate()

    def calibrate(self, kp_frames: np.ndarray, max_iters: int = 100,
                  beta_shape: float = 25.0) -> np.ndarray:
        """Shared-shape fit over a buffered (F, K, 4) batch — the streaming
        analogue of stage-1 anchors (src/main_multi_frame.cpp:109-134):
        sets the locked shape for all subsequent step() calls, seeds the
        warm start from the LAST buffered frame, and returns the buffer's
        fitted params (F, P) so callers can emit them."""
        import time

        from smpltpu.solve.multi_frame import MultiFrameConfig, build_multi_fitter

        f = int(kp_frames.shape[0])
        cfg1 = MultiFrameConfig(
            beta_pose=self.cfg.beta_pose, beta_shape=beta_shape,
            lambda_temporal=self.cfg.lambda_temporal, max_iters=max_iters)
        fit = build_multi_fitter(self.spec, self.cam, cfg1,
                                 self.model.num_shapes, dtype=self.dtype)
        p0 = jnp.tile(init_frame_params(self.model.num_joints,
                                        dtype=self.dtype), (f, 1))
        r0 = jnp.tile(jnp.asarray(self.spec.r0, self.dtype), (f, 1, 1))
        kp_j = jnp.asarray(kp_frames, self.dtype)
        w0 = jnp.zeros(self.model.num_shapes, self.dtype)
        st = fit(p0, w0, kp_j, r0)
        jax.block_until_ready(st.params)
        # solve-only wall time for the caller's reporting: re-run the now-
        # compiled (deterministic) solve — the same compile/solve split the
        # reference's time_ms makes by wrapping only ceres::Solve
        t0 = time.perf_counter()
        st = fit(p0, w0, kp_j, r0)
        jax.block_until_ready(st.params)
        self.last_calib_ms = (time.perf_counter() - t0) * 1e3
        self.shape = st.shape
        self.prev = st.params[-1]
        self.has_prev = 1.0
        self.n_seen += f
        return np.asarray(st.params)

    def replay(self, kp_frames: np.ndarray):
        """Causal whole-sequence fit in ONE dispatch (build_online_scan):
        identical recursion to calling step() per frame (pinned by
        tests/test_online.py), but the frame chain runs inside lax.scan —
        the causal THROUGHPUT path. Advances the fitter state to the end
        of the sequence. Returns (params (F, P), solved (F,) bool,
        costs (F,), iters (F,), converged (F,) bool) as numpy; unsolved
        (empty) frames hold the previous pose in params and report
        converged=False."""
        if self._scan is None:
            self._scan = build_online_scan(
                self.spec, self.cam, self.cfg, self.model.num_joints,
                gmm=self._gmm, dtype=self.dtype)
        xs, costs, iters, solved, conv = self._scan(
            jnp.asarray(self.prev, self.dtype), self.shape,
            jnp.asarray(kp_frames, self.dtype),
            jnp.asarray(self.has_prev, self.dtype))
        xs_np, solved_np = np.asarray(xs), np.asarray(solved)
        n = int(kp_frames.shape[0])
        self.n_seen += n
        if n:
            self.prev = xs[-1]
            if solved_np.any():
                self.has_prev = 1.0
        return (xs_np, solved_np, np.asarray(costs), np.asarray(iters),
                np.asarray(conv))

    def make_pump(self, n_kp_slots: Optional[int] = None) -> OnlinePump:
        """Create a device-resident request pump (OnlinePump) running the
        SAME per-frame recursion as step(), seeded from this fitter's
        current state when started with ``pump.start(fit.prev, fit.shape,
        fit.has_prev)``."""
        if n_kp_slots is None:
            from smpltpu.constants import N_KP_SLOTS
            n_kp_slots = N_KP_SLOTS
        return OnlinePump(self.spec, self.cam, self.cfg,
                          self.model.num_joints, n_kp_slots,
                          gmm=self._gmm, dtype=self.dtype)

    def step(self, kp_dense: np.ndarray):
        """Fit one frame. Returns (params (P,) np, LMResult-or-None);
        result is None when the frame had no valid keypoints (held)."""
        kp = np.asarray(kp_dense)
        self.n_seen += 1
        if float(kp[:, 3].sum()) <= 0.0:
            return np.asarray(self.prev), None
        res = self._step(self.prev, self.shape, jnp.asarray(kp, self.dtype),
                         self.prev, jnp.asarray(self.has_prev, self.dtype))
        self.prev = res.x
        self.has_prev = 1.0
        return np.asarray(res.x), res
