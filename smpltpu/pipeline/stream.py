"""Streaming (online) fitting CLI — a serving-oriented framework extension.

The reference pipeline is strictly offline (both mains preload every frame,
src/main_multi_frame.cpp:72-77). This driver consumes the keypoint frames
IN ORDER as a simulated live stream and fits each one causally with the
warm-started per-frame solver (solve/online.py): one jitted LM dispatch per
frame, shape locked after an initial shared-shape calibration buffer (the
streaming analogue of stage-1 anchors). The headline metric is per-frame
LATENCY (reported p50/p95), not batch throughput.

    python -m smpltpu.pipeline.stream <SMPL.npz> <kps_folder> <images_folder>
        <out_dir> [max_iters=20] [beta_pose=5] [lambda_t=3]
        [--calib N=10] [--use-gmm] [--pose-prior <txt>] [--render]
        [--jax-render] [--free-scale] [--scan] [--warm-timing]

``--scan`` switches the post-calibration stream to the causal REPLAY path
(solve/online.build_online_scan): the identical per-frame recursion, but
the whole frame chain runs inside one lax.scan dispatch — no host
round-trip between frames, so the reported per-frame number is amortized
throughput (the on-chip serving bound) instead of live dispatch latency.

``--pump`` switches the live stream to the DEVICE-RESIDENT REQUEST PUMP
(solve/online.OnlinePump): one persistent dispatch runs the filter as a
lax.while_loop, each frame fed and its params returned through ordered
io_callbacks — true per-frame serving latency WITHOUT the per-dispatch
executable-launch cost the plain loop pays (~28 ms through the axon
tunnel). Results are identical to the per-dispatch loop
(tests/test_online.py::test_pump_matches_step).

Numeric optionals are consumed in order (max_iters, beta_pose, lambda_t),
interleaved with flags — same hand-rolled parser family as the reference
mains. Outputs: out_dir/log.csv (reference schema, time_ms = that frame's
solve latency), params_stream.npz, optional frame_<i>_stream.png overlays.
Frames with no valid detections are skipped (no row), holding the pose —
the reference's skip-empty-frame semantics (src/main_single_frame.cpp:
200-203).
"""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp
import numpy as np

from smpltpu.pipeline.common import (
    StageTimer,
    append_log,
    batched_frame_eval,
    load_dataset,
    render_overlay_image,
    save_params,
)
from smpltpu.solve.online import OnlineConfig, OnlineFitter

USAGE = """usage: python -m smpltpu.pipeline.stream <SMPL.npz> <kps_folder> <images_folder> <out_dir>
                   [max_iters=20] [beta_pose=5] [lambda_t=3]
                   [--calib N] [--use-gmm] [--pose-prior <txt>]
                   [--render] [--jax-render] [--free-scale] [--scan]
                   [--pump] [--warm-timing]
"""


from smpltpu.pipeline.common import is_number as _is_number


def parse_args(argv):
    if len(argv) < 4:
        return None
    opts = {
        "smpl_path": argv[0], "kps_folder": argv[1],
        "img_folder": argv[2], "out_dir": argv[3],
        "max_iters": 20, "beta_pose": 5.0, "lambda_t": 3.0,
        "calib": 10, "use_gmm": False, "pose_prior": None,
        "render": False, "jax_render": False, "freeze_scale": True,
        "scan": False, "pump": False, "warm_timing": False,
    }
    seen_numeric = 0
    rest = list(argv[4:])
    while rest:
        a = rest.pop(0)
        if a == "--calib" and rest:
            opts["calib"] = max(0, int(float(rest.pop(0))))
        elif a == "--use-gmm":
            opts["use_gmm"] = True
        elif a == "--pose-prior" and rest:
            opts["pose_prior"] = rest.pop(0)
        elif a == "--render":
            opts["render"] = True
        elif a == "--jax-render":
            opts["render"] = True
            opts["jax_render"] = True
        elif a == "--free-scale":
            # scale gauge left free (see OnlineConfig.freeze_scale)
            opts["freeze_scale"] = False
        elif a == "--scan":
            opts["scan"] = True
        elif a == "--pump":
            opts["pump"] = True
        elif a == "--warm-timing":
            # re-run the compiled scan once more purely so log.csv's
            # time_ms reports the warm (compile-excluded) solve time —
            # doubles the solve wall time on long videos, hence opt-in
            opts["warm_timing"] = True
        elif _is_number(a):
            if seen_numeric == 0:
                opts["max_iters"] = max(1, int(float(a)))
            elif seen_numeric == 1:
                opts["beta_pose"] = float(a)
            elif seen_numeric == 2:
                opts["lambda_t"] = float(a)
            seen_numeric += 1
        else:
            print(f"[WARN] Unknown arg ignored: {a}", file=sys.stderr)
    return opts


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    opts = parse_args(argv)
    if opts is None:
        print(USAGE, end="")
        return 0
    print(f"[ARGS] max_iters={opts['max_iters']}  beta_pose={opts['beta_pose']}"
          f"  lambda_t={opts['lambda_t']}  calib={opts['calib']}"
          f"  use_gmm={str(opts['use_gmm']).lower()}")

    os.makedirs(opts["out_dir"], exist_ok=True)
    try:
        ds = load_dataset(opts["smpl_path"], opts["kps_folder"],
                          opts["img_folder"], midpoint_default_vis=1.0,
                          pose_prior_path=opts["pose_prior"])
    except ValueError as e:
        print(str(e), file=sys.stderr)
        return 1

    model, cam = ds["model"], ds["cam"]
    kp = np.asarray(ds["kp_batch"], np.float32)
    n_frames = kp.shape[0]
    gmm = ds["gmm"] if opts["use_gmm"] else None
    if opts["use_gmm"] and gmm is None:
        print("[WARN] --use-gmm requested but no pose_prior.txt found; "
              "falling back to L2 pose prior", file=sys.stderr)

    cfg = OnlineConfig(beta_pose=opts["beta_pose"],
                       lambda_temporal=opts["lambda_t"],
                       max_iters=opts["max_iters"],
                       freeze_scale=opts["freeze_scale"])
    fitter = OnlineFitter(model, cam, cfg, gmm_dict=gmm)

    valid = kp[:, :, 3].sum(axis=1) > 0
    valid_idx = np.flatnonzero(valid)
    if valid_idx.size == 0:
        print("No frames with valid keypoints.", file=sys.stderr)
        return 1

    # compile warm-up outside the latency measurement (the reference's
    # time_ms wraps only ceres::Solve; XLA's one-off trace/compile is the
    # analogue of Ceres's problem construction, not of the solve). The
    # scan path compiles its whole-sequence program on first use instead.
    if not opts["scan"]:
        timer = StageTimer()
        fitter._step(fitter.prev, fitter.shape,
                     jnp.asarray(kp[valid_idx[0]], jnp.float32),
                     fitter.prev, jnp.asarray(0.0, jnp.float32)).x.block_until_ready()
        print(f"[INFO] per-frame solver compiled in {timer.ms():.0f} ms")

    # fill with the init pose, not zeros: rows the stream never solves
    # (leading no-detection frames, gaps inside the calibration buffer)
    # must stay a valid body, not a scale-0 degenerate at the origin
    params = np.tile(np.asarray(fitter.prev, np.float32), (n_frames, 1))
    time_ms = np.zeros(n_frames)
    emitted = np.zeros(n_frames, dtype=bool)
    latencies = []

    # ---- calibration buffer: first `calib` frames WITH detections ----
    n_calib = min(opts["calib"], valid_idx.size)
    calib_idx = valid_idx[:n_calib]
    start_at = 0
    if n_calib > 0:
        timer = StageTimer()
        calib_params = fitter.calibrate(kp[calib_idx])
        calib_wall_ms = timer.ms()
        params[calib_idx] = calib_params
        # log.csv time_ms is SOLVE latency (compile excluded, like the
        # per-frame warm-up above): calibrate() re-times its compiled solve
        time_ms[calib_idx] = fitter.last_calib_ms / n_calib
        emitted[calib_idx] = True
        start_at = int(calib_idx[-1]) + 1
        print(f"[INFO] calibrated shape on {n_calib} frames: solve "
              f"{fitter.last_calib_ms:.0f} ms "
              f"(+{calib_wall_ms - fitter.last_calib_ms:.0f} ms one-off "
              "compile+first); locked for the stream")

    # ---- the stream ----
    if opts["pump"] and start_at < n_frames:
        from smpltpu.solve.online import probe_io_callback

        if not probe_io_callback():
            print("[WARN] --pump disabled: this backend does not deliver "
                  "io_callback host calls (the axon remote-TPU tunnel "
                  "never services them — a pump dispatch would hang "
                  "forever). Falling back to per-dispatch streaming; the "
                  "pump runs on CPU and co-located TPU runtimes.")
            opts["pump"] = False
    if opts["pump"] and start_at < n_frames:
        # device-resident request pump: one persistent dispatch, frames
        # fed / params returned through ordered io_callbacks. Warm-up: run
        # the SAME pump instance once with a sacrificial frame and stop it
        # (start() is re-callable; the jitted program is compiled on the
        # first run, so the restarted dispatch launches from the
        # executable cache) — then restart it from the real fitter state
        # so the measured latencies are compile-free.
        pump = fitter.make_pump()
        timer = StageTimer()
        pump.start(fitter.prev, fitter.shape, fitter.has_prev)
        pump.submit(kp[valid_idx[0]])
        pump.stop()
        print(f"[INFO] pump compiled+first round-trip in {timer.ms():.0f} ms")
        pump.start(fitter.prev, fitter.shape, fitter.has_prev)
        for i in range(start_at, n_frames):
            timer = StageTimer()
            x_i, _cost, _iters, solved = pump.submit(kp[i])
            dt = timer.ms()
            params[i] = x_i
            if not solved:
                print(f"Frame {i} has no valid keypoints; skipping.",
                      file=sys.stderr)
                continue
            time_ms[i] = dt
            emitted[i] = True
            latencies.append(dt)
        pump.stop()
        fitter.prev = jnp.asarray(pump.prev, fitter.dtype)
        fitter.has_prev = pump.has_prev
    elif opts["scan"] and start_at < n_frames:
        # causal replay: identical recursion, whole chain in one dispatch.
        # Per-frame time_ms becomes the AMORTIZED solve time (compile and
        # the first run excluded, same contract as the loop path's warm-up)
        seq = kp[start_at:]
        prev0, has0 = fitter.prev, fitter.has_prev
        timer = StageTimer()
        xs, solved, _costs, _iters, _conv = fitter.replay(seq)
        first_ms = timer.ms()
        if opts["warm_timing"]:
            # --warm-timing: one more run of the now-compiled scan from the
            # same start state, and its outputs are the ones emitted (the
            # solve is deterministic, so nothing but the timing changes) —
            # log.csv time_ms becomes the warm compile-excluded solve time
            timer = StageTimer()
            out = fitter._scan(jnp.asarray(prev0, fitter.dtype), fitter.shape,
                               jnp.asarray(seq, fitter.dtype),
                               jnp.asarray(has0, fitter.dtype))
            out[0].block_until_ready()
            scan_ms = timer.ms()
            xs, solved = np.asarray(out[0]), np.asarray(out[3])
        else:
            # default: solve ONCE; time_ms includes the one-off
            # compile+tracing cost (noted in the log line below)
            scan_ms = first_ms
        params[start_at:] = xs
        n_solved = int(solved.sum())
        for k in np.flatnonzero(~solved):
            print(f"Frame {start_at + int(k)} has no valid keypoints; "
                  "skipping.", file=sys.stderr)
        if n_solved:
            amort = scan_ms / n_solved
            sidx = start_at + np.flatnonzero(solved)
            time_ms[sidx] = amort
            emitted[sidx] = True
            latencies.extend([amort] * n_solved)
            if opts["warm_timing"]:
                print(f"[INFO] scan replay: {n_solved} frames in one "
                      f"dispatch, {scan_ms:.0f} ms warm solve "
                      f"({amort:.2f} ms/frame amortized; "
                      f"+{max(first_ms - scan_ms, 0):.0f} ms one-off "
                      "compile+first)")
            else:
                print(f"[INFO] scan replay: {n_solved} frames in one "
                      f"dispatch, {scan_ms:.0f} ms ({amort:.2f} ms/frame "
                      "amortized, INCLUDES one-off compile+tracing — pass "
                      "--warm-timing for the warm solve time)")
    else:
        for i in range(start_at, n_frames):
            timer = StageTimer()
            p_i, res = fitter.step(kp[i])
            if res is None:
                # held pose: no log row / render (reference skip semantics)
                # but the npz keeps the hold so frame rows are never zeros
                params[i] = p_i
                print(f"Frame {i} has no valid keypoints; skipping.",
                      file=sys.stderr)
                continue
            res.x.block_until_ready()
            dt = timer.ms()
            params[i] = p_i
            time_ms[i] = dt
            emitted[i] = True
            latencies.append(dt)

    if latencies:
        lat = np.asarray(latencies)
        print(f"[INFO] streamed {lat.size} frames: latency "
              f"mean {lat.mean():.1f} ms, p50 {np.percentile(lat, 50):.1f} ms, "
              f"p95 {np.percentile(lat, 95):.1f} ms "
              f"({1e3 / max(lat.mean(), 1e-9):.0f} frames/s sustained)")

    # ---- evaluation + outputs (post-hoc, outside the latency path) ----
    idx = np.flatnonzero(emitted)
    shapes = np.tile(np.asarray(fitter.shape), (n_frames, 1))
    r0 = np.tile(np.asarray(fitter.spec.r0), (n_frames, 1, 1))
    errors, verts = batched_frame_eval(
        model, params[idx], shapes[idx], r0[idx], kp[idx], cam,
        want_verts=opts["render"])
    rows = [(int(i), float(errors[k]), float(time_ms[i]))
            for k, i in enumerate(idx)]
    append_log(opts["out_dir"], rows)
    save_params(opts["out_dir"], "params_stream.npz", params, shapes,
                extra={"emitted": emitted, "calib_frames": calib_idx})

    if opts["render"]:
        for k, i in enumerate(idx):
            if i < len(ds["images"]):
                render_overlay_image(
                    model, verts[k], ds["images"][i],
                    os.path.join(opts["out_dir"], f"frame_{i}_stream.png"),
                    cam, use_jax=opts["jax_render"])
    print("Done.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
