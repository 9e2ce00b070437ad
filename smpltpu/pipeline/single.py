"""``3dba_single``-compatible CLI: per-frame independent SMPL fitting.

Argv surface parity with src/main_single_frame.cpp:105-161:

    python -m smpltpu.pipeline.single <SMPL.npz> <kps_folder> <images_folder>
        <out_dir> [max_iters=100] [beta_pose=20] [beta_shape=30]
        [--opt-shape] [--use-gmm]

Up to three numeric optionals are consumed IN ORDER (max_iters, beta_pose,
beta_shape), interleaved anywhere with the flags; unknown tokens warn and
are ignored — exactly the reference's hand-rolled parser. Outputs parity:
out_dir/log.csv ('frame,mean_pixel_error_px,time_ms', append, header once)
and out_dir/frame_<i>_render.png overlays; frames with no valid keypoints
are skipped (no log row, no render).

TPU-first deviation (results-identical): the reference loops frames
serially, rebuilding a Ceres problem per frame (:192-246); here ALL frames
fit in ONE batched vmapped LM solve — per-frame problems are independent,
so the optima are the same; the logged time_ms is each frame's equal share
of the batched solve. Framework extensions: fitted parameters are saved to
out_dir/params_single.npz, and --multi-start fits a data-driven init plus
root-yaw hypotheses per frame in one bigger batch and keeps each frame's
best (solve/init.py — the reference's blind t=(0,0,3) init is a basin
lottery on real data).
"""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp
import numpy as np

from smpltpu.constants import init_root_rotation
from smpltpu.energy.params import N_FRAME_PARAMS, init_frame_params
from smpltpu.pipeline.common import (
    StageTimer,
    append_log,
    batched_frame_eval,
    load_dataset,
    render_overlay_image,
    save_params,
)
from smpltpu.solve import build_fitter, make_single_frame_problem
from smpltpu.utils.image import imread

USAGE = """usage: python -m smpltpu.pipeline.single <SMPL.npz> <kps_folder> <images_folder> <out_dir>
                   [max_iters=100] [beta_pose=20] [beta_shape=30]
                   [--opt-shape] [--use-gmm] [--mesh N] [--frame-chunk N]
                   [--multi-start] [--adaptive-start] [--adaptive-thresh PX]
                   [--adaptive-propagate] [--no-orient-init]
                   [--profile] [--metrics-jsonl FILE]
"""

# --use-gmm beta_pose weight above which the round-4 objective-landscape
# probes showed non-dominant-component poses become unrecoverable by the
# objective itself (probe grid beta {2,5,20}: px gap to an L2 fit scales
# ~linearly in beta, tens of px at the reference default 20 — docs/
# ROADMAP.md GMM entry). Midpoint of the measured-mild (5) and
# measured-pathological (20) grid points; a warning threshold, not a
# behavior change.
GMM_BETA_WARN = 10.0


from smpltpu.pipeline.common import is_number as _is_number


def parse_args(argv):
    """Reference parser semantics (src/main_single_frame.cpp:115-155)."""
    if len(argv) < 4:
        return None
    opts = {
        "smpl_path": argv[0], "kps_folder": argv[1],
        "img_folder": argv[2], "out_dir": argv[3],
        "max_iters": 100, "beta_pose": 20.0, "beta_shape": 30.0,
        "opt_shape": False, "use_gmm": False, "pose_prior": None,
        "jax_render": False, "multi_start": False, "freeze_scale": False,
        "mesh": 0,  # 0 = auto (all visible devices), 1 = single-chip
        "frame_chunk": 0,  # chunked dispatch: per-chunk convergence exits
        "adaptive_start": False,  # fit once from data-init, multi-start
                                  # only frames above --adaptive-thresh
        "adaptive_thresh": 6.0,
        # phase P: temporal-propagation escalation (warm-started lax.scan
        # over the sequence) for frames EVERY static start loses — the
        # round-5 lever for band-hardness (solve/init.py::fit_adaptive)
        "adaptive_propagate": False,
        # observability (same surface as the multi CLI; SURVEY.md
        # section 5 tracing/metrics rows)
        "profile": False, "metrics_jsonl": None,
        # round 4: the multi-start/adaptive data init estimates the ROOT
        # ORIENTATION from the torso detections (solve/init.py::
        # estimate_root_orient); --no-orient-init restores the round-3
        # identity-orientation span init
        "orient_init": True,
    }
    seen_numeric = 0
    rest = list(argv[4:])
    while rest:
        a = rest.pop(0)
        if a == "--opt-shape":
            opts["opt_shape"] = True
        elif a == "--use-gmm":
            opts["use_gmm"] = True
        elif a == "--pose-prior" and rest:  # framework extension
            opts["pose_prior"] = rest.pop(0)
        elif a == "--jax-render":  # on-device z-buffer renderer
            opts["jax_render"] = True
        elif a == "--multi-start":  # data-driven init + yaw hypotheses
            opts["multi_start"] = True
        elif a == "--adaptive-start":  # multi-start only the hard frames
            opts["adaptive_start"] = True
        elif a == "--adaptive-thresh" and rest:
            opts["adaptive_thresh"] = float(rest.pop(0))
        elif a == "--adaptive-propagate":
            opts["adaptive_propagate"] = True
        elif a == "--profile":
            opts["profile"] = True
        elif a == "--metrics-jsonl" and rest:
            opts["metrics_jsonl"] = rest.pop(0)
        elif a == "--no-orient-init":
            opts["orient_init"] = False
        elif a == "--freeze-scale":  # gauge fix: see solve/single_frame.py
            opts["freeze_scale"] = True
        elif a == "--mesh" and rest:  # DP the frame batch over the mesh
            opts["mesh"] = max(0, int(float(rest.pop(0))))
        elif a == "--frame-chunk" and rest:  # bound the slowest-frame tail
            opts["frame_chunk"] = max(0, int(float(rest.pop(0))))
        elif _is_number(a):
            if seen_numeric == 0:
                opts["max_iters"] = max(1, int(float(a)))
            elif seen_numeric == 1:
                opts["beta_pose"] = float(a)
            elif seen_numeric == 2:
                opts["beta_shape"] = float(a)
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
          f"  beta_shape={opts['beta_shape']}  opt_shape={str(opts['opt_shape']).lower()}"
          f"  use_gmm={str(opts['use_gmm']).lower()}")

    os.makedirs(opts["out_dir"], exist_ok=True)
    try:
        # the single-frame main's own (divergent) loader defaults midpoint
        # visibility to 0.0 (src/main_single_frame.cpp:78)
        ds = load_dataset(opts["smpl_path"], opts["kps_folder"],
                          opts["img_folder"], midpoint_default_vis=0.0,
                          pose_prior_path=opts["pose_prior"])
    except ValueError as e:
        print(str(e), file=sys.stderr)
        return 1

    model, cam = ds["model"], ds["cam"]
    gmm = ds["gmm"] if opts["use_gmm"] else None
    n_comps = 0 if ds["gmm"] is None else len(ds["gmm"]["weights"])
    print(f"Pose prior components: {n_comps}  "
          f"(GMM {'ON' if opts['use_gmm'] else 'OFF'})")
    if opts["use_gmm"] and gmm is None:
        print("[WARN] --use-gmm requested but no pose_prior.txt found; "
              "falling back to L2 pose prior", file=sys.stderr)
    if opts["use_gmm"] and gmm is not None \
            and opts["beta_pose"] >= GMM_BETA_WARN:
        # round-4 measured pathology (docs/ROADMAP.md GMM entry): the
        # hard-assignment GMM energy is piecewise and at the reference's
        # default beta_pose=20 the beta^2-scaled component constants
        # dominate — poses away from the dominant (argmin c_k) component
        # are unrecoverable BY THE OBJECTIVE (17-46 px parked optima,
        # probe grid beta {2,5,20}: the gap scales ~linearly in beta).
        # The default is reference parity (Sim3BA.h:616-626), so it
        # stands — but the user should know.
        print(f"[WARN] --use-gmm at beta_pose={opts['beta_pose']:g} >= "
              f"{GMM_BETA_WARN:g}: the hard-assignment GMM objective "
              "measurably prefers parking non-dominant-component poses in "
              "the dominant basin at this weight (tens of px data error; "
              "docs/ROADMAP.md GMM entry). Consider a lower beta_pose "
              "and/or --multi-start (prior-seeded starts).",
              file=sys.stderr)

    prob = make_single_frame_problem(
        model, init_root_rotation(), cam,
        beta_pose=opts["beta_pose"], beta_shape=opts["beta_shape"],
        opt_shape=opts["opt_shape"], gmm_dict=gmm,
        freeze_scale=opts["freeze_scale"])

    kp = ds["kp_batch"]
    n_frames = kp.shape[0]
    dtype = jnp.float32

    if opts["adaptive_start"]:
        # framework extension: two-phase adaptive multi-start — fit every
        # frame once from the data-driven init, then multi-start ONLY the
        # frames whose residual exceeds --adaptive-thresh px
        # (solve/init.py::fit_adaptive; supersedes --multi-start, which
        # pays the full starts x frames batch unconditionally)
        return _main_adaptive(opts, ds, prob, kp, dtype)

    if opts["multi_start"]:
        # framework extension (NOT reference behavior): data-driven init
        # (depth/translation from the detections) x root-yaw hypotheses,
        # all starts fitted as one bigger batch, lowest-cost start kept
        # per frame — the cold blind init t=(0,0,3) is a basin lottery on
        # real data (see solve/init.py)
        from smpltpu.solve import make_start_set
        n_extra = model.num_shapes if opts["opt_shape"] else 0
        # with a GMM prior, also seed one start per component mean
        # (SMPLify-style): the hard-assignment energy is piecewise and a
        # zero-pose start can never switch component basins — see the
        # pose_seeds note in solve/init.py::make_start_set
        seeds = (np.asarray(gmm["means"])
                 if gmm is not None and opts["beta_pose"] > 0.0 else None)
        starts = make_start_set(kp, prob.spec, cam, n_extra_dims=n_extra,
                                pose_seeds=seeds,
                                orient=opts["orient_init"])
        s_dim = starts.shape[1]
        x0 = jnp.asarray(starts.reshape(n_frames * s_dim, -1), dtype)
        kp_fit = np.repeat(kp, s_dim, axis=0)
    else:
        s_dim = 1
        x0_one = init_frame_params(dtype=dtype)
        if opts["opt_shape"]:
            x0_one = jnp.concatenate([x0_one,
                                      jnp.zeros(model.num_shapes, dtype)])
        x0 = jnp.tile(x0_one, (n_frames, 1))
        kp_fit = kp

    # device mesh (same surface as the multi CLI's --mesh): per-frame
    # solves are independent, so the batch DPs over the mesh with no
    # communication until the gather (parallel/sharded.sharded_frame_fit)
    import jax

    mesh_n = opts["mesh"] if opts["mesh"] > 0 else len(jax.devices())
    mesh = None
    n_solve = int(x0.shape[0])
    if mesh_n > 1:
        from smpltpu.parallel import frames_mesh, sharded_frame_fit
        mesh = frames_mesh(mesh_n)
        pad = (-n_solve) % mesh_n
        if pad:  # all-invalid keypoint rows: padding converges to its init
            x0 = jnp.concatenate([x0, jnp.tile(x0[-1:], (pad, 1))])
            kp_fit = np.concatenate(
                [kp_fit, np.zeros((pad,) + kp_fit.shape[1:], kp_fit.dtype)])
    print(f"[INFO] devices visible: {len(jax.devices())}  mesh size: "
          f"{mesh_n if mesh is not None else 1}")

    # --frame-chunk: under a mesh the chunking happens per-device inside
    # sharded_frame_fit (the fitter must stay unchunked there); on one
    # chip build_fitter wraps the lax.map itself
    fitter = build_fitter(prob, max_iters=opts["max_iters"], dtype=dtype,
                          chunk=0 if mesh is not None else opts["frame_chunk"])
    kp_dev = jnp.asarray(kp_fit, dtype)

    def run_solve():
        if mesh is not None:
            return sharded_frame_fit(mesh, fitter, x0, kp_dev,
                                     chunk=opts["frame_chunk"])
        return fitter(x0, kp_dev)

    from smpltpu.utils.obs import MetricsLogger, profile_trace
    metrics = MetricsLogger(jsonl_path=opts["metrics_jsonl"])
    profile_dir = (os.path.join(opts["out_dir"], "profile")
                   if opts["profile"] else None)
    timer = StageTimer()
    state = run_solve()
    state.x.block_until_ready()
    first_ms = timer.ms()
    # re-run the (deterministic) compiled solve to time it without the
    # one-off XLA compilation, matching the reference's timer which wraps
    # only ceres::Solve (src/main_single_frame.cpp:234-249)
    timer = StageTimer()
    with profile_trace(profile_dir):
        state = run_solve()
        state.x.block_until_ready()
    total_ms = timer.ms()
    if mesh is not None and n_solve != x0.shape[0]:
        state = jax.tree_util.tree_map(lambda a: a[:n_solve], state)
    print(f"[INFO] batched solve: {total_ms:.1f} ms for {n_frames} frames"
          f"{f' x {s_dim} starts' if s_dim > 1 else ''} "
          f"(+{first_ms - total_ms:.0f} ms one-off compile)")
    per_frame_ms = total_ms / max(n_frames, 1)
    metrics.log("single_solve", ms=total_ms, frames=n_frames,
                starts=s_dim, compile_ms=max(first_ms - total_ms, 0.0))
    metrics.close()

    r0 = np.asarray(init_root_rotation())
    if s_dim > 1:
        from smpltpu.solve import best_of_starts
        best_x, best_cost, best_idx = best_of_starts(state, n_frames, s_dim)
        x_final = best_x
        # converged flag and loss history come from the SELECTED start of
        # each frame (not start 0 / an elementwise min across starts —
        # that would record a flag for discarded parameters and a loss
        # trajectory no solver produced)
        rows_sel = np.arange(n_frames)
        conv = np.asarray(state.converged).reshape(
            n_frames, s_dim)[rows_sel, best_idx]
        cost = best_cost
        hist_all = np.asarray(state.cost_history).reshape(n_frames, s_dim, -1)
        hist_src = hist_all[rows_sel, best_idx]
    else:
        x_final = np.asarray(state.x)
        conv = np.asarray(state.converged)
        cost = np.asarray(state.cost)
        hist_src = np.asarray(state.cost_history)
    return _emit_outputs(opts, ds, model, cam, kp, x_final, conv, cost,
                         hist_src, per_frame_ms, r0)


def _main_adaptive(opts, ds, prob, kp, dtype) -> int:
    """--adaptive-start solve path (see solve/init.py::fit_adaptive)."""
    import jax

    from smpltpu.solve import fit_adaptive

    model, cam = ds["model"], ds["cam"]
    n_frames = kp.shape[0]
    if opts["multi_start"]:
        print("[WARN] --adaptive-start supersedes --multi-start",
              file=sys.stderr)
    mesh_n = opts["mesh"] if opts["mesh"] > 0 else len(jax.devices())
    fitter = build_fitter(prob, max_iters=opts["max_iters"], dtype=dtype,
                          chunk=0 if mesh_n > 1 else opts["frame_chunk"])
    if mesh_n > 1:
        # same DP surface as the plain path; the phase batches have
        # data-dependent widths, so pad each call to a mesh multiple with
        # all-invalid rows (converge instantly to their init) and strip
        from smpltpu.parallel import frames_mesh, sharded_frame_fit
        mesh = frames_mesh(mesh_n)
        base_fitter = fitter

        def fitter(x0_b, kp_b):
            n = int(x0_b.shape[0])
            pad = (-n) % mesh_n
            if pad:
                x0_b = jnp.concatenate([x0_b,
                                        jnp.tile(x0_b[-1:], (pad, 1))])
                kp_b = jnp.concatenate(
                    [kp_b, jnp.zeros((pad,) + kp_b.shape[1:], kp_b.dtype)])
            st = sharded_frame_fit(mesh, base_fitter, x0_b, kp_b,
                                   chunk=opts["frame_chunk"])
            if pad:
                st = jax.tree_util.tree_map(lambda a: a[:n], st)
            return st
    print(f"[INFO] devices visible: {len(jax.devices())}  mesh size: "
          f"{mesh_n}")

    timer = StageTimer()
    res = fit_adaptive(prob, kp, opts["max_iters"],
                       px_thresh=opts["adaptive_thresh"],
                       fitter=fitter, dtype=dtype,
                       orient=opts["orient_init"],
                       propagate=opts["adaptive_propagate"])
    first_ms = timer.ms()
    # re-run the (deterministic) solve so the logged time excludes the
    # one-off XLA compiles, matching the reference's ceres::Solve-only
    # timer (src/main_single_frame.cpp:234-249)
    timer = StageTimer()
    res = fit_adaptive(prob, kp, opts["max_iters"],
                       px_thresh=opts["adaptive_thresh"],
                       fitter=fitter, dtype=dtype,
                       orient=opts["orient_init"],
                       propagate=opts["adaptive_propagate"])
    total_ms = timer.ms()
    print(f"[INFO] adaptive solve: {total_ms:.1f} ms for {n_frames} frames "
          f"({res.hard_idx.size} above {opts['adaptive_thresh']:.1f}px "
          f"multi-started, {int(res.escalated.sum())} improved; "
          f"+{first_ms - total_ms:.0f} ms one-off compile)")
    per_frame_ms = total_ms / max(n_frames, 1)
    r0 = np.asarray(init_root_rotation())
    return _emit_outputs(opts, ds, model, cam, kp, res.x, res.converged,
                         res.cost, res.cost_history, per_frame_ms, r0)


def _emit_outputs(opts, ds, model, cam, kp, x_final, conv, cost, hist_src,
                  per_frame_ms, r0) -> int:
    """Shared output tail: per-frame eval, renders, log.csv, params npz,
    loss_curve.txt (both the plain/multi-start and adaptive solve paths
    land here)."""
    n_frames = kp.shape[0]
    params = x_final[:, :N_FRAME_PARAMS]
    shapes = (x_final[:, N_FRAME_PARAMS:] if opts["opt_shape"]
              else np.zeros((n_frames, model.num_shapes)))

    errors, verts = batched_frame_eval(
        model, params, shapes, np.tile(r0, (n_frames, 1, 1)), kp, cam)

    rows = []
    valid_frames = kp[:, :, 3].sum(axis=1) > 0
    for i in range(n_frames):
        if i >= len(ds["images"]):
            # reference stops the whole loop at the first missing image
            # (src/main_single_frame.cpp:194 'break')
            print(f"No image for frame {i}", file=sys.stderr)
            break
        # reference skips unreadable-image frames before solving/logging
        # (src/main_single_frame.cpp:195 'continue'): no log row either
        img = imread(ds["images"][i])
        if img is None:
            print(f"Failed to read {ds['images'][i]}", file=sys.stderr)
            continue
        if not valid_frames[i]:
            print(f"Frame {i} has no valid keypoints; skipping.", file=sys.stderr)
            continue
        rows.append((i, float(errors[i]), per_frame_ms))
        render_overlay_image(
            model, verts[i], ds["images"][i],
            os.path.join(opts["out_dir"], f"frame_{i}_render.png"), cam,
            use_jax=opts["jax_render"], img=img)
    append_log(opts["out_dir"], rows)
    save_params(opts["out_dir"], "params_single.npz", params, shapes,
                extra={"converged": conv, "cost": cost})
    # per-iteration loss curve (mean over valid frames) — the file
    # scripts/loss_curve_plot.py expects but the reference never writes
    hist = hist_src[valid_frames].mean(axis=0)
    with open(os.path.join(opts["out_dir"], "loss_curve.txt"), "w") as f:
        f.write("iteration,loss\n")
        for it, c in enumerate(hist):
            f.write(f"{it},{c}\n")
    print("Done.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
