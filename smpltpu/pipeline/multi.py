"""``3dba_multi``-compatible CLI: two-stage multi-frame fitting
(anchor frames with shared shape, then sliding-window refinement).

Argv surface parity with src/main_multi_frame.cpp:15-36:

    python -m smpltpu.pipeline.multi <SMPL.npz> <kps_folder> <image_folder>
        <out_dir> [max_iters_s1=1000] [max_iters_s2=500] [anchor_skip=10]
        [window=20] [overlap=5] [beta_pose=5.0] [beta_shape=25.0]
        [lambda_temp=3.0]

Reference quirks reproduced deliberately (SURVEY.md section 2.1):
  * max_iters_s2 is parsed but stage 2 actually runs a hard-coded 60
    iterations (src/main_multi_frame.cpp:30 vs :186); override with the
    framework extension flag --s2-iters;
  * stage-1 optimized anchor poses are NOT copied back into the global
    pose array (:113-119, no write-back) — anchors contribute only through
    the shared shape and each anchor avatar's root orientation r[0];
  * per-frame fixed root orientation accumulates across solves
    (r[0] <- R(rootAA) @ r[0], MultiFrameBA.h:163) while the pose array
    keeps the optimized rootAA, so overlap frames start the next window
    'doubly rotated' — self-consistent, costs a few LM iterations;
  * stage-2 keeps betaShape = 1e5 as a shape lock (:163,183).

Deviation (documented): the reference optimizes the first window-frame
avatar's shape block under the 1e5 lock while other avatars keep the
stage-1 shape (MultiFrameBA.h:67); we use ONE shared shape carried across
windows — under the lock it moves by ~0, same optima.

Fast path: --batched-windows solves ALL stage-2 windows at once (vmapped,
the 'full-video batched fitting' config of BASELINE.json) instead of
sequentially; sequential is the default for init-chaining parity.
--fused-stages (with --batched-windows --init-from-anchors, single-chip)
compiles the WHOLE chain — anchors + anchor->window interpolation +
windows — into ONE dispatch (solve/two_stage.py, the bench headline
path: 1830 vs 1760 frames/s through the TPU tunnel).
--window-chunk N splits the batch into N-window chunks with independent
convergence exits (bounds the slowest-window tail on long videos; see
solve/multi_frame.build_chunked_window_fit). Composes with --mesh: each
device then lax.maps its local window slice in N-window chunks
(parallel/sharded.sharded_window_fit chunk=N).
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from smpltpu.constants import init_root_rotation
from smpltpu.energy import make_skeleton_spec
from smpltpu.energy.params import init_frame_params
from smpltpu.pipeline.common import (
    StageTimer,
    append_log,
    batched_frame_eval,
    load_dataset,
    np_rodrigues,
    render_overlay_image,
    save_params,
)
from smpltpu.solve import MultiFrameConfig, build_multi_fitter
from smpltpu.utils.ckpt import load_checkpoint, save_checkpoint
from smpltpu.utils.obs import MetricsLogger, profile_trace

USAGE = """usage: python -m smpltpu.pipeline.multi <SMPL.npz> <kps_folder> <image_folder> <out_dir>
             [max_iters=120] [max_iters_stage2=120] [anchor_skip=15] [window=30] [overlap=10]
             [beta_pose=5.0] [beta_shape=25.0]
"""

SHAPE_LOCK = 1e5  # src/main_multi_frame.cpp:163
S2_ITERS_DEFAULT = 60  # hard-coded in the reference (:186)


def parse_args(argv):
    if len(argv) < 4:
        return None
    opts = {
        "smpl_path": argv[0], "kps_folder": argv[1],
        "img_folder": argv[2], "out_dir": argv[3],
        "max_iters_s1": 1000, "max_iters_s2": 500, "skip": 10,
        "wsize": 20, "overlap": 5, "beta_pose": 5.0, "beta_shape": 25.0,
        "lambda_t": 3.0, "s2_iters": S2_ITERS_DEFAULT,
        "batched_windows": False, "pose_prior": None,
        "resume": False, "profile": False, "metrics_jsonl": None,
        "init_from_anchors": False, "jax_render": False, "data_init": False,
        # round 5: --multi-start seeds every frame with its best-of-starts
        # single-frame fit before the two-stage chain (supersedes
        # --data-init); --orient-init adds the weak-perspective root-
        # orientation estimate to --data-init (OPT-IN: measured worse for
        # the coupled two-stage chain on video1 full-res — see the
        # data_init block + docs/ROADMAP.md)
        "multi_start": False,
        "orient_init": False,
        "mesh": 0,  # 0 = auto (all visible devices), 1 = single-chip
        # arrowhead linear solver (MultiFrameConfig.linear): "pcg" is
        # fastest on TPU (bench 671 -> 1382 frames/s at equal-or-better
        # residual); "tridiag" default matches the library default (exact
        # elimination, robust to arbitrary conditioning)
        "linear": "tridiag",
        # pcg tolerance exit (MultiFrameConfig.cg_rtol); 0 = fixed trips
        "cg_rtol": 0.0,
        # checkpoint backend (utils/ckpt.py): "npz" (atomic single file,
        # default) or "orbax" (JAX-ecosystem PyTree directory)
        "ckpt_backend": "npz",
        # --batched-windows chunk size (0 = one vmapped batch). A vmapped
        # convergence-exit solve runs until its SLOWEST window; on very
        # long videos chunking bounds that tail (build_chunked_window_fit)
        "window_chunk": 0,
        # round 5: the whole two-stage chain as ONE compiled dispatch
        # (solve/two_stage.py — the bench headline path, 1830 vs 1760
        # fps on the TPU tunnel). Needs --batched-windows
        # --init-from-anchors, single-chip, unchunked, fresh run.
        "fused_stages": False,
    }
    positional = ["max_iters_s1", "max_iters_s2", "skip", "wsize", "overlap",
                  "beta_pose", "beta_shape", "lambda_t"]
    ints = {"max_iters_s1", "max_iters_s2", "skip", "wsize", "overlap"}
    pos_idx = 0
    rest = list(argv[4:])
    while rest:
        a = rest.pop(0)
        if a == "--batched-windows":
            opts["batched_windows"] = True
        elif a == "--resume":
            opts["resume"] = True
        elif a == "--init-from-anchors":
            opts["init_from_anchors"] = True
        elif a == "--data-init":
            opts["data_init"] = True
        elif a == "--multi-start":
            opts["multi_start"] = True
        elif a == "--orient-init":
            opts["orient_init"] = True
        elif a == "--fused-stages":
            opts["fused_stages"] = True
        elif a == "--no-orient-init":
            opts["orient_init"] = False
        elif a == "--jax-render":
            opts["jax_render"] = True
        elif a == "--profile":
            opts["profile"] = True
        elif a == "--metrics-jsonl" and rest:
            opts["metrics_jsonl"] = rest.pop(0)
        elif a == "--s2-iters" and rest:
            opts["s2_iters"] = max(1, int(float(rest.pop(0))))
        elif a == "--mesh" and rest:
            opts["mesh"] = max(0, int(float(rest.pop(0))))
        elif a == "--window-chunk" and rest:
            opts["window_chunk"] = max(0, int(float(rest.pop(0))))
        elif a == "--pose-prior" and rest:
            opts["pose_prior"] = rest.pop(0)
        elif a == "--cg-rtol" and rest:
            opts["cg_rtol"] = float(rest.pop(0))
        elif a == "--linear" and rest:
            opts["linear"] = rest.pop(0)
            if opts["linear"] not in ("tridiag", "cr", "pcg", "pcg_block",
                                      "pcg_kernel"):
                print(f"--linear must be tridiag|cr|pcg|pcg_block|"
                      f"pcg_kernel, got {opts['linear']!r}", file=sys.stderr)
                return None
        elif a == "--ckpt-backend" and rest:
            opts["ckpt_backend"] = rest.pop(0)
            if opts["ckpt_backend"] not in ("npz", "orbax"):
                print(f"--ckpt-backend must be npz|orbax, got "
                      f"{opts['ckpt_backend']!r}", file=sys.stderr)
                return None
        elif pos_idx < len(positional):
            key = positional[pos_idx]
            opts[key] = int(float(a)) if key in ints else float(a)
            pos_idx += 1
        else:
            print(f"[WARN] Unknown arg ignored: {a}", file=sys.stderr)
    return opts


def _pad_window(arr, start, end, wsize):
    """Slice [start:end) padded to wsize along axis 0."""
    out = np.zeros((wsize,) + arr.shape[1:], dtype=arr.dtype)
    out[:end - start] = arr[start:end]
    return out


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    opts = parse_args(argv)
    if opts is None:
        print(USAGE, end="")
        return 0
    os.makedirs(opts["out_dir"], exist_ok=True)

    try:
        ds = load_dataset(opts["smpl_path"], opts["kps_folder"],
                          opts["img_folder"], midpoint_default_vis=1.0,
                          pose_prior_path=opts["pose_prior"])
    except ValueError as e:
        print(str(e), file=sys.stderr)
        return 1
    if len(ds["images"]) != len(ds["json_paths"]):
        print("image / json count mismatch", file=sys.stderr)
        return 1

    model, cam = ds["model"], ds["cam"]
    n_frames = ds["kp_batch"].shape[0]
    print(f"[INFO] frames: {opts['img_folder']}  = {n_frames:4d}\n"
          f"[INFO] anchor skip     : {opts['skip']}\n"
          f"[INFO] window / overlap: {opts['wsize']} / {opts['overlap']}\n"
          f"[INFO] beta_pose={opts['beta_pose']}  beta_shape={opts['beta_shape']}"
          f"  lambda_temp={opts['lambda_t']}")

    dtype = jnp.float32
    # device mesh (VERDICT round-1 item 3: production integration of the
    # parallel layer): --mesh 0 (auto) uses every visible device; stage 1
    # runs the sharded LM, stage-2 --batched-windows shards the window axis
    mesh_n = opts["mesh"] if opts["mesh"] > 0 else len(jax.devices())
    mesh = None
    if mesh_n > 1:
        from smpltpu.parallel import frames_mesh
        mesh = frames_mesh(mesh_n)
    print(f"[INFO] devices visible: {len(jax.devices())}  mesh size: "
          f"{mesh_n if mesh is not None else 1}")
    if opts["window_chunk"] > 0:
        if not opts["batched_windows"]:
            print("[WARN] --window-chunk only applies with "
                  "--batched-windows; ignored on the sequential path",
                  file=sys.stderr)
        elif opts["cg_rtol"] > 0:
            # the CG tolerance exit is batch-shared under vmap, so chunk
            # width changes each window's truncation point — results are
            # chunk-size-dependent there (see build_chunked_window_fit)
            print("[WARN] --window-chunk with --cg-rtol: per-window optima "
                  "depend on chunk width (batch-shared CG tolerance exit)",
                  file=sys.stderr)

    # Reference parity: OptimizeMultiFrame receives a null jointShapeReg
    # when betaShape == 0 (MultiFrameBA.h:88), leaving shape inert at zero
    # in stage 1 — so stage 1's spec drops the shape dependence there.
    # Stage 2 always passes the 1e5 shape lock, so its spec keeps it.
    spec = make_skeleton_spec(model, init_root_rotation(),
                              with_shape=opts["beta_shape"] > 0)
    spec_s2 = (spec if opts["beta_shape"] > 0 else
               make_skeleton_spec(model, init_root_rotation(), with_shape=True))
    kp = ds["kp_batch"].astype(np.float32)
    poses = np.tile(np.asarray(init_frame_params(dtype=dtype)), (n_frames, 1))
    if opts["multi_start"]:
        # framework extension (round 5): seed EVERY frame with its
        # best-of-starts single-frame fit (one batched multi-start solve,
        # solve/init.py::make_start_set) before the two-stage chain.
        # Measured on video1 at 720x1280 (CPU f64 probe, round 5): the
        # independently-achievable per-frame error is 5.07 px mean while
        # the span-data-init two-stage lands at 7.99 px — the anchor/
        # window warm-start chain loses basins that per-frame multi-start
        # recovers; the residual gap to the two-stage result is the
        # temporal + shared-shape pull, which is the objective's
        # preference, not a solver loss.
        from smpltpu.solve import (best_of_starts, build_fitter,
                                   make_single_frame_problem,
                                   make_start_set)
        # freeze_scale=True: the two-stage chain freezes the per-frame
        # scale dof (gauge fix) and the reference's log.csv eval DISCARDS
        # scale (Utils.h:102-116 quirk) — a seed fitted at s != 1 would
        # be frozen there and evaluated at 1 (measured: 125 px mean).
        # Freezing s=1 in the seeding fit costs nothing in image space:
        # projection is invariant to uniform scaling about the camera
        # center, so any (s, t) optimum has the exact equivalent
        # (1, t / s) that the free translation reaches.
        prob_ms = make_single_frame_problem(
            model, init_root_rotation(), cam,
            beta_pose=opts["beta_pose"], beta_shape=opts["beta_shape"],
            freeze_scale=True)
        starts = make_start_set(kp, prob_ms.spec, cam,
                                orient=opts["orient_init"])
        s_dim = starts.shape[1]
        fit_ms = build_fitter(prob_ms, max_iters=100, dtype=dtype,
                              chunk=0 if n_frames * s_dim <= 640 else 128)
        st_ms = fit_ms(jnp.asarray(starts.reshape(n_frames * s_dim, -1),
                                   dtype),
                       jnp.asarray(np.repeat(kp, s_dim, axis=0), dtype))
        xb, _, _ = best_of_starts(st_ms, n_frames, s_dim)
        poses = np.asarray(xb, np.float32).copy()
        print(f"[INFO] multi-start seeding: {n_frames} frames x {s_dim} "
              "starts, best-of-starts params seed the two-stage chain")
    elif opts["data_init"]:
        # framework extension (NOT reference behavior, which inits every
        # frame blindly at s=1, t=(0,0,3) — main_multi_frame.cpp:88-102):
        # closed-form per-frame depth/translation from the detections
        # (solve/init.py). Seeds BOTH stage-1 anchors and the stage-2
        # window starts, attacking the cold-init basin lottery the single
        # CLI's --multi-start addresses (docs/ROADMAP.md accuracy row).
        # Round 5: --orient-init additionally estimates the ROOT
        # ORIENTATION (weak-perspective Procrustes over the torso
        # detections) — OPT-IN here, unlike the single CLI, because it
        # was measured WORSE for the coupled two-stage chain on video1
        # at 720x1280 (golden mean 7.99 -> 10.9 px: comparable init
        # error, worse anchor basins under the shared-shape solve — see
        # docs/ROADMAP.md round-5 entry). At init time every per-frame
        # R0 is still init_root_rotation(), matching the rest_joints_cam
        # convention the estimator assumes (write-back accumulation only
        # mutates r0 AFTER fitting).
        from smpltpu.solve.init import (
            estimate_frame_init_batch,
            rest_joints_cam,
        )
        rest = rest_joints_cam(spec)
        n_j = len(spec.parents)
        poses[:] = estimate_frame_init_batch(
            kp[:n_frames], rest, cam, n_joints=n_j,
            orient=opts["orient_init"]).astype(np.float32)
    r0 = np.tile(np.asarray(init_root_rotation(), dtype=np.float32),
                 (n_frames, 1, 1))
    shape_w = np.zeros(model.num_shapes, dtype=np.float32)

    # observability (SURVEY.md section 5: metrics/tracing rows)
    metrics = MetricsLogger(jsonl_path=opts["metrics_jsonl"])
    profile_dir = os.path.join(opts["out_dir"], "profile") if opts["profile"] else None

    # checkpoint/resume (framework extension; the reference's 'resume' is
    # accidental log-append only, SURVEY.md section 5 checkpoint row)
    ckpt_base = os.path.join(opts["out_dir"], "checkpoint_multi")
    ck = None
    if opts["resume"]:
        ck = load_checkpoint(ckpt_base, backend="auto")
        if ck is not None:
            print(f"[INFO] resuming from {ckpt_base}.* "
                  f"(next window start {int(ck['next_start'])})")

    rendered = np.zeros(n_frames, dtype=bool)
    # r0 accumulates write-backs; r0_fit[i] is the R0 in effect when
    # poses[i] was last fitted — rendering/eval must pair poses[i] with
    # r0_fit[i] (pairing with the updated r0 would apply rootAA twice)
    r0_fit = r0.copy()
    resume_start = 0

    loss_curve = None

    # ===================== stage 1: anchors =====================
    if ck is not None:
        poses = ck["poses"]
        r0 = ck["r0"]
        r0_fit = ck["r0_fit"]
        shape_w = ck["shape_w"]
        rendered = ck["rendered"].astype(bool)
        resume_start = int(ck["next_start"])
        fused_active = False   # resumed runs keep the sequential stages
        if opts["fused_stages"]:
            print("[WARN] --fused-stages does not apply to a resumed run; "
                  "sequential stages", file=sys.stderr)
    else:
        anchor_idx = list(range(0, n_frames, opts["skip"]))
        print(f"[INFO] stage-1  anchor frames = {len(anchor_idx)}")
        cfg1 = MultiFrameConfig(beta_pose=opts["beta_pose"],
                                beta_shape=opts["beta_shape"],
                                lambda_temporal=opts["lambda_t"],
                                max_iters=opts["max_iters_s1"],
                                linear=opts["linear"],
                                cg_rtol=opts["cg_rtol"])
        n_a = len(anchor_idx)
        # round 5: --fused-stages runs stage-1 + interpolation + stage-2
        # as ONE compiled dispatch (solve/two_stage.py — the bench
        # headline path). The in-graph interpolation reproduces the
        # --init-from-anchors rule exactly, so that flag is required;
        # single-chip, unchunked, fresh (non-resume) runs only.
        fused_active = (opts["fused_stages"] and opts["batched_windows"]
                        and opts["init_from_anchors"] and mesh is None
                        and opts["window_chunk"] == 0)
        if opts["fused_stages"] and not fused_active:
            print("[WARN] --fused-stages needs --batched-windows "
                  "--init-from-anchors on a single chip without "
                  "--window-chunk; falling back to the sequential stages",
                  file=sys.stderr)
        if fused_active:
            # the stage-1 solve + bookkeeping happen inside the fused
            # dispatch (stage-2 section); --init-from-anchors means no
            # anchor r0 write-back, so r0_fit is just a snapshot
            r0_fit = r0.copy()
        else:
            if mesh is not None:
                # frames sharded over the mesh: pad the anchor batch to a
                # multiple of the mesh size with frame_valid=0 rows
                from smpltpu.parallel import build_sharded_lm_fitter, shard_frames
                if opts["linear"] in ("tridiag", "cr"):
                    # exact elimination is sequential across frame shards;
                    # the sharded stage-1 always runs halo-exchange PCG
                    print(f"[INFO] --linear {opts['linear']} applies to the "
                          "single-chip/window solves; sharded stage-1 uses "
                          "the distributed PCG", file=sys.stderr)
                pad = (-n_a) % mesh_n
                a_p = np.tile(np.asarray(init_frame_params(dtype=dtype)),
                              (n_a + pad, 1))
                a_p[:n_a] = poses[anchor_idx]
                a_k = np.zeros((n_a + pad,) + kp.shape[1:], kp.dtype)
                a_k[:n_a] = kp[anchor_idx]
                a_r = np.tile(np.eye(3, dtype=np.float32), (n_a + pad, 1, 1))
                a_r[:n_a] = r0[anchor_idx]
                a_v = np.zeros(n_a + pad, np.float32)
                a_v[:n_a] = 1.0
                fit1 = build_sharded_lm_fitter(mesh, spec, cam, cfg1,
                                               model.num_shapes, dtype=dtype)
                args1 = (shard_frames(mesh, jnp.asarray(a_p)),
                         jnp.asarray(shape_w),
                         shard_frames(mesh, jnp.asarray(a_k)),
                         shard_frames(mesh, jnp.asarray(a_r)),
                         shard_frames(mesh, jnp.asarray(a_v)))
            else:
                fit1 = build_multi_fitter(spec, cam, cfg1, model.num_shapes,
                                          dtype=dtype)
                args1 = (jnp.asarray(poses[anchor_idx]), jnp.asarray(shape_w),
                         jnp.asarray(kp[anchor_idx]), jnp.asarray(r0[anchor_idx]))
            fit1(*args1).params.block_until_ready()  # compile warm-up
            t1 = StageTimer()
            with profile_trace(profile_dir):
                st1 = fit1(*args1)
                st1.params.block_until_ready()
            ms_anchor = t1.ms()
            print(f"[INFO] stage-1 done  ({'success' if bool(jnp.isfinite(st1.cost)) else 'fail'})"
                  f"  in {ms_anchor} ms\n"
                  f"accepted steps: {int(st1.n_accepted)}, final cost: {float(st1.cost):.3f}")
            metrics.log("stage1", ms=ms_anchor, cost=float(st1.cost),
                        accepted=int(st1.n_accepted), anchors=len(anchor_idx))

            anchor_params = np.asarray(st1.params)[:n_a]
            shape_w = np.asarray(st1.shape)
            loss_curve = np.asarray(st1.cost_history)
            anchor_errs, _ = batched_frame_eval(
                model, anchor_params, np.tile(shape_w, (len(anchor_idx), 1)),
                r0[anchor_idx], kp[anchor_idx], cam, want_verts=False)
            append_log(opts["out_dir"],
                       [(fid, float(anchor_errs[k]), ms_anchor / len(anchor_idx))
                        for k, fid in enumerate(anchor_idx)])

            if opts["init_from_anchors"]:
                # framework extension (NOT reference behavior): seed stage-2
                # windows from the stage-1 anchor poses, linearly interpolated
                # between consecutive anchors — windows start near the solution
                # instead of the cold default init, so the hard-coded 60
                # stage-2 iterations converge much further. R0 is left
                # untouched so the interpolated rootAA stays consistent.
                n_a = len(anchor_idx)
                for k, fid in enumerate(anchor_idx):
                    a = fid
                    b = anchor_idx[k + 1] if k + 1 < n_a else n_frames
                    pb = anchor_params[k + 1] if k + 1 < n_a else anchor_params[k]
                    poses[a] = anchor_params[k]
                    for i in range(a + 1, min(b, n_frames)):
                        t = (i - a) / max(b - a, 1)
                        poses[i] = (1.0 - t) * anchor_params[k] + t * pb
            else:
                # write-back effects (and ONLY these — anchor poses deliberately
                # not copied into `poses`, reproducing the reference quirk):
                for k, fid in enumerate(anchor_idx):
                    r0[fid] = np_rodrigues(anchor_params[k, 1:4]) @ r0[fid]
            r0_fit = r0.copy()

    # ===================== stage 2: sliding windows =====================
    stride = opts["wsize"] - opts["overlap"]
    if stride <= 0:
        print("window must exceed overlap", file=sys.stderr)
        return 1
    starts = list(range(0, n_frames, stride))
    cfg2 = MultiFrameConfig(beta_pose=opts["beta_pose"],
                            beta_shape=SHAPE_LOCK,
                            lambda_temporal=opts["lambda_t"],
                            max_iters=opts["s2_iters"],
                            linear=opts["linear"],
                            cg_rtol=opts["cg_rtol"])
    fit2 = build_multi_fitter(spec_s2, cam, cfg2, model.num_shapes, dtype=dtype)
    wsize = opts["wsize"]

    default_pose = np.asarray(init_frame_params(dtype=dtype))
    eye3 = np.eye(3, dtype=np.float32)

    def window_inputs(s):
        e = min(s + wsize, n_frames)
        valid = np.zeros(wsize, np.float32)
        valid[:e - s] = 1.0
        # pad with the DEFAULT pose (scale 1, z 3), not zeros: a zero pose
        # puts padded joints at z=0 whose residuals would blow up the cost
        wp = np.tile(default_pose, (wsize, 1))
        wp[:e - s] = poses[s:e]
        wr = np.tile(eye3, (wsize, 1, 1))
        wr[:e - s] = r0[s:e]
        return (e, jnp.asarray(wp),
                jnp.asarray(_pad_window(kp, s, e, wsize)),
                jnp.asarray(wr),
                jnp.asarray(valid))

    def save_ckpt(next_start):
        save_checkpoint(ckpt_base,
                        dict(poses=poses, r0=r0, r0_fit=r0_fit,
                             shape_w=shape_w, rendered=rendered,
                             next_start=np.int64(next_start)),
                        backend=opts["ckpt_backend"])

    def finish_window(s, e, fitted, ms_win, r0_solve):
        """Write-back + logging + render for one solved window.
        r0_solve is the per-frame R0 the solve actually used (in batched
        mode all windows share the post-stage-1 R0 snapshot)."""
        n_w = e - s
        errs, verts = batched_frame_eval(
            model, fitted[:n_w], np.tile(shape_w, (n_w, 1)),
            r0_solve[:n_w], kp[s:e], cam)
        append_log(opts["out_dir"],
                   [(i, float(errs[i - s]), ms_win / n_w) for i in range(s, e)])
        metrics.log("window", start=s, end=e, ms=ms_win,
                    mean_px=float(np.mean(errs)))
        # write-back: poses keep the optimized values; r0 absorbs rootAA
        poses[s:e] = fitted[:n_w]
        r0_fit[s:e] = r0_solve[:n_w]
        for i in range(s, e):
            r0[i] = np_rodrigues(fitted[i - s, 1:4]) @ r0_solve[i - s]
        # render frames no later window touches
        last_fixed = min(e, s + stride)
        for i in range(s, last_fixed):
            if rendered[i] or i >= len(ds["images"]):
                continue
            render_overlay_image(
                model, verts[i - s], ds["images"][i],
                os.path.join(opts["out_dir"], f"frame_{i}_multi.png"), cam,
                use_jax=opts["jax_render"])
            rendered[i] = True
        save_ckpt(next_start=s + stride)

    if resume_start > 0:
        starts = [s for s in starts if s >= resume_start]
    if opts["batched_windows"]:
        packs = [window_inputs(s) for s in starts]
        n_real = len(packs)
        if opts["window_chunk"] == 0 and mesh is None and n_real > 128:
            # measured: 667 windows unchunked pay the slowest window's
            # iterations across the whole batch (BASELINE.md 10k rows)
            print(f"[INFO] {n_real} windows in one vmapped batch; on long "
                  "videos `--window-chunk 67` (with --cg-rtol 0) bounds "
                  "the slowest-window tail", file=sys.stderr)
        pad_w = (-n_real) % mesh_n if mesh is not None else 0
        if pad_w:  # dummy windows (all-invalid) to fill the mesh
            dummy = (0, jnp.tile(jnp.asarray(default_pose), (wsize, 1)),
                     jnp.zeros_like(packs[0][2]),
                     jnp.tile(jnp.asarray(eye3), (wsize, 1, 1)),
                     jnp.zeros(wsize, jnp.float32))
            packs = packs + [dummy] * pad_w
        bp = jnp.stack([p[1] for p in packs])
        bk = jnp.stack([p[2] for p in packs])
        br = jnp.stack([p[3] for p in packs])
        bv = jnp.stack([p[4] for p in packs])
        bw = jnp.tile(jnp.asarray(shape_w), (len(packs), 1))
        t2 = StageTimer()
        with profile_trace(profile_dir):
            if fused_active:
                # ONE dispatch: stage-1 anchors + in-graph anchor
                # interpolation + all windows (solve/two_stage.py). bp/bw
                # are not consumed — the window starts and the shared
                # shape come out of the stage-1 half in-graph.
                from smpltpu.solve import build_fused_two_stage
                fufit = build_fused_two_stage(
                    spec, cam, cfg1, cfg2, model.num_shapes, anchor_idx,
                    starts, wsize, n_frames, dtype=dtype, spec2=spec_s2)
                print("[INFO] fused two-stage: anchors + windows as ONE "
                      "dispatch (time below includes its compile, like "
                      "the batched sequential path)")
                st1f, st2 = fufit(
                    jnp.asarray(poses[anchor_idx]), jnp.asarray(shape_w),
                    jnp.asarray(kp[anchor_idx]),
                    jnp.asarray(r0[anchor_idx]), bk, br, bv)
            elif mesh is not None:
                # DP over the window axis across the mesh (each device
                # solves its slice with the single-chip fitter);
                # --window-chunk composes: per-device lax.map chunks with
                # local convergence exits (bounds the slowest-window tail
                # on long videos without global-batch synchronization)
                from smpltpu.parallel import sharded_window_fit
                st2 = sharded_window_fit(mesh, fit2, bp, bw, bk, br, bv,
                                         chunk=opts["window_chunk"])
            elif opts["window_chunk"] > 0:
                from smpltpu.solve import build_chunked_window_fit
                st2 = build_chunked_window_fit(
                    fit2, opts["window_chunk"])(bp, bw, bk, br, bv)
            else:
                st2 = jax.jit(jax.vmap(
                    lambda a, b, c, d, e: fit2(a, b, c, d, e)))(
                        bp, bw, bk, br, bv)
            st2.params.block_until_ready()
        ms_total = t2.ms()
        if fused_active:
            # deferred stage-1 bookkeeping from the fused result: the
            # single dispatch has no stage split, so every log.csv row
            # (anchors AND window frames) gets the same amortized
            # per-frame time — total time is preserved for eval.py
            shape_w = np.asarray(st1f.shape)
            loss_curve = np.asarray(st1f.cost_history)
            anchor_params = np.asarray(st1f.params)
            metrics.log("fused_two_stage", ms=ms_total,
                        cost=float(st1f.cost),
                        accepted=int(st1f.n_accepted),
                        anchors=len(anchor_idx), windows=len(starts))
            anchor_errs, _ = batched_frame_eval(
                model, anchor_params,
                np.tile(shape_w, (len(anchor_idx), 1)),
                r0[anchor_idx], kp[anchor_idx], cam, want_verts=False)
            denom = len(anchor_idx) + sum(
                pk[0] - st for pk, st in zip(packs, starts))
            per_frame_ms = ms_total / max(denom, 1)
            append_log(opts["out_dir"],
                       [(fid, float(anchor_errs[k]), per_frame_ms)
                        for k, fid in enumerate(anchor_idx)])
        for wi, s in enumerate(starts):
            e = packs[wi][0]
            ms_w = (per_frame_ms * (e - s) if fused_active
                    else ms_total / len(starts))
            finish_window(s, e, np.asarray(st2.params[wi]),
                          ms_w, np.asarray(packs[wi][3]))
    else:
        first = True
        with profile_trace(profile_dir):
            for s in starts:
                e, wp, wk, wr, wv = window_inputs(s)
                if first:  # compile warm-up so the first window's time is real
                    fit2(wp, jnp.asarray(shape_w), wk, wr, wv).params.block_until_ready()
                    first = False
                print(f"[INFO] window [{s},{e})  solving ...", flush=True)
                t2 = StageTimer()
                st2 = fit2(wp, jnp.asarray(shape_w), wk, wr, wv)
                st2.params.block_until_ready()
                ms_win = t2.ms()
                ok = bool(jnp.isfinite(st2.cost))
                print(f"  -> {'OK' if ok else 'FAIL'}  ({ms_win} ms)")
                shape_w = np.asarray(st2.shape)  # moves ~0 under the lock
                finish_window(s, e, np.asarray(st2.params), ms_win, np.asarray(wr))

    # tail frames (last OVERLAP ones) — recompute their verts in one batch
    tail = [i for i in range(n_frames)
            if not rendered[i] and i < len(ds["images"])]
    if tail:
        _, tail_verts = batched_frame_eval(
            model, poses[tail], np.tile(shape_w, (len(tail), 1)),
            r0_fit[tail], kp[tail], cam)
        for k, i in enumerate(tail):
            render_overlay_image(
                model, tail_verts[k], ds["images"][i],
                os.path.join(opts["out_dir"], f"frame_{i}_multi.png"), cam,
                use_jax=opts["jax_render"])
            rendered[i] = True
    save_ckpt(next_start=n_frames)

    save_params(opts["out_dir"], "params_multi.npz", poses, shape_w,
                extra={"r0_fit": r0_fit})
    if loss_curve is not None:
        with open(os.path.join(opts["out_dir"], "loss_curve.txt"), "w") as f:
            f.write("iteration,loss\n")
            for it, c in enumerate(loss_curve):
                f.write(f"{it},{c}\n")
    metrics.close()
    print(f"[INFO] rendering finished, saved to  {opts['out_dir']}")
    print("done.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
