"""Headline benchmark: full-video batched SMPL fitting throughput.

Workload (BASELINE.md target row: >= 100 frames/sec fitted, 1000-frame
video): synthesize MediaPipe-like keypoints for 1000 frames from known
smooth poses, then run the FULL production pipeline on the TPU — stage-1
shared-shape anchor solve (100 anchors x 150 LM iters), warm-started
20-frame sliding windows (overlap 5, shape locked), ALL windows solved at
once as one vmapped multi-frame LM batch (60 iterations each). With more
than one visible device, stage-1 runs the frames-sharded LM and stage-2
shards the window axis over the mesh (smpltpu.parallel).

Measurement boundary (stated per VERDICT round-1): the timed quantity is
the SOLVES (stage-1 + stage-2) on keypoints already in device memory —
the same boundary as the reference's time_ms, which wraps only the
optimization calls (src/main_multi_frame.cpp:123-136,176-188). Keypoint
IO and rendering sit outside the measurement on both sides. The
residual-pixel sanity line on stderr should sit near the injected 1.4 px
observation noise.

Prints exactly ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is value / 100 (the v5e-8 target from BASELINE.json; this
round's number runs on however many chips are visible — one under the
driver's tunnel).
"""

import json
import os
import sys
import time

import numpy as np

N_FRAMES = int(os.environ.get("BENCH_FRAMES", "1000"))
WSIZE = 20
OVERLAP = 5
S2_ITERS = 60
TARGET_FPS = 100.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _enable_compile_cache():
    """Persistent XLA compile cache next to the repo (same directory the
    graft entry uses; shared helper utils/obs.py): warm processes reuse
    the cached executables; the TIMED quantities are all post-compile
    re-runs, so the cache never touches the measurement.
    BENCH_COMPILE_CACHE=0 disables."""
    if os.environ.get("BENCH_COMPILE_CACHE", "1") != "1":
        return
    from smpltpu.utils.obs import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".xla_cache"))


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from smpltpu.constants import N_KP_SLOTS, USE_SMPL, init_root_rotation
    from smpltpu.energy import make_skeleton_spec, skeleton_joints_cam
    from smpltpu.energy.params import init_frame_params
    from smpltpu.energy.reproj import project
    from smpltpu.models import SMPLModel, make_synthetic_model
    from smpltpu.solve import MultiFrameConfig, build_multi_fitter
    from smpltpu.utils import default_intrinsics

    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1:
        from smpltpu.parallel import (
            build_sharded_lm_fitter,
            frames_mesh,
            shard_frames,
            sharded_window_fit,
        )
        mesh = frames_mesh(n_dev)
    log(f"bench: devices = {jax.devices()} -> mesh size {n_dev if mesh else 1}")
    rng = np.random.default_rng(0)
    model = SMPLModel.from_dict(make_synthetic_model(), dtype=jnp.float32)
    cam = default_intrinsics(720, 1280)
    spec = make_skeleton_spec(model, init_root_rotation(), with_shape=True)
    r0c = np.asarray(init_root_rotation(), np.float32)

    # smooth ground-truth motion -> projected keypoints + 1px noise
    # (vectorized host-side: the per-frame pack_frame_params loop was ~5
    # eager jnp dispatches per frame — minutes of setup at BENCH_FRAMES=10k)
    base = rng.normal(size=(23, 3)) * 0.15
    drift = rng.normal(size=(23, 3)) * 0.003
    fidx = np.arange(N_FRAMES, dtype=np.float32)
    # motion phase: identical to fidx for the first 1000 frames (headline
    # workload bit-unchanged), triangle-folded beyond so BENCH_FRAMES
    # scales the LENGTH of the video, not the AMPLITUDE of the motion (a
    # linear ramp reaches 20 rad of root rotation by frame 10k — an
    # unfittable workload artifact, not a solver property)
    ph = 1000.0 - np.abs(np.mod(fidx, 2000.0) - 1000.0)
    gt_np = np.zeros((N_FRAMES, 76), np.float32)
    gt_np[:, 0] = 1.0                       # scale
    gt_np[:, 1] = 2e-3 * ph                 # root_aa
    gt_np[:, 2] = 1e-3 * ph
    gt_np[:, 4] = 0.1 + 1e-3 * ph           # root_t
    gt_np[:, 5] = -0.1
    gt_np[:, 6] = 3.2
    gt_np[:, 7:] = (base[None] + ph[:, None, None] * drift[None]
                    ).reshape(N_FRAMES, 69).astype(np.float32)
    gt = jnp.asarray(gt_np)
    uv = np.asarray(jax.jit(jax.vmap(
        lambda p: project(skeleton_joints_cam(
            p, jnp.zeros(10, jnp.float32), spec), cam)))(gt))
    kp = np.zeros((N_FRAMES, N_KP_SLOTS, 4), np.float32)
    kp[:, :, 0] = USE_SMPL
    kp[:, :, 1:3] = uv[:, USE_SMPL] + rng.normal(
        size=(N_FRAMES, N_KP_SLOTS, 2)).astype(np.float32)
    kp[:, :, 3] = 1.0

    # window batch
    stride = WSIZE - OVERLAP
    starts = list(range(0, N_FRAMES, stride))
    n_win = len(starts)
    kpw = np.zeros((n_win, WSIZE, N_KP_SLOTS, 4), np.float32)
    kpw[:, :, :, 0] = USE_SMPL
    validw = np.zeros((n_win, WSIZE), np.float32)
    for i, s in enumerate(starts):
        e = min(s + WSIZE, N_FRAMES)
        kpw[i, :e - s] = kp[s:e]
        validw[i, :e - s] = 1.0

    # ---- stage 1: shared-shape anchor solve (every 10th frame) ----
    anchor_idx = np.arange(0, N_FRAMES, 10)
    n_a = len(anchor_idx)
    # Shipped default = the measured-fastest config within 0.2 px of the
    # best residual (2026-08-18 v5e sweeps, scripts/analyze_sweep.py):
    # Jacobi-PCG arrowhead solve + fused-cost LM loop + 40 CG iterations
    # -> 1729 frames/s @ 1.32 px. The cg_iters grid: it48 1637 @ 1.22,
    # it44 1684 @ 1.24, it40 1729 @ 1.32, it36 1805 @ 1.42 (out of the
    # 1.41 budget line), it32 1812 @ 1.56 (out). pcg_kernel (whole PCG
    # in one VMEM-resident Pallas program) is FASTER still (1718-2040) but
    # its on-TPU residual drifts 0.2-0.4 px above the XLA loop (MXU f32
    # matmul precision inside the kernel changes the CG trajectory) — out
    # of the residual budget, so not the default. "tridiag" stays the
    # LIBRARY default for exactness on arbitrary conditioning. For 10x
    # longer videos add BENCH_CHUNK=67 (+ CG_ITERS=64 to hold residual):
    # 10k frames 1617 @ 1.25 vs 945 unchunked (the vmapped batch pays its
    # slowest window's iterations across the full width).
    linear = os.environ.get("BENCH_LINEAR", "pcg")
    cg_iters = int(os.environ.get("BENCH_CG_ITERS", "40"))
    cg_unroll = int(os.environ.get("BENCH_CG_UNROLL", "1"))
    cg_rtol = float(os.environ.get("BENCH_CG_RTOL", "0"))
    fused = os.environ.get("BENCH_FUSED", "1") == "1"
    # stage-2 window-batch chunk size (0 = one vmapped batch). Large window
    # batches pay the slowest window's iteration count across the whole
    # width; chunking bounds that tail (build_chunked_window_fit docstring).
    chunk = int(os.environ.get("BENCH_CHUNK", "0"))
    if chunk > 0 and mesh is not None:
        log(f"bench: BENCH_CHUNK={chunk} under a {n_dev}-device mesh: "
            "per-device chunked dispatch (each device lax.maps its local "
            "window slice in chunk-sized batches with local convergence "
            "exits)")
    if chunk > 0 and cg_rtol > 0:
        log("bench: WARNING BENCH_CHUNK with BENCH_CG_RTOL>0: the CG "
            "tolerance exit is batch-shared, so optima depend on chunk "
            "width (see build_chunked_window_fit)")
    cfg1 = MultiFrameConfig(beta_pose=5.0, beta_shape=25.0,
                            lambda_temporal=3.0, max_iters=150, linear=linear,
                            cg_iters=cg_iters, cg_unroll=cg_unroll,
                            cg_rtol=cg_rtol, fused_cost=fused)
    if mesh is not None:
        # frames-sharded LM over the mesh; pad anchors to a mesh multiple
        pad = (-n_a) % n_dev
        a_pn = np.tile(np.asarray(init_frame_params()), (n_a + pad, 1))
        a_kn = np.zeros((n_a + pad,) + kp.shape[1:], np.float32)
        a_kn[:n_a] = kp[anchor_idx]
        a_rn = np.tile(np.eye(3, dtype=np.float32), (n_a + pad, 1, 1))
        a_rn[:n_a] = r0c
        a_vn = np.zeros(n_a + pad, np.float32)
        a_vn[:n_a] = 1.0
        fit1 = build_sharded_lm_fitter(mesh, spec, cam, cfg1, 10)
        args1 = (shard_frames(mesh, jnp.asarray(a_pn)),
                 jnp.zeros(10, jnp.float32),
                 shard_frames(mesh, jnp.asarray(a_kn)),
                 shard_frames(mesh, jnp.asarray(a_rn)),
                 shard_frames(mesh, jnp.asarray(a_vn)))
    else:
        fit1 = build_multi_fitter(spec, cam, cfg1, 10)
        args1 = (jnp.tile(init_frame_params(), (n_a, 1)),
                 jnp.zeros(10, jnp.float32),
                 jnp.asarray(kp[anchor_idx]),
                 jnp.tile(jnp.asarray(r0c), (n_a, 1, 1)))
    log(f"bench: stage-1 {n_a} anchors x 150 iters "
        f"({'sharded LM' if mesh else 'single-chip'}); compiling...")
    t0 = time.perf_counter()
    fit1(*args1).params.block_until_ready()
    log(f"bench: stage-1 compile+first {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    st1 = fit1(*args1)
    st1.params.block_until_ready()
    dt1 = time.perf_counter() - t0

    # warm-start window inits: interpolate between anchors
    anchor_params = np.asarray(st1.params)[:n_a]
    poses = np.zeros((N_FRAMES, anchor_params.shape[1]), np.float32)
    for k, fid in enumerate(anchor_idx):
        nxt = anchor_idx[k + 1] if k + 1 < len(anchor_idx) else N_FRAMES
        pb = anchor_params[k + 1] if k + 1 < len(anchor_idx) else anchor_params[k]
        for i in range(fid, min(nxt, N_FRAMES)):
            t = (i - fid) / max(nxt - fid, 1)
            poses[i] = (1 - t) * anchor_params[k] + t * pb

    # ---- stage 2: ALL windows, one vmapped batch, shape locked ----
    cfg = MultiFrameConfig(beta_pose=5.0, beta_shape=1e5, lambda_temporal=3.0,
                           max_iters=S2_ITERS, linear=linear,
                           cg_iters=cg_iters, cg_unroll=cg_unroll,
                           cg_rtol=cg_rtol, fused_cost=fused)
    fit = build_multi_fitter(spec, cam, cfg, 10)

    pad_w = (-n_win) % n_dev if mesh is not None else 0
    n_batch = n_win + pad_w
    p0 = np.tile(np.asarray(init_frame_params()), (n_batch, WSIZE, 1))
    for i, s in enumerate(starts):
        e = min(s + WSIZE, N_FRAMES)
        p0[i, :e - s] = poses[s:e]
    kpw_b = np.zeros((n_batch,) + kpw.shape[1:], np.float32)
    kpw_b[:n_win] = kpw
    validw_b = np.zeros((n_batch, WSIZE), np.float32)
    validw_b[:n_win] = validw
    p0 = jnp.asarray(p0)
    w0 = jnp.tile(st1.shape, (n_batch, 1))
    r0 = jnp.tile(jnp.asarray(r0c), (n_batch, WSIZE, 1, 1))
    kpj = jnp.asarray(kpw_b)
    vj = jnp.asarray(validw_b)

    if mesh is not None:
        def bfit(a, b, c, d, e):
            return sharded_window_fit(mesh, fit, a, b, c, d, e, chunk=chunk)
    elif chunk > 0:
        from smpltpu.solve import build_chunked_window_fit
        bfit = build_chunked_window_fit(fit, chunk)
    else:
        bfit = jax.jit(jax.vmap(lambda a, b, c, d, e: fit(a, b, c, d, e)))

    log(f"bench: {n_win} windows (+{pad_w} pad) x {WSIZE} frames x "
        f"{S2_ITERS} LM iters on {n_dev if mesh else 1} device(s)"
        + (f", chunked x{chunk}" if chunk > 0 else "")
        + "; compiling...")
    t0 = time.perf_counter()
    st = bfit(p0, w0, kpj, r0, vj)
    st.params.block_until_ready()
    log(f"bench: stage-2 compile+first solve {time.perf_counter() - t0:.1f}s")

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        st = bfit(p0, w0, kpj, r0, vj)
        st.params.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = dt1 + min(times)  # full pipeline: stage 1 + all windows
    fps = N_FRAMES / dt
    log(f"bench: stage-1 {dt1 * 1e3:.0f} ms + stage-2 {min(times) * 1e3:.0f} ms "
        f"-> {fps:.0f} frames/s end-to-end; stage-2 runs: "
        f"{[f'{t * 1e3:.0f}ms' for t in times]}")

    # The whole two-stage chain as ONE compiled dispatch — stage-1,
    # in-graph anchor interpolation, stage-2 (solve/two_stage.py; the
    # host interpolation loop + one tunnel round trip leave the timed
    # path). Round-5 sweep: 1830 fps vs 1760 sequential in the SAME
    # bench invocation (bench_sweep_r5_20260820.log) — SHIPPED as the
    # headline path for the single-chip unchunked config.
    # BENCH_FUSE_STAGES=0 restores the sequential headline; mesh/chunk
    # configs keep the sequential dispatches (the fused program is
    # single-chip, whole-batch). Equality vs the sequential recipe is
    # pinned by tests/test_two_stage.py; the residual below is computed
    # from whichever result the headline quotes.
    fuse_ok = mesh is None and chunk == 0
    if fuse_ok and os.environ.get("BENCH_FUSE_STAGES", "1") == "1":
        from smpltpu.solve import build_fused_two_stage
        fused_fit = build_fused_two_stage(
            spec, cam, cfg1, cfg, 10, anchor_idx, starts, WSIZE, N_FRAMES)
        t0 = time.perf_counter()
        fused_fit(*args1[:4], kpj, r0, vj)[1].params.block_until_ready()
        log(f"bench: fused two-stage compile+first "
            f"{time.perf_counter() - t0:.1f}s")
        times_f = []
        for _ in range(3):
            t0 = time.perf_counter()
            f1, f2 = fused_fit(*args1[:4], kpj, r0, vj)
            f2.params.block_until_ready()
            times_f.append(time.perf_counter() - t0)
        fps_f = N_FRAMES / min(times_f)
        log(f"bench: FUSED single-dispatch pipeline {min(times_f) * 1e3:.0f}"
            f" ms -> {fps_f:.0f} frames/s (sequential: {fps:.0f}) — the "
            f"headline; runs: {[f'{t * 1e3:.0f}ms' for t in times_f]}")
        log(json.dumps({
            "metric": "fused_two_stage_frames_per_sec",
            "value": round(fps_f, 1), "unit": "frames/sec",
            "sequential_fps": round(fps, 1)}))
        fps = fps_f
        st = f2   # residual + render write-back reflect the shipped path

    try:  # peak device memory (the 100k-frame scaling row needs it)
        ms = jax.local_devices()[0].memory_stats()
        if ms and "peak_bytes_in_use" in ms:
            log(f"bench: device memory peak "
                f"{ms['peak_bytes_in_use'] / 2**30:.2f} GiB "
                f"(in use {ms['bytes_in_use'] / 2**30:.2f} GiB)")
    except Exception:
        pass

    # analytic roofline / MFU accounting (utils/roofline.py): where each
    # stage sits vs the v5e MXU-f32 and HBM peaks, and what actually binds
    # it. LM iteration counts are the MEASURED iters_run of the
    # convergence-exit loops, not max_iters.
    from smpltpu.utils.roofline import report, stage_solver
    p_dim = int(p0.shape[-1])
    kp_rows = 2 * N_KP_SLOTS
    it1 = float(np.mean(np.asarray(st1.iters_run)))
    it2 = float(np.mean(np.asarray(st.iters_run).reshape(-1)[:n_win]))
    log("bench: " + report(stage_solver(
        "stage1", 1, n_a, p_dim, 10, kp_rows, it1, cg_iters, linear), dt1))
    log("bench: " + report(stage_solver(
        "stage2", n_win, WSIZE, p_dim, 10, kp_rows, it2, cg_iters, linear),
        min(times)))

    # sanity: the fit must actually have converged to a sensible error
    errs = []
    pa = np.asarray(st.params)
    sample_joints = jax.jit(jax.vmap(
        lambda p, w: project(skeleton_joints_cam(p, w, spec), cam)))
    for i in range(0, n_win, max(1, n_win // 8)):
        s = starts[i]
        e = min(s + WSIZE, N_FRAMES)
        uvs = np.asarray(sample_joints(
            st.params[i][:e - s], jnp.tile(st.shape[i], (e - s, 1))))
        for k in range(0, e - s, 5):
            errs.append(np.linalg.norm(
                uvs[k][USE_SMPL] - kp[s + k, :, 1:3], axis=-1).mean())
    px = float(np.mean(errs))
    log(f"bench: residual pixel error {px:.2f}px (obs noise 1.4px)")

    if os.environ.get("BENCH_RENDER", "0") == "1":
        # Optional render-everything pass (VERDICT round-1 weak #2): skin +
        # rasterize ALL frames with the Pallas tile-binned kernel and report
        # a with-render end-to-end number on stderr. The JSON contract
        # (solver throughput, same boundary as the reference's time_ms)
        # is unchanged. Render res matches BASELINE's rasterizer row
        # (~130k px): the 720x1280 camera scaled by 0.375 -> 270x480.
        from smpltpu.ops.lbs import (
            joint_affines,
            lbs_pallas,
            prepare_lbs_operands,
        )
        from smpltpu.pipeline.common import params_to_pose
        from smpltpu.render.pallas_raster import (
            pick_active,
            pick_cap,
            pick_entries,
            pick_spans,
            rasterize_tiled,
        )

        # per-frame params: first `stride` frames of each window + the tail
        # of the last window (the CLI's write-back convention)
        frame_params = np.zeros((N_FRAMES, pa.shape[-1]), np.float32)
        for i, s in enumerate(starts):
            e = min(s + WSIZE, N_FRAMES)
            take = (e - s) if i == n_win - 1 else min(stride, e - s)
            frame_params[s:s + take] = pa[i, :take]
        shp = jnp.asarray(np.asarray(st.shape)[0])

        # BENCH_RENDER_SCALE=1.0 renders at the video1 source resolution
        # 720x1280 (the reference renders at source res,
        # RenderSMPLMesh.h:40-47); the 0.375 default is the historical
        # ~130k-px raster row (270x480)
        s_r = float(os.environ.get("BENCH_RENDER_SCALE", "0.375"))
        w_r, h_r = int(720 * s_r), int(1280 * s_r)
        fxr, fyr, cxr, cyr = (float(c) * s_r for c in cam)
        r0j = jnp.asarray(r0c)

        # fully fused forward: O(nJ) FK on XLA (precomputed joint-shape
        # regressor, no vertex work) + the Pallas fused blendshape+LBS
        # kernel for the 6890-vert skinning (ops/lbs.py)
        CH = 100
        ops_lbs = prepare_lbs_operands(model)
        n_v = model.num_verts
        shp_tile = jnp.tile(shp[None].astype(jnp.float32), (CH, 1))

        def one_affine(p):
            pose = params_to_pose(p, r0j, model.num_joints)
            return joint_affines(model, shp, pose.rotations,
                                 pose.root_pos)[0]

        def chunk_verts(pchunk):
            g_aff = jax.vmap(one_affine)(pchunk)
            verts = lbs_pallas(shp_tile, g_aff, ops_lbs)   # (CH, 3, nPad)
            return jnp.transpose(verts[:, :, :n_v], (0, 2, 1))

        vfirst = np.asarray(jax.jit(chunk_verts)(jnp.asarray(frame_params[:CH])))
        sy, sx = 1, 1
        mc, bc = 1, 64
        for k in range(0, CH, 25):
            s_y, s_x = pick_spans(vfirst[k], np.asarray(model.faces),
                                  fxr, fyr, cxr, cyr, h_r, w_r)
            sy, sx = max(sy, s_y), max(sx, s_x)
        ac, ec = 32, 0
        for k in range(0, CH, 25):
            m, b = pick_cap(vfirst[k], np.asarray(model.faces),
                            fxr, fyr, cxr, cyr, h_r, w_r,
                            span_y=sy, span_x=sx)
            # margin 1.25: the cap must also hold for the un-sampled
            # frames of the video (overflow tiles render as background /
            # clipped tail segments for entry_cap)
            a = pick_active(vfirst[k], np.asarray(model.faces),
                            fxr, fyr, cxr, cyr, h_r, w_r, margin=1.25)
            e = pick_entries(vfirst[k], np.asarray(model.faces),
                             fxr, fyr, cxr, cyr, h_r, w_r,
                             span_y=sy, span_x=sx, margin=1.25)
            mc, bc, ac, ec = max(mc, m), max(bc, b), max(ac, a), max(ec, e)
        # BENCH_RASTER_ENTRY_CAP: 0 = auto (pick_entries), -1 = off (None)
        ec_env = int(os.environ.get("BENCH_RASTER_ENTRY_CAP", "0"))
        ec = None if ec_env < 0 else (ec_env or ec)
        log(f"bench: raster binning window {sy}x{sx} tiles, "
            f"max_chunks {mc}, big_cap {bc}, act_cap {ac}, entry_cap {ec}")
        faces_j = jnp.asarray(np.asarray(model.faces, np.int32))

        edge_mode = os.environ.get("BENCH_RASTER_EDGES", "rows")

        def render_chunk(pchunk):
            vs = chunk_verts(pchunk)
            return jax.vmap(lambda v: rasterize_tiled(
                v, faces_j, fxr, fyr, cxr, cyr, h_r, w_r,
                max_chunks=mc, big_cap=bc, edge_mode=edge_mode,
                span_y=sy, span_x=sx, act_cap=ac, entry_cap=ec)[0])(vs)

        rchunk = jax.jit(render_chunk)
        pj = jnp.asarray(frame_params)
        t0 = time.perf_counter()
        rchunk(pj[:CH]).block_until_ready()
        log(f"bench: render compile+first chunk {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        outs = []
        for s in range(0, N_FRAMES, CH):
            pj_chunk = pj[s:s + CH]
            if pj_chunk.shape[0] < CH:  # pad the tail to the compiled shape
                pj_chunk = jnp.concatenate(
                    [pj_chunk,
                     jnp.tile(pj_chunk[-1:], (CH - pj_chunk.shape[0], 1))])
            outs.append(rchunk(pj_chunk))
        outs[-1].block_until_ready()
        dtr = time.perf_counter() - t0
        fps_r = N_FRAMES / (dt + dtr)
        log(f"bench: render {N_FRAMES} frames at {w_r}x{h_r} in "
            f"{dtr * 1e3:.0f} ms ({N_FRAMES / dtr:.0f} frames/s raster) -> "
            f"solve+render end-to-end {fps_r:.0f} frames/s")
        # act_cap audit (round-5 review fix): the cap was sized on every-
        # 25th frame x margin 1.25; an un-sampled frame above it silently
        # renders overflow tiles as background. Audit exact active counts
        # on a stride co-prime with the sizing stride (every frame with
        # BENCH_RENDER_AUDIT_CAP=1) AFTER the timed loop.
        from smpltpu.render.pallas_raster import active_count, entries_count
        audit_all = os.environ.get("BENCH_RENDER_AUDIT_CAP", "0") == "1"
        stride_a = 1 if audit_all else 7
        amax, aover, emax, eover = 0, 0, 0, 0
        cv_jit = jax.jit(chunk_verts)
        for s in range(0, N_FRAMES, CH):
            idx = [k for k in range(s, min(s + CH, N_FRAMES))
                   if k % stride_a == 0]
            if not idx:
                continue
            pj_a = jnp.asarray(frame_params[s:s + CH])
            if pj_a.shape[0] < CH:   # pad the tail to the compiled shape
                pj_a = jnp.concatenate(
                    [pj_a, jnp.tile(pj_a[-1:], (CH - pj_a.shape[0], 1))])
            # transfer only the audited rows (host pull dominates the cost)
            vs_a = np.asarray(cv_jit(pj_a)[
                jnp.asarray([k - s for k in idx])])
            for i in range(len(idx)):
                n_act, _ = active_count(
                    vs_a[i], np.asarray(model.faces),
                    fxr, fyr, cxr, cyr, h_r, w_r)
                amax = max(amax, n_act)
                aover += n_act > ac
                if ec is not None:
                    n_ent, _ = entries_count(
                        vs_a[i], np.asarray(model.faces),
                        fxr, fyr, cxr, cyr, h_r, w_r,
                        span_y=sy, span_x=sx)
                    emax = max(emax, n_ent)
                    eover += n_ent > ec
        log(f"bench: act_cap audit (stride {stride_a}): max active "
            f"{amax} vs cap {ac}"
            + (f" — {aover} frames OVER CAP (overflow tiles rendered as "
               f"background; raise margin)" if aover else " — ok"))
        if ec is not None:
            log(f"bench: entry_cap audit (stride {stride_a}): max entries "
                f"{emax} vs cap {ec}"
                + (f" — {eover} frames OVER CAP (tail segments clipped; "
                   f"raise margin)" if eover else " — ok"))
        from smpltpu.render.pallas_raster import CHUNK, TILE_H, TILE_W
        from smpltpu.utils.roofline import stage_lbs, stage_raster
        n_tiles = (-(-h_r // TILE_H)) * (-(-w_r // TILE_W))
        log("bench: " + report(
            stage_lbs("lbs", N_FRAMES, int(model.num_verts)), dtr))
        log("bench: " + report(stage_raster(
            "raster", N_FRAMES, int(model.faces.shape[0]), n_tiles, mc,
            CHUNK, TILE_H * TILE_W, bin_entries=sy * sx, act_cap=ac), dtr,
            dispatches=-(-N_FRAMES // CH)))

    if os.environ.get("BENCH_STREAM", "0") == "1":
        # Serving-latency variant (stderr only; JSON contract unchanged):
        # the causal streaming solver (solve/online.py) — one warm-started
        # jitted LM dispatch per frame, shape locked to the stage-1
        # estimate. Reports per-frame latency p50/p95 and sustained fps;
        # through the tunnel the ~28 ms dispatch floor dominates, on-chip
        # this is the true serving number.
        from smpltpu.solve.online import OnlineConfig, build_online_step

        n_stream = min(N_FRAMES, int(os.environ.get("BENCH_STREAM_FRAMES",
                                                    "200")))
        ocfg = OnlineConfig(beta_pose=5.0, lambda_temporal=3.0, max_iters=20)
        ostep = build_online_step(spec, cam, ocfg, model.num_joints)
        kp_j = jnp.asarray(kp[:n_stream])
        shp0 = st1.shape
        x_prev = jnp.asarray(init_frame_params())
        t0 = time.perf_counter()
        ostep(x_prev, shp0, kp_j[0],
              x_prev, jnp.asarray(0.0, jnp.float32)).x.block_until_ready()
        log(f"bench: stream step compile {time.perf_counter() - t0:.1f}s")
        lat = []
        has_prev = jnp.asarray(0.0, jnp.float32)
        one = jnp.asarray(1.0, jnp.float32)
        for i in range(n_stream):
            t0 = time.perf_counter()
            r = ostep(x_prev, shp0, kp_j[i], x_prev, has_prev)
            r.x.block_until_ready()
            lat.append(time.perf_counter() - t0)
            x_prev, has_prev = r.x, one
        lat_ms = np.asarray(lat) * 1e3
        log(f"bench: stream {n_stream} frames: latency mean "
            f"{lat_ms.mean():.1f} ms, p50 {np.percentile(lat_ms, 50):.1f} ms, "
            f"p95 {np.percentile(lat_ms, 95):.1f} ms -> "
            f"{1e3 / max(lat_ms.mean(), 1e-9):.0f} frames/s sustained")

    if os.environ.get("BENCH_STREAM_SCAN", "0") == "1":
        # Causal-replay throughput (stderr only): the same per-frame online
        # recursion as BENCH_STREAM, but the whole frame chain runs inside
        # ONE lax.scan dispatch (solve/online.build_online_scan) — removes
        # the ~28 ms tunnel dispatch floor from the measurement; this is
        # the on-chip causal serving bound.
        from smpltpu.solve.online import OnlineConfig, build_online_scan

        n_sc = min(N_FRAMES, int(os.environ.get("BENCH_STREAM_FRAMES",
                                                "200")))
        ocfg = OnlineConfig(beta_pose=5.0, lambda_temporal=3.0, max_iters=20)
        oscan = build_online_scan(spec, cam, ocfg, model.num_joints)
        kp_j = jnp.asarray(kp[:n_sc])
        x0 = jnp.asarray(init_frame_params())
        z = jnp.asarray(0.0, jnp.float32)
        t0 = time.perf_counter()
        oscan(x0, st1.shape, kp_j, z)[0].block_until_ready()
        log(f"bench: stream-scan compile+first {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        oscan(x0, st1.shape, kp_j, z)[0].block_until_ready()
        dts = time.perf_counter() - t0
        log(f"bench: stream-scan {n_sc} frames in {dts * 1e3:.0f} ms -> "
            f"{dts * 1e3 / n_sc:.2f} ms/frame amortized, "
            f"{n_sc / dts:.0f} frames/s causal")

    if os.environ.get("BENCH_STREAM_PUMP", "0") == "1":
        # Device-resident request pump (VERDICT r3 #2, stderr only): the
        # SAME per-frame recursion as BENCH_STREAM, but the filter runs as
        # ONE persistent lax.while_loop dispatch — each frame fed and its
        # params returned through ordered io_callbacks (solve/online.
        # OnlinePump). Measures true single-stream serving latency without
        # the per-dispatch executable-launch cost; through the tunnel the
        # remaining floor is the two host<->device callback round-trips.
        from smpltpu.solve.online import (
            OnlineConfig,
            OnlinePump,
            probe_io_callback,
        )

        if not probe_io_callback():
            log("bench: stream-pump SKIPPED — this backend does not "
                "deliver io_callback host calls (the axon remote tunnel "
                "never services them; a pump dispatch would hang). The "
                "pump architecture is measured on the CPU fixture "
                "(tests/test_online.py: p50 6.7 ms vs 10.6 per-dispatch) "
                "and runs on co-located TPU runtimes.")
            os.environ["BENCH_STREAM_PUMP"] = "0"   # fall through

    if os.environ.get("BENCH_STREAM_PUMP", "0") == "1":
        from smpltpu.solve.online import OnlineConfig, OnlinePump

        n_pu = min(N_FRAMES, int(os.environ.get("BENCH_STREAM_FRAMES",
                                                "200")))
        ocfg = OnlineConfig(beta_pose=5.0, lambda_temporal=3.0, max_iters=20)
        pump = OnlinePump(spec, cam, ocfg, model.num_joints, kp.shape[1])
        x0 = jnp.asarray(init_frame_params())
        kp_np = np.asarray(kp[:n_pu])
        # warm-up: compile the persistent program on a sacrificial frame,
        # then restart the pump (start() is re-callable; the restarted
        # dispatch launches from the executable cache)
        t0 = time.perf_counter()
        pump.start(x0, st1.shape, 0.0)
        pump.submit(kp_np[0])
        pump.stop()
        log(f"bench: stream-pump compile+first "
            f"{time.perf_counter() - t0:.1f}s")
        pump.start(x0, st1.shape, 0.0)
        lat_p = []
        for i in range(n_pu):
            t0 = time.perf_counter()
            pump.submit(kp_np[i])
            lat_p.append(time.perf_counter() - t0)
        pump.stop()
        lat_ms = np.asarray(lat_p) * 1e3
        log(f"bench: stream-pump {n_pu} frames: latency mean "
            f"{lat_ms.mean():.1f} ms, p50 {np.percentile(lat_ms, 50):.1f} ms, "
            f"p95 {np.percentile(lat_ms, 95):.1f} ms -> "
            f"{1e3 / max(lat_ms.mean(), 1e-9):.0f} frames/s sustained")
        log(json.dumps({
            "metric": "stream_pump_latency_ms",
            "value": round(float(np.percentile(lat_ms, 50)), 2),
            "unit": "ms p50",
            "p95_ms": round(float(np.percentile(lat_ms, 95)), 2),
            "mean_ms": round(float(lat_ms.mean()), 2)}))

    if os.environ.get("BENCH_SINGLE", "0") == "1":
        # Single-frame batched fit (VERDICT round-2 weak #1): the
        # 3dba_single path under the SHIPPED solver defaults — exact
        # More-Sorensen trust region (solve/lm.LMConfig.exact_tr), CLI
        # defaults max_iters=100, beta_pose=20, beta_shape=30
        # (pipeline/single.py; reference src/main_single_frame.cpp:192-246
        # solves the same per-frame problem serially with Ceres). stderr
        # only; the headline JSON contract is unchanged. Sub-variants:
        #   BENCH_SINGLE_FRAMES=N   batch width (default 128, round-1 row)
        #   BENCH_SINGLE_GMM=1      --use-gmm (vendored pose_prior.txt)
        #   BENCH_SINGLE_MULTISTART=1  --multi-start (data-driven init x
        #                              5 yaw/reference starts per frame)
        #   BENCH_SINGLE_ADAPTIVE=1    --adaptive-start (fit once from the
        #                              data init, multi-start ONLY frames
        #                              above BENCH_SINGLE_ADAPTIVE_PX=6)
        #   BENCH_SINGLE_TR=chol|eigh|dogleg  LMConfig.tr_solver A/B
        from smpltpu.solve import build_fitter, make_single_frame_problem
        from smpltpu.solve.lm import LMConfig

        n_s = min(N_FRAMES, int(os.environ.get("BENCH_SINGLE_FRAMES", "128")))
        # BENCH_SINGLE_GMM: 0 = off, 1 = quality-gate workload (GT sampled
        # near the prior's modes so the row MEASURES GMM fit quality — a
        # prior regression moves it), stress = the prior-vs-data variant
        # (the synthetic motion GT sits far from the modes at beta_pose=20;
        # round-3 row: 756 fps @ 18.8 px — speed row, quality-blind)
        gmm_mode = os.environ.get("BENCH_SINGLE_GMM", "0")
        gmm_d = None
        if gmm_mode in ("1", "stress"):
            from smpltpu.io.gmm import load_pose_prior_txt
            prior_path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "data", "avatar-model", "pose_prior.txt")
            gmm_d = load_pose_prior_txt(prior_path)
        # BENCH_SINGLE_BETA: the CLI-default beta_pose=20 unless overridden.
        # Round-5 oracle probe (ROADMAP): the 1000-frame ramp's tail GT
        # reaches ||joint_aa|| ~ 22, where ANY beta >= 5 makes the
        # objective's GLOBAL optimum abandon the pose (cost 98k at GT vs
        # 3.4k crushed at beta=20) — the beta=0 row shows what the
        # machinery does when the objective permits fitting the data.
        beta_s = float(os.environ.get("BENCH_SINGLE_BETA", "20"))
        prob_s = make_single_frame_problem(
            model, r0c, cam, beta_pose=beta_s, beta_shape=30.0,
            gmm_dict=gmm_d)
        kp_s = kp[:n_s]
        if gmm_d is not None and gmm_mode == "1":
            # quality-gate workload: GT near the prior's DOMINANT
            # component (argmin c_k). The hard-assignment GMM energy is
            # piecewise and at beta_pose=20 the beta^2-scaled component
            # constants make non-dominant-component poses unrecoverable BY
            # THE OBJECTIVE (parking in the dominant basin is cheaper than
            # fitting the data anywhere else — measured round 4, see
            # tests/test_gmm_quality.py docstring). The row therefore
            # fits with prior-seeded multi-start (the SMPLify recipe).
            rng_g = np.random.default_rng(11)
            c_kg = (-np.log(np.asarray(gmm_d["weights"]))
                    + 0.5 * np.asarray(gmm_d["logdet_cov"]))
            top_g = int(np.argmin(c_kg))
            ell_g = np.linalg.cholesky(
                np.asarray(gmm_d["covs"], np.float64))[top_g]
            aa_g = (np.asarray(gmm_d["means"], np.float64)[top_g]
                    + 0.3 * (ell_g @ rng_g.normal(
                        size=(ell_g.shape[-1], n_s))).T)
            gt_g = np.zeros((n_s, 76), np.float32)
            gt_g[:, 0] = 1.0
            gt_g[:, 4:6] = rng_g.normal(size=(n_s, 2)) * 0.1
            gt_g[:, 6] = 3.2
            gt_g[:, 7:] = aa_g.astype(np.float32)
            uv_g = np.asarray(jax.jit(jax.vmap(
                lambda p: project(skeleton_joints_cam(
                    p, jnp.zeros(10, jnp.float32), spec), cam)))(
                        jnp.asarray(gt_g)))
            kp_s = np.zeros((n_s, N_KP_SLOTS, 4), np.float32)
            kp_s[:, :, 0] = USE_SMPL
            kp_s[:, :, 1:3] = uv_g[:, USE_SMPL] + rng_g.normal(
                size=(n_s, N_KP_SLOTS, 2)).astype(np.float32)
            kp_s[:, :, 3] = 1.0
            log("bench: single-frame GMM quality-gate workload (GT near "
                "the prior's dominant mode, prior-seeded multi-start; "
                "BENCH_SINGLE_GMM=stress for the prior-vs-data speed "
                "variant)")
        if (os.environ.get("BENCH_SINGLE_MULTISTART", "0") == "1"
                or (gmm_d is not None and gmm_mode == "1")):
            from smpltpu.solve import make_start_set
            seeds_g = (np.asarray(gmm_d["means"])
                       if gmm_d is not None and gmm_mode == "1" else None)
            starts = make_start_set(kp_s, prob_s.spec, cam,
                                    pose_seeds=seeds_g)
            s_dim = starts.shape[1]
            x0_s = jnp.asarray(starts.reshape(n_s * s_dim, -1), jnp.float32)
            kp_fit = jnp.asarray(np.repeat(kp_s, s_dim, axis=0))
        else:
            s_dim = 1
            x0_s = jnp.tile(init_frame_params(), (n_s, 1))
            kp_fit = jnp.asarray(kp_s)
        tr = os.environ.get("BENCH_SINGLE_TR", "")
        tr_it = int(os.environ.get("BENCH_SINGLE_TR_ITERS", "0"))
        lmcfg = None
        if tr or tr_it:
            # default to the SHIPPED solver (LMConfig.tr_solver="chol") so
            # BENCH_SINGLE_TR_ITERS alone sweeps the chol trip cap rather
            # than silently switching to eigh (which ignores the cap)
            lmcfg = LMConfig(
                max_iters=100, huber_delta=3.0, tr_solver=tr or "chol",
                **({"tr_newton_iters": tr_it} if tr_it else {}))
        # BENCH_SINGLE_CHUNK=N: chunked dispatch (per-chunk convergence
        # exits bound the slowest-frame tail on wide batches)
        chunk_s = int(os.environ.get("BENCH_SINGLE_CHUNK", "0"))
        fitter_s = build_fitter(prob_s, max_iters=100, lm_cfg=lmcfg,
                                chunk=chunk_s)

        if os.environ.get("BENCH_SINGLE_ADAPTIVE", "0") == "1":
            # adaptive multi-start (VERDICT r3 #3): data-init fit for every
            # frame, then the yaw/reference starts ONLY for frames above
            # the pixel threshold (solve/init.py::fit_adaptive)
            from smpltpu.solve import fit_adaptive

            a_px = float(os.environ.get("BENCH_SINGLE_ADAPTIVE_PX", "6"))
            # BENCH_SINGLE_ORIENT=0: disable the weak-perspective root-
            # orientation init (round-5 A/B of the round-4 default)
            a_orient = os.environ.get("BENCH_SINGLE_ORIENT", "1") == "1"
            # BENCH_SINGLE_PROPAGATE=1: temporal-propagation escalation
            # (phase P — warm-started lax.scan over the sequence for
            # frames every static start loses; solve/init.py round 5)
            a_prop = os.environ.get("BENCH_SINGLE_PROPAGATE", "0") == "1"
            t0 = time.perf_counter()
            res_a = fit_adaptive(prob_s, kp_s, 100, px_thresh=a_px,
                                 fitter=fitter_s, orient=a_orient,
                                 propagate=a_prop)
            log(f"bench: single-adaptive compile+first "
                f"{time.perf_counter() - t0:.1f}s ({n_s} frames, "
                f"{res_a.hard_idx.size} hard @ >{a_px}px, "
                f"orient={'on' if a_orient else 'off'}, "
                f"propagate={'on' if a_prop else 'off'})")
            ts_a = []
            for _ in range(3):
                t0 = time.perf_counter()
                res_a = fit_adaptive(prob_s, kp_s, 100, px_thresh=a_px,
                                     fitter=fitter_s, orient=a_orient,
                                     propagate=a_prop)
                ts_a.append(time.perf_counter() - t0)
            fps_a = n_s / min(ts_a)
            uv_a = np.asarray(jax.jit(jax.vmap(
                lambda p: project(skeleton_joints_cam(
                    p, jnp.zeros(10, jnp.float32), prob_s.spec), cam)))(
                        jnp.asarray(res_a.x)))
            px_a = float(np.linalg.norm(
                uv_a[:, USE_SMPL] - kp_s[:, :, 1:3], axis=-1).mean())
            log(f"bench: single-adaptive {n_s} frames in "
                f"{min(ts_a) * 1e3:.0f} ms -> {fps_a:.0f} frames/s, "
                f"residual {px_a:.2f}px ({res_a.hard_idx.size} hard, "
                f"{int(res_a.escalated.sum())} improved); runs: "
                f"{[f'{t * 1e3:.0f}ms' for t in ts_a]}")
            log(json.dumps({
                "metric": "single_frame_adaptive_throughput_frames_per_sec",
                "value": round(fps_a, 1), "unit": "frames/sec",
                "residual_px": round(px_a, 2),
                "hard_frames": int(res_a.hard_idx.size),
                "px_thresh": a_px, "orient": a_orient,
                "propagate": a_prop}))
        t0 = time.perf_counter()
        fitter_s(x0_s, kp_fit).x.block_until_ready()
        log(f"bench: single-frame compile+first {time.perf_counter() - t0:.1f}s"
            f" ({n_s} frames x {s_dim} starts x 100 iters, "
            f"gmm={'on' if gmm_d is not None else 'off'}, "
            f"tr={tr or 'default'})")
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            st_s = fitter_s(x0_s, kp_fit)
            st_s.x.block_until_ready()
            ts.append(time.perf_counter() - t0)
        fps_s = n_s / min(ts)
        # residual on the selected (lowest-cost) start per frame
        xs = np.asarray(st_s.x).reshape(n_s, s_dim, -1)
        cs = np.asarray(st_s.cost).reshape(n_s, s_dim)
        xb = jnp.asarray(xs[np.arange(n_s), np.argmin(cs, axis=1)])
        uv_s = np.asarray(jax.jit(jax.vmap(
            lambda p: project(skeleton_joints_cam(
                p, jnp.zeros(10, jnp.float32), prob_s.spec), cam)))(xb))
        px_s = float(np.linalg.norm(
            uv_s[:, USE_SMPL] - kp_s[:, :, 1:3], axis=-1).mean())
        log(f"bench: single-frame {n_s} frames in {min(ts) * 1e3:.0f} ms -> "
            f"{fps_s:.0f} frames/s, residual {px_s:.2f}px; runs: "
            f"{[f'{t * 1e3:.0f}ms' for t in ts]}")
        if gmm_d is not None and gmm_mode == "1":
            # quality gate: the same modal workload fitted WITHOUT the GMM
            # (the shipped L2 default) — the GMM row must sit within ~1 px
            # of this; a GMM residual/Jacobian regression opens the gap
            # (CPU version pinned by tests/test_gmm_quality.py)
            prob_l2 = make_single_frame_problem(
                model, r0c, cam, beta_pose=20.0, beta_shape=30.0)
            fit_l2 = build_fitter(prob_l2, max_iters=100, lm_cfg=lmcfg,
                                  chunk=chunk_s)
            st_l2 = fit_l2(x0_s, kp_fit)
            st_l2.x.block_until_ready()
            xs_l2 = np.asarray(st_l2.x).reshape(n_s, s_dim, -1)
            cs_l2 = np.asarray(st_l2.cost).reshape(n_s, s_dim)
            xb_l2 = jnp.asarray(
                xs_l2[np.arange(n_s), np.argmin(cs_l2, axis=1)])
            uv_l2 = np.asarray(jax.jit(jax.vmap(
                lambda p: project(skeleton_joints_cam(
                    p, jnp.zeros(10, jnp.float32), prob_l2.spec), cam)))(
                        xb_l2))
            px_l2 = float(np.linalg.norm(
                uv_l2[:, USE_SMPL] - kp_s[:, :, 1:3], axis=-1).mean())
            log(f"bench: GMM quality gate: gmm {px_s:.2f}px vs no-gmm "
                f"{px_l2:.2f}px on the same modal workload "
                f"(gap {px_s - px_l2:+.2f}px, budget ~1px)")
        from smpltpu.utils.roofline import stage_single_frame
        it_s = float(np.mean(np.asarray(st_s.iters_run)))
        log("bench: " + report(stage_single_frame(
            "single", n_s * s_dim, int(x0_s.shape[-1]), kp_rows, it_s,
            tr_solver=tr or "chol"), min(ts)))
        log(json.dumps({
            "metric": "single_frame_throughput_frames_per_sec",
            "value": round(fps_s, 1), "unit": "frames/sec",
            "residual_px": round(px_s, 2), "starts": s_dim,
            "gmm": gmm_d is not None, "tr": tr or "default"}))

    print(json.dumps({
        "metric": "solver_throughput_frames_per_sec_1000frame_video",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / TARGET_FPS, 3),
    }))


if __name__ == "__main__":
    main()
