"""Phase-split rasterizer profile on the real TPU.

Times, per resolution, the three components of the render-everything
path so the speed work targets the true bottleneck (VERDICT round-2
weak #2 asks for a 720x1280 number AND a faster renderer):

  lbs     — fused skinning forward alone (chunk_verts)
  phase1  — per-face setup + sort-based binning alone (_face_setup +
            _bin_faces under one jit, everything before the kernel)
  full    — complete rasterize_tiled (phase1 + Pallas kernel)

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_raster.py
Env: RP_SCALES="0.375 1.0"  RP_FRAMES=100  RP_EDGES=vpu|rows|mxu
     RP_ACT=all (uncapped active set)  RP_ENTRY=all (uncapped sort entries)
     RP_ABLATE=1 (bin/kernel/gather split)  RP_CHECK=1 (pixel parity)
"""

import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from smpltpu.constants import init_root_rotation
    from smpltpu.models import SMPLModel, make_synthetic_model
    from smpltpu.ops.lbs import joint_affines, lbs_pallas, prepare_lbs_operands
    from smpltpu.pipeline.common import params_to_pose
    from smpltpu.render import pallas_raster as pr
    from smpltpu.utils import default_intrinsics

    print(f"devices: {jax.devices()}", file=sys.stderr)
    model = SMPLModel.from_dict(make_synthetic_model(), dtype=jnp.float32)
    cam = default_intrinsics(720, 1280)
    r0j = jnp.asarray(np.asarray(init_root_rotation(), np.float32))
    rng = np.random.default_rng(0)

    ch = int(os.environ.get("RP_FRAMES", "100"))
    params = np.zeros((ch, 76), np.float32)
    params[:, 0] = 1.0
    params[:, 4:7] = (0.1, -0.1, 3.2)
    params[:, 7:] = 0.15 * rng.normal(size=(ch, 69)).astype(np.float32)
    pj = jnp.asarray(params)

    ops_lbs = prepare_lbs_operands(model)
    n_v = model.num_verts
    shp = jnp.zeros(10, jnp.float32)
    shp_tile = jnp.tile(shp[None], (ch, 1))

    def one_affine(p):
        pose = params_to_pose(p, r0j, model.num_joints)
        return joint_affines(model, shp, pose.rotations, pose.root_pos)[0]

    def chunk_verts(pchunk):
        g_aff = jax.vmap(one_affine)(pchunk)
        verts = lbs_pallas(shp_tile, g_aff, ops_lbs)
        return jnp.transpose(verts[:, :, :n_v], (0, 2, 1))

    jverts = jax.jit(chunk_verts)
    vfirst = np.asarray(jverts(pj))
    faces_j = jnp.asarray(np.asarray(model.faces, np.int32))

    def bench(fn, *args, reps=5):
        jax.block_until_ready(fn(*args))   # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lbs = bench(jverts, pj)
    print(f"lbs: {t_lbs * 1e3 / ch:.3f} ms/frame ({ch / t_lbs:.0f} fps)")

    for s_r in [float(x) for x in
                os.environ.get("RP_SCALES", "0.375 1.0").split()]:
        w_r, h_r = int(720 * s_r), int(1280 * s_r)
        fxr, fyr, cxr, cyr = (float(c) * s_r for c in cam)
        bf = float(os.environ.get("RP_BIGFRAC", "0.02"))
        sy, sx = pr.SPAN, pr.SPAN
        for k in range(0, ch, 25):
            s_y, s_x = pr.pick_spans(vfirst[k], np.asarray(model.faces),
                                     fxr, fyr, cxr, cyr, h_r, w_r,
                                     big_frac=bf)
            sy, sx = max(sy, s_y), max(sx, s_x)
        mc, bc, ac, ec = 1, 64, 32, 0
        for k in range(0, ch, 25):
            m, b = pr.pick_cap(vfirst[k], np.asarray(model.faces),
                               fxr, fyr, cxr, cyr, h_r, w_r,
                               span_y=sy, span_x=sx)
            a = pr.pick_active(vfirst[k], np.asarray(model.faces),
                               fxr, fyr, cxr, cyr, h_r, w_r,
                               margin=float(os.environ.get("RP_MARGIN",
                                                           "1.25")))
            e = pr.pick_entries(vfirst[k], np.asarray(model.faces),
                                fxr, fyr, cxr, cyr, h_r, w_r,
                                span_y=sy, span_x=sx,
                                margin=float(os.environ.get("RP_MARGIN",
                                                            "1.25")))
            mc, bc, ac, ec = max(mc, m), max(bc, b), max(ac, a), max(ec, e)
        if os.environ.get("RP_ACT", "") == "all":
            ac = None   # A/B: the exact all-tiles cap (pre-compaction shape)
        if os.environ.get("RP_ENTRY", "") == "all":
            ec = None   # A/B: the uncapped faces x span entry array
        n_ty = -(-h_r // pr.TILE_H)
        n_tx = -(-w_r // pr.TILE_W)
        print(f"--- {w_r}x{h_r}: tiles {n_ty}x{n_tx}={n_ty * n_tx}, "
              f"span {sy}x{sx}, max_chunks {mc}, big_cap {bc}, "
              f"act_cap {ac}, entry_cap {ec}, CHUNK {pr.CHUNK}, "
              f"TILE_H {pr.TILE_H}")

        @jax.jit
        def phase1(vs):
            def one(v):
                u, vv, key, keep = pr._face_setup(v, faces_j, fxr, fyr,
                                                  cxr, cyr)
                sf, first, gbin, big_n, active = pr._bin_faces(
                    u, vv, keep, n_ty, n_tx, bc, sy, sx)
                return sf.sum() + first.sum() + gbin.sum() + big_n \
                    + active.sum()
            return jax.vmap(one)(vs)

        edge_mode = os.environ.get("RP_EDGES", "rows")

        @jax.jit
        def full(vs):
            return jax.vmap(lambda v: pr.rasterize_tiled(
                v, faces_j, fxr, fyr, cxr, cyr, h_r, w_r,
                max_chunks=mc, big_cap=bc, span_y=sy, span_x=sx,
                edge_mode=edge_mode, act_cap=ac, entry_cap=ec)[0])(vs)

        vj = jnp.asarray(vfirst)
        t1 = bench(phase1, vj)
        tf = bench(full, vj)
        print(f"phase1 (setup+bin): {t1 * 1e3 / ch:.3f} ms/frame "
              f"({ch / t1:.0f} fps)")
        print(f"full raster:        {tf * 1e3 / ch:.3f} ms/frame "
              f"({ch / tf:.0f} fps)  -> kernel ~"
              f"{(tf - t1) * 1e3 / ch:.3f} ms/frame")

        # RP_ABLATE=1: incremental ablation INSIDE one jit per stage so
        # the splits add up under the same XLA fusion/overlap regime the
        # e2e number runs in (separately-jitted phase timings do NOT add:
        # the round-4 0.47+0.84+4.2 vs 3.9 ms discrepancy). Stages:
        #   bin     = setup + sort-binning + worklist build (inputs forced)
        #   kernel  = bin + the Pallas kernel (compacted output, no gather)
        #   full    = kernel + gather/crop/covered epilogue
        # Each stage includes everything before it -> differences are the
        # marginal cost of that stage under fusion.
        if os.environ.get("RP_ABLATE", "0") == "1":
            def make_stage(stop):
                @jax.jit
                def fn(vs):
                    def one(v):
                        r = pr.rasterize_tiled(
                            v, faces_j, fxr, fyr, cxr, cyr, h_r, w_r,
                            max_chunks=mc, big_cap=bc, span_y=sy,
                            span_x=sx, edge_mode=edge_mode, act_cap=ac,
                            entry_cap=ec, _stop_after=stop)
                        if stop == "bin":
                            return r
                        if stop == "kernel":
                            return r.sum()
                        return r[0].sum().astype(jnp.int32)
                    return jax.vmap(one)(vs)
                return fn

            tb = bench(make_stage("bin"), vj)
            tk = bench(make_stage("kernel"), vj)
            tg = bench(make_stage("full"), vj)
            print(f"ablate[{w_r}x{h_r}]: bin {tb * 1e3 / ch:.3f} | "
                  f"+kernel {(tk - tb) * 1e3 / ch:.3f} | "
                  f"+gather {(tg - tk) * 1e3 / ch:.3f} | "
                  f"total {tg * 1e3 / ch:.3f} ms/frame "
                  f"(vs full-jit {tf * 1e3 / ch:.3f})")

        # RP_CHECK=1: pixel-parity of the COMPILED Mosaic kernel against
        # the INTERPRET-mode tiled kernel on the live backend (interpret
        # lowers the pallas_call to plain XLA ops). The test suite pins
        # interpret == scatter-min z-buffer on CPU, so this closes the
        # remaining compiled-vs-interpret gap on real hardware. (The
        # z-buffer itself no longer remote-compiles on the tunnel —
        # HTTP 500 in tpu_compile_helper on its giant scatter — and at
        # 720x1280 it OOMs on constant literals; the interpret reference
        # compiles fine at both resolutions.)
        if os.environ.get("RP_CHECK", "0") == "1":
            n_chk = min(int(os.environ.get("RP_CHECK_FRAMES", "8")), ch)

            # reference side runs act_cap=None AND entry_cap=None (exact
            # for ANY frame): a too-small compiled-side cap that truncates
            # active tiles / clips sort entries now shows up as a pixel
            # MISMATCH instead of being invisible (both sides truncating
            # identically)
            @jax.jit
            def iref(vs):
                return jax.vmap(lambda v: pr.rasterize_tiled(
                    v, faces_j, fxr, fyr, cxr, cyr, h_r, w_r,
                    max_chunks=mc, big_cap=bc, span_y=sy, span_x=sx,
                    edge_mode=edge_mode, act_cap=None, entry_cap=None,
                    interpret=True)[0])(vs)

            g_t = np.asarray(full(vj[:n_chk]))
            g_z = np.asarray(iref(vj[:n_chk]))
            diff = int(np.sum(g_t != g_z))
            tot = g_t.size
            print(f"check[{edge_mode}]: {n_chk} frames, "
                  f"{diff}/{tot} differing pixels vs interpret "
                  f"({'PIXEL-EXACT' if diff == 0 else 'MISMATCH'})")
            if diff:
                raise SystemExit(1)


if __name__ == "__main__":
    main()
