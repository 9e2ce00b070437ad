"""Tile-binned Pallas mesh rasterizer.

Replaces the scatter-min z-buffer (render/jax_raster.py, ~50 ms/frame at
480x270 — TPU scatters are slow, ROADMAP round-1 perf row) with a
scatter-free two-phase design shaped for the hardware:

  phase 1 (pure JAX, vectorized): per-face setup — projection, backface
     cull, flat shade, packed (depth<<8|gray) key (IDENTICAL semantics to
     jax_raster.rasterize_zbuffer, itself parity-tested against the host
     painter renderer of RenderSMPLMesh.h) — plus SORT-BASED BINNING:
     each face emits (tile_id << 18 | face_id) entries for the screen
     tiles its bbox touches, ONE single-key jnp.sort groups them into
     ragged per-tile segments, and searchsorted gives each tile's
     [first[t], first[t+1]) range. No fixed-capacity bin table, no
     scatters, no sentinel-padded gathers — the per-entry edge data is
     gathered once in sorted order (every byte useful).

  phase 2 (Pallas kernel, grid = (worklist,)): phase 1 knows each tile's
     exact block count (ceil over its segment) AND which tiles can be
     covered at all (non-empty segment or inside a big face's bbox —
     the ACTIVE set), so it emits a COMPACTED active-tile-major worklist
     of (tile, block) pairs: every active tile contributes
     max(blocks, 1) entries, inactive tiles contribute NONE (their
     pixels are materialized as background by a cheap gather after the
     kernel, not by grid steps). The static grid length is
     n_blocks + act_cap; entries beyond the frame's dynamic total are
     flag-guarded no-ops writing a discarded dump block. The
     scalar-prefetched worklist drives both the input BlockSpec index_map
     (which CHUNK-block of sorted edge data to stream) and the output
     index_map (which compacted output slot to write; revisits are
     consecutive by construction). A tile's first worklist entry
     initializes the VMEM z-buffer scratch and sweeps the global
     big-face list. Per block the three edge functions for all tile
     pixels are VPU broadcast FMAs (see edge_mode), the inside test and
     key-select are VPU ops, and the running z-buffer lives in the
     scratch persisting across the tile's consecutive steps. (History:
     the round-2 dense (tiles, max_chunks) grid paid ~2-3 us of
     scheduling per SKIPPED step and truncated long segments; the
     round-3 all-tiles worklist fixed both but still spent ~80% of its
     grid at 720x1280 on init/big-sweep/write steps for provably-blank
     tiles — the body covers ~200 of 960 tiles — which the active
     compaction removes.)

Faces whose bbox spans more than a span_y x span_x tile window
(span_y*TILE_H px tall x span_x*TILE_W px wide) go to a small global
list that every tile also walks (their edge tests mask them outside
their bbox), so nothing is truncated — per-tile segments are walked in
full by the worklist (pick_cap survives only to pow2-bucket big_cap and
keep call-site signatures stable; its max_chunks output is unused).

The binning window must track resolution: at 270x480 the default 2x2
window (16 px x 256 px) fits nearly every SMPL face, but at the video1
source resolution 720x1280 typical faces are 10-30 px tall, thousands
spill onto the global big list, and the every-tile big sweep becomes
the whole kernel (measured 23.8 ms/frame = 41 fps, 2026-08-19 TPU
phase profile — scripts/profile_raster.py). pick_spans auto-sizes
(span_y, span_x) so the big list stays rare; each face emits
span_y*span_x sort entries, so the phase-1 sort grows with the window
— the auto-sizer balances the two.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (8, 128) is the f32 VMEM native tile; TILE_H is import-time tunable
# for A/Bs (must stay a multiple of 8 — sublane granularity)
TILE_H = int(os.environ.get("SMPLTPU_RASTER_TILE_H", "8"))
if TILE_H <= 0 or TILE_H % 8 != 0:
    raise ValueError(
        f"SMPLTPU_RASTER_TILE_H must be a positive multiple of 8 (the f32 "
        f"VMEM sublane granularity), got {TILE_H} — a bad value would only "
        "surface later as an opaque Mosaic compile error")
TILE_W = 128
SPAN = 2          # default binning window (span_y = span_x = SPAN tiles
                  # per face); resolution-dependent — see pick_spans
# faces processed per kernel step (import-time override for A/Bs).
# v5e sweep at SMPL density, 270x480 (2026-08-18): 128/256/512/1024/2048
# -> 164/242/259/223/140 frames/s — 512 is the knee (fewer grid steps
# amortize per-step scheduling until VMEM blocks and wasted lanes on
# sparse tiles win), shipped as the default.
CHUNK = int(os.environ.get("SMPLTPU_RASTER_CHUNK", "512"))
if CHUNK <= 0:
    raise ValueError(f"SMPLTPU_RASTER_CHUNK must be positive, got {CHUNK}")
FACE_BITS = 18    # face id occupies the low bits of the packed sort key
SENTINEL = 0x7FFFFFFF  # int32 max; plain python int so the kernel closure
                       # does not capture a traced constant


def _face_setup(verts_cam, faces, fx, fy, cx, cy):
    """Per-face screen data with jax_raster-identical semantics.
    Returns (u, v (F,3) pixel coords, key (F,) int32 packed, keep (F,))."""
    f32 = verts_cam.dtype
    tri = verts_cam[faces]                       # (F, 3, 3)
    z = tri[..., 2]
    valid = jnp.all(z > 1e-6, axis=-1)
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = fx * tri[..., 0] / zs + cx
    v = fy * tri[..., 1] / zs + cy

    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    n = jnp.cross(e1, e2)
    keep = valid & (n[:, 2] < 0.0)

    center = tri.mean(axis=1)
    n_hat = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
    view = -center / jnp.maximum(
        jnp.linalg.norm(center, axis=-1, keepdims=True), 1e-30)
    shade = jnp.clip(jnp.sum(n_hat * view, axis=-1), 0.0, 1.0)
    gray = jnp.round(220.0 * shade).astype(jnp.int32)

    depth = center[:, 2]
    zmax = jnp.max(jnp.where(keep, depth, 0.0)) + 1e-6
    depth_q = jnp.clip(depth / zmax * (2 ** 22 - 2), 0,
                       2 ** 22 - 2).astype(jnp.int32)
    key = jnp.where(keep, (depth_q << 8) | gray, jnp.int32(SENTINEL))
    return u.astype(f32), v.astype(f32), key, keep


def _tile_ranges(u, v, n_ty, n_tx):
    ty0 = jnp.clip(jnp.floor(jnp.min(v, 1) / TILE_H).astype(jnp.int32),
                   0, n_ty - 1)
    ty1 = jnp.clip(jnp.floor(jnp.max(v, 1) / TILE_H).astype(jnp.int32),
                   0, n_ty - 1)
    tx0 = jnp.clip(jnp.floor(jnp.min(u, 1) / TILE_W).astype(jnp.int32),
                   0, n_tx - 1)
    tx1 = jnp.clip(jnp.floor(jnp.max(u, 1) / TILE_W).astype(jnp.int32),
                   0, n_tx - 1)
    return ty0, ty1, tx0, tx1


def _bin_faces(u, v, keep, n_ty, n_tx, big_cap, span_y=SPAN, span_x=SPAN):
    """Sorted ragged binning. Returns (sf (Np,) face ids in sorted-entry
    order padded with n_faces, first (T+1,) segment offsets, gbin
    (big_cap,) global big-face ids, big_n (), active (T,) bool — tiles
    with a non-empty segment OR inside some listed big face's bbox; only
    active tiles can receive coverage, so the worklist skips the rest)."""
    n_faces = u.shape[0]
    n_tiles = n_ty * n_tx
    ty0, ty1, tx0, tx1 = _tile_ranges(u, v, n_ty, n_tx)
    on = keep & (jnp.max(u, 1) >= 0) & (jnp.min(u, 1) < n_tx * TILE_W) \
              & (jnp.max(v, 1) >= 0) & (jnp.min(v, 1) < n_ty * TILE_H)
    big = on & ((ty1 - ty0 >= span_y) | (tx1 - tx0 >= span_x))
    small = on & jnp.logical_not(big)

    face_idx = jnp.arange(n_faces, dtype=jnp.int32)
    packs = []
    for dy in range(span_y):
        for dx in range(span_x):
            ty = ty0 + dy
            tx = tx0 + dx
            ok = small & (ty <= ty1) & (tx <= tx1)
            tid = jnp.where(ok, ty * n_tx + tx, n_tiles)
            packs.append((tid << FACE_BITS) | face_idx)
    packed = jnp.sort(jnp.concatenate(packs))            # ONE single-key sort
    st = (packed >> FACE_BITS).astype(jnp.int32)
    sf = (packed & ((1 << FACE_BITS) - 1)).astype(jnp.int32)
    sf = jnp.where(st < n_tiles, sf, n_faces)            # sentinel tail
    first = jnp.searchsorted(st, jnp.arange(n_tiles + 1, dtype=jnp.int32),
                             side="left").astype(jnp.int32)

    pad = (-sf.shape[0]) % CHUNK
    if pad:
        sf = jnp.concatenate([sf, jnp.full(pad, n_faces, jnp.int32)])

    brank = jnp.cumsum(big.astype(jnp.int32)) - 1
    bok = big & (brank < big_cap)
    gbin = jnp.full(big_cap + 1, n_faces, jnp.int32)
    gbin = gbin.at[jnp.where(bok, brank, big_cap)].set(
        jnp.where(bok, face_idx, n_faces))
    big_n = jnp.minimum(jnp.sum(big.astype(jnp.int32)), big_cap)

    # Tile activity: a tile can only be covered if a small face binned
    # into its segment (seg > 0) or a LISTED big face's clipped bbox
    # contains it (edge tests never pass outside a face's bbox). Big
    # coverage as a dense (n_tiles, big_cap) bbox-containment test
    # against the just-built big list — 4 broadcast compares, no TPU
    # scatter (a difference-array formulation measured +0.45 ms/frame
    # in scatter-adds at 720x1280).
    seg = first[1:] - first[:-1]
    glist = gbin[:big_cap]
    sent = jnp.int32(n_ty + n_tx + 2)          # sentinel slot: empty bbox
    bty0 = jnp.concatenate([ty0, sent[None]])[glist]
    bty1 = jnp.concatenate([ty1, -sent[None]])[glist]
    btx0 = jnp.concatenate([tx0, sent[None]])[glist]
    btx1 = jnp.concatenate([tx1, -sent[None]])[glist]
    tyi = (jnp.arange(n_tiles, dtype=jnp.int32) // n_tx)[:, None]
    txi = (jnp.arange(n_tiles, dtype=jnp.int32) % n_tx)[:, None]
    cov = ((tyi >= bty0[None, :]) & (tyi <= bty1[None, :])
           & (txi >= btx0[None, :]) & (txi <= btx1[None, :])).any(axis=1)
    active = (seg > 0) | cov
    return sf, first, gbin[:big_cap], big_n, active


def _build_worklist(first, active, n_tiles, n_blocks, act_cap):
    """ACTIVE-tile-major (tile, block, is_first, out_slot) worklist.

    Tile t's segment [first[t], first[t+1]) touches blocks
    [first[t]//CHUNK, (first[t+1]-1)//CHUNK]. Only ACTIVE tiles (seg > 0
    or big-bbox-covered — _bin_faces) emit entries: active tiles with an
    empty segment emit one (z-buffer init + big sweep + output write),
    inactive tiles emit NONE — their output is materialized as SENTINEL
    by the caller's gather, never by a grid step. At 720x1280 the body
    covers ~200 of 960 tiles, and the all-tiles worklist spent ~80% of
    its grid steps on init/sweep/write for provably-blank tiles.

    Static length L = n_blocks + act_cap bounds the dynamic total (each
    active tile adds at most one straddle block beyond its pro-rata
    share). Entries beyond the dynamic total carry out_slot == act_cap
    (the dump output block) — the kernel skips init and accumulate for
    them, so padding costs one scratch write to a discarded block plus
    grid scheduling. Active ranks beyond act_cap are DROPPED (those
    tiles render as background) — callers must size act_cap >= the
    frame's active-tile count (pick_active; the default act_cap=n_tiles
    can never drop). Returns int32 (L,) arrays (tile, blk, init, slot)
    plus at_out (act_cap,): out-slot -> tile id, padding slots -> n_tiles."""
    n_l = n_blocks + act_cap
    first = first.astype(jnp.int32)
    seg = first[1:] - first[:-1]
    blk0 = first[:-1] // CHUNK
    blk1 = jnp.maximum(first[1:] - 1, 0) // CHUNK
    n_blk = jnp.where(seg > 0, blk1 - blk0 + 1, 1).astype(jnp.int32)

    act = active.astype(jnp.int32)
    rank = jnp.cumsum(act) - 1                    # rank among active tiles
    n_act = jnp.minimum(jnp.sum(act), act_cap)
    tid = jnp.arange(n_tiles, dtype=jnp.int32)
    at_tile = jnp.zeros(act_cap + 1, jnp.int32)
    at_tile = at_tile.at[jnp.where(active & (rank < act_cap),
                                   rank, act_cap)].set(tid)
    at_tile = at_tile[:act_cap]                   # padding slots -> tile 0
    valid_r = jnp.arange(act_cap, dtype=jnp.int32) < n_act
    at_out = jnp.where(valid_r, at_tile, n_tiles)

    nblk_r = jnp.where(valid_r, n_blk[at_tile], 0)
    base = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(nblk_r).astype(jnp.int32)])
    total = base[-1]
    i = jnp.arange(n_l, dtype=jnp.int32)
    r = jnp.clip(jnp.searchsorted(base, i, side="right") - 1,
                 0, act_cap - 1).astype(jnp.int32)
    tile = at_tile[r]
    within = i - base[r]
    blk = jnp.clip(blk0[tile] + within, 0, n_blocks - 1)
    live = i < total
    init = ((within == 0) & live).astype(jnp.int32)
    slot = jnp.where(live, r, act_cap).astype(jnp.int32)
    return tile, blk, init, slot, at_out


def _raster_kernel(scal_ref, edge_ref, key_ref, gedge_ref, gkey_ref,
                   out_ref, acc, *, edge_mode="vpu", n_tiles=0, n_l=0,
                   act_cap=0):
    """Grid step i: worklist entry i = (tile t, CHUNK-block blk) of t's
    sorted segment [first[t], first[t+1]); the tile's first entry also
    initializes the z-buffer scratch and sweeps the global big-face list.
    scal_ref (T+2+4L,) = [first (T+1), n_tx<<16|big_n, wl_tile (L),
    wl_blk (L), wl_init (L), wl_slot (L)]; edge_ref (12, CHUNK) block of
    the sorted edge data; key_ref (1, CHUNK); g* refs the (12|1, big_cap)
    global list; out (1, TILE_H, TILE_W) — block wl_slot[i] of the
    COMPACTED (act_cap+1)-slot output (slot act_cap = discarded dump for
    padding entries); acc (TILE_H*TILE_W, 1) scratch persisting across
    the tile's consecutive steps.

    edge_mode picks how e(x,y) = A x + B y + C is evaluated per pixel:
      "rows" — hoisted broadcasts on a (TILE_H, TILE_W, c) pair tensor:
               px*A is row-invariant (computed once as (1, TILE_W, c),
               1/TILE_H of pair cost) and py*B + C is column-invariant
               ((TILE_H, 1, c), ~1/TILE_W), so the per-pair cost per edge
               is ONE broadcast add; the inside test is min(e0,e1,e2) >
               -eps (2 mins + 1 compare instead of 3 compares + 2 ands)
               and the segment straddle mask is folded into the keys at
               (1, c) cost instead of AND-ing over the pair tensor.
               ~8 VPU ops/pair vs "vpu"'s ~19 on a kernel that is
               measured VPU-bound on exactly that tensor. The summation
               ASSOCIATION differs from "vpu" ((px*A) + (py*B + C) vs
               ((px*A) + (py*B)) + C), which can flip sub-1e-12 edge
               ties — the pixel-exact parity suite gates it (the "vpu"
               form already rounds differently from jax_raster's direct
               cross-product edges and stays pixel-identical at SMPL
               scales).
      "vpu"  — broadcast FMAs (n_pix,1)*(1,CHUNK): native-f32 VPU math,
               no matmul. The MXU route pads the K=3 contraction to the
               systolic tile and needs Precision.HIGHEST's multi-pass
               decomposition to resolve sub-pixel edges — all waste at
               K=3; the FMA form computes the same f32 sum directly.
               Measured on v5e (2026-08-18 A/B, bench render-everything):
               197 -> 242 frames/s raster (+23%), pixel-identical on the
               interpret-mode parity suite and the bench workload.
      "mxu"  — the original (1024,3)x(3,CHUNK) HIGHEST dot_generals.
    """
    n_pix = TILE_H * TILE_W
    i = pl.program_id(0)
    t = scal_ref[n_tiles + 2 + i]
    is_init = scal_ref[n_tiles + 2 + 2 * n_l + i] == 1
    live = scal_ref[n_tiles + 2 + 3 * n_l + i] < act_cap
    lo = scal_ref[t]
    hi = scal_ref[t + 1]
    start = scal_ref[n_tiles + 2 + n_l + i] * CHUNK

    # tile pixel origin (tile linear id t -> (ty, tx) via the x tile count
    # baked in statically through the out_ref alias trick is not available;
    # the caller passes n_tx packed into scal_ref's tail slot instead — see
    # rasterize_tiled)
    ntx = scal_ref[n_tiles + 1] >> 16          # high half: n_tx
    big_n = scal_ref[n_tiles + 1] & 0xFFFF     # low half: big-face count
    base_x = ((t % ntx) * TILE_W).astype(jnp.float32)
    base_y = ((t // ntx) * TILE_H).astype(jnp.float32)

    # pixel matrix (1024, 3): columns cx, cy, 1 at pixel centers
    r_id = jax.lax.broadcasted_iota(jnp.int32, (n_pix, 3), 0)
    c_id = jax.lax.broadcasted_iota(jnp.int32, (n_pix, 3), 1)
    contract = (((1,), (0,)), ((), ()))

    def make_pix():
        if edge_mode == "rows":
            wid = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W, 1), 1)
            hid = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, 1, 1), 0)
            px = wid.astype(jnp.float32) + (base_x + 0.5)
            py = hid.astype(jnp.float32) + (base_y + 0.5)
            return px, py
        if edge_mode == "vpu":
            rid = jax.lax.broadcasted_iota(jnp.int32, (n_pix, 1), 0)
            px = (rid % TILE_W).astype(jnp.float32) + base_x + 0.5
            py = (rid // TILE_W).astype(jnp.float32) + base_y + 0.5
            return px, py
        px = (r_id % TILE_W).astype(jnp.float32) + base_x + 0.5
        py = (r_id // TILE_W).astype(jnp.float32) + base_y + 0.5
        return jnp.where(c_id == 0, px, jnp.where(c_id == 1, py, 1.0))

    pix = make_pix()

    def inside_of(m):
        """(TILE_H, TILE_W, c) [rows] or (n_pix, c) [vpu/mxu] inside mask
        for the edge-coefficient block m (12, c)."""
        if edge_mode == "rows":
            px, py = pix
            c = m.shape[1]
            es = []
            for k in range(3):
                a = m[3 * k + 0].reshape(1, 1, c)
                b = m[3 * k + 1].reshape(1, 1, c)
                cc = m[3 * k + 2].reshape(1, 1, c)
                es.append(px * a + (py * b + cc))
            # phase-1 canonical winding: interior pixels have all three
            # edges >= 0 up to the shared tie slack, so all-of-three is
            # min-of-three
            return jnp.minimum(jnp.minimum(es[0], es[1]), es[2]) > -1e-12
        if edge_mode == "vpu":
            px, py = pix
            e0 = px * m[0:1, :] + py * m[1:2, :] + m[2:3, :]
            e1 = px * m[3:4, :] + py * m[4:5, :] + m[5:6, :]
            e2 = px * m[6:7, :] + py * m[7:8, :] + m[8:9, :]
        else:
            hi_p = jax.lax.Precision.HIGHEST
            e0 = jax.lax.dot_general(pix, m[0:3], contract, precision=hi_p,
                                     preferred_element_type=jnp.float32)
            e1 = jax.lax.dot_general(pix, m[3:6], contract, precision=hi_p,
                                     preferred_element_type=jnp.float32)
            e2 = jax.lax.dot_general(pix, m[6:9], contract, precision=hi_p,
                                     preferred_element_type=jnp.float32)
        # phase 1 canonicalizes winding (coefs of negative-screen-area
        # faces are sign-flipped), so jax_raster's sign-consistency test
        # ((sign e1 == sign e0 | tiny) & (sign e2 == sign e0 | tiny))
        # collapses to three compares — interior pixels have all three
        # edges >= 0 up to the same 1e-12 tie slack. ~35% fewer VPU ops
        # on the (pixels x CHUNK) pair tensor, which IS the kernel.
        return (e0 > -1e-12) & (e1 > -1e-12) & (e2 > -1e-12)

    rows = edge_mode == "rows"

    def accumulate(inside, keys):
        """Fold candidate keys (already segment-masked) under inside."""
        if rows:
            cand = jnp.where(inside, keys.reshape(1, 1, -1), SENTINEL)
            acc[...] = jnp.minimum(acc[...], jnp.min(cand, axis=2))
        else:
            cand = jnp.where(inside, keys, SENTINEL)
            acc[...] = jnp.minimum(acc[...],
                                   jnp.min(cand, axis=1, keepdims=True))

    @pl.when(is_init)
    def _():
        acc[...] = jnp.full(acc.shape, SENTINEL, jnp.int32)
        big_cap = gedge_ref.shape[1]
        gchunk = min(big_cap, CHUNK)

        def gbody(i, _):
            sl = pl.ds(i * gchunk, gchunk)
            accumulate(inside_of(gedge_ref[:, sl]), gkey_ref[:, sl])
            return 0

        n_g = jnp.minimum(pl.cdiv(big_n, jnp.int32(gchunk)),
                          big_cap // gchunk)
        jax.lax.fori_loop(0, n_g, gbody, 0)

    # live: padding entries (slot == act_cap) do no work at all; lo < hi:
    # an active tile with an EMPTY segment (big-bbox coverage only) must
    # not burn a full (pixels x CHUNK) block whose column mask is empty
    @pl.when(live & (lo < hi) & (start < hi))
    def _():
        # mask entries outside this tile's segment (chunk straddle) — a
        # per-COLUMN property, so fold it into the keys at (1, CHUNK)
        # cost rather than AND-ing the (pixels x CHUNK) pair tensor
        col = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + start
        ok = (col >= lo) & (col < hi)
        keym = jnp.where(ok, key_ref[...], SENTINEL)
        accumulate(inside_of(edge_ref[...]), keym)

    out_ref[...] = acc[...].reshape(1, TILE_H, TILE_W)


@partial(jax.jit, static_argnames=("height", "width", "max_chunks",
                                   "big_cap", "interpret", "edge_mode",
                                   "span_y", "span_x", "act_cap",
                                   "entry_cap", "_stop_after"))
def rasterize_tiled(
    verts_cam: jnp.ndarray,   # (nV, 3) camera-space vertices
    faces: jnp.ndarray,       # (nF, 3) int32
    fx, fy, cx, cy,
    height: int,
    width: int,
    max_chunks: int = 4,      # UNUSED (kept for call-site compat): the
                              # worklist grid sizes itself exactly; no
                              # per-tile budget or truncation exists
    big_cap: int = 256,
    interpret: bool = False,
    edge_mode: str = "rows",  # see _raster_kernel; "vpu"/"mxu" = legacy
    span_y: int = SPAN,       # binning window in tiles (pick_spans
    span_x: int = SPAN,       # auto-sizes per resolution)
    act_cap: int | None = None,  # max ACTIVE tiles the grid schedules
                              # (pick_active; None = n_tiles, exact for
                              # any frame). Active ranks beyond act_cap
                              # render as BACKGROUND — size it to the
                              # frame (see _build_worklist).
    entry_cap: int | None = None,  # max REAL sort entries kept after the
                              # single-key sort (pick_entries; None =
                              # faces x span window, exact). The sort
                              # groups real entries first and sentinels
                              # last, so a cap >= the frame's real-entry
                              # count is EXACT while shrinking the
                              # (12, Np) sorted-edge gather/materialize
                              # — measured 57% of the 720x1280 frame was
                              # phase-1 marshaling, round-5 ablation.
                              # Segments straddling a too-small cap are
                              # CLIPPED (late faces of high-tile-id rows
                              # drop) — size it to the frame.
    _stop_after: str = "full",  # profiling ablation (scripts/
                              # profile_raster.py RP_ABLATE): "bin" stops
                              # after phase 1 + worklist build (returns a
                              # checksum forcing all kernel inputs),
                              # "kernel" returns the compacted kernel
                              # output without the gather/crop epilogue
):
    """Rasterize one frame with the tile-binned kernel. Returns
    (gray (H, W) uint8, covered (H, W) bool) — same contract/semantics as
    jax_raster.rasterize_zbuffer."""
    del max_chunks
    n_faces = faces.shape[0]
    assert n_faces < (1 << FACE_BITS)
    n_ty = -(-height // TILE_H)
    n_tx = -(-width // TILE_W)
    # n_tx and big_n share one int32 scalar in the kernel (n_tx<<16 | big_n,
    # _raster_kernel:254-255); out-of-range values would silently corrupt
    # tile origins. pick_cap caps big_cap at 8192, but the arg is public.
    assert big_cap < (1 << 16), f"big_cap {big_cap} >= 65536 overflows the packed scalar"
    assert n_tx < (1 << 15), f"n_tx {n_tx} >= 32768 overflows the packed scalar"
    n_tiles = n_ty * n_tx
    if act_cap is None:
        act_cap = n_tiles
    act_cap = min(act_cap, n_tiles)
    u, v, key, keep = _face_setup(verts_cam.astype(jnp.float32), faces,
                                  fx, fy, cx, cy)
    sf, first, gbin, big_n, active = _bin_faces(u, v, keep, n_ty, n_tx,
                                                big_cap, span_y, span_x)
    if entry_cap is not None and entry_cap < sf.shape[0]:
        # keep the leading cap entries (real entries sort before the
        # sentinel tail; CHUNK-align so the block grid stays exact) and
        # clip segment offsets into the kept range
        cap = -(-max(int(entry_cap), 1) // CHUNK) * CHUNK
        if cap < sf.shape[0]:
            first = jnp.minimum(first, cap)
            sf = sf[:cap]
    n_blocks = sf.shape[0] // CHUNK

    # edge-function coefficients per face: e(x, y) = A x + B y + C
    # expanded from jax_raster's e = (bx-ax)(cy - ay) - (by-ay)(cx - ax)
    def edge_coef(a_idx, b_idx):
        ax, ay = u[:, a_idx], v[:, a_idx]
        bx, by = u[:, b_idx], v[:, b_idx]
        return (-(by - ay), (bx - ax), (by - ay) * ax - (bx - ax) * ay)

    coefs = []
    for k in range(3):
        coefs.extend(edge_coef(k, (k + 1) % 3))
    coef = jnp.stack(coefs)                       # (9, F)
    # canonicalize winding: flip coef signs where the SCREEN-space area
    # is negative, so interior pixels always see all three edges >= 0
    # (the kernel's inside test is then 3 compares instead of the
    # sign-consistency form — see _raster_kernel.edges). Screen area is
    # computed from the projected u,v directly (not inferred from the
    # camera-space normal) so near-degenerate perspective cases stay
    # exact.
    area = ((u[:, 1] - u[:, 0]) * (v[:, 2] - v[:, 0])
            - (v[:, 1] - v[:, 0]) * (u[:, 2] - u[:, 0]))
    coef = coef * jnp.where(area < 0.0, -1.0, 1.0)[None, :].astype(coef.dtype)
    # pad to 12 rows (sublane-friendly) + sentinel face column: all-zero
    # edges are "inside" under the slack test, so its key must be (and is)
    # SENTINEL
    coef = jnp.concatenate([coef, jnp.zeros((3, n_faces), coef.dtype)])
    coef = jnp.concatenate([coef, jnp.zeros((12, 1), coef.dtype)], axis=1)
    key_ext = jnp.concatenate([key, jnp.full(1, SENTINEL, jnp.int32)])

    edge_sorted = coef[:, sf]                     # (12, Np) useful gather
    key_sorted = key_ext[sf][None]                # (1, Np)
    gedge = coef[:, gbin]                         # (12, big_cap)
    gkey = key_ext[gbin][None]                    # (1, big_cap)

    # scalars: first offsets + packed (n_tx << 16 | big_n) tail slot +
    # the active-compacted worklist (tile, block, is_first, out_slot)
    n_l = n_blocks + act_cap
    wl_tile, wl_blk, wl_init, wl_slot, at_out = _build_worklist(
        first, active, n_tiles, n_blocks, act_cap)
    tail = (jnp.int32(n_tx) << 16) | big_n.astype(jnp.int32)
    scal = jnp.concatenate([first, tail[None], wl_tile, wl_blk, wl_init,
                            wl_slot])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_l,),
        in_specs=[
            pl.BlockSpec((12, CHUNK),
                         lambda i, s: (0, s[n_tiles + 2 + n_l + i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK),
                         lambda i, s: (0, s[n_tiles + 2 + n_l + i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, gbin.shape[0]), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gbin.shape[0]), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_H, TILE_W),
                               lambda i, s: (s[n_tiles + 2 + 3 * n_l + i],
                                             0, 0),
                               memory_space=pltpu.VMEM),
        # "rows" reduces its (TILE_H, TILE_W, CHUNK) pair tensor over the
        # lane axis, so the z-buffer scratch keeps the (TILE_H, TILE_W)
        # layout; the 2D modes reduce (n_pix, CHUNK) over lanes into
        # (n_pix, 1)
        scratch_shapes=[pltpu.VMEM(
            (TILE_H, TILE_W) if edge_mode == "rows" else (TILE_H * TILE_W, 1),
            jnp.int32)],
    )
    if edge_mode not in ("rows", "vpu", "mxu"):
        raise ValueError(
            f"edge_mode must be 'rows', 'vpu' or 'mxu', got {edge_mode!r}")
    if _stop_after == "bin":
        # force every kernel input (same producer graph, no pallas_call)
        return (scal.sum() + edge_sorted.sum() + key_sorted.sum()
                + gedge.sum() + gkey.sum() + active.sum())
    out = pl.pallas_call(
        partial(_raster_kernel, edge_mode=edge_mode, n_tiles=n_tiles,
                n_l=n_l, act_cap=act_cap),
        out_shape=jax.ShapeDtypeStruct((act_cap + 1, TILE_H, TILE_W),
                                       jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scal, edge_sorted, key_sorted, gedge, gkey)
    if _stop_after == "kernel":
        return out

    # expand the compacted output back to the tile grid with a GATHER
    # (TPU-friendly; the inverse scatter would lower to a slice loop):
    # tile t reads its active rank's slot, inactive tiles (and active
    # ranks dropped by a too-small act_cap) read SENTINEL. Slots beyond
    # the dynamic active count were never written by any grid step —
    # their garbage is masked off by `filled` here.
    rank = jnp.cumsum(active.astype(jnp.int32)) - 1
    filled = active & (rank < act_cap)
    tiles_full = jnp.where(filled[:, None, None],
                           out[jnp.clip(rank, 0, act_cap - 1)],
                           jnp.int32(SENTINEL))
    buf = tiles_full.reshape(n_ty, n_tx, TILE_H, TILE_W).transpose(0, 2, 1, 3)
    buf = buf.reshape(n_ty * TILE_H, n_tx * TILE_W)[:height, :width]
    covered = buf != SENTINEL
    gray_img = (buf & 0xFF).astype(jnp.uint8)
    return jnp.where(covered, gray_img, 0), covered


def _face_tile_spans(verts_cam, faces, fx, fy, cx, cy, height, width):
    v = np.asarray(verts_cam, np.float64)
    z = np.maximum(v[:, 2], 1e-8)
    u = fx * v[:, 0] / z + cx
    w = fy * v[:, 1] / z + cy
    f = np.asarray(faces)
    n_ty = -(-height // TILE_H)
    n_tx = -(-width // TILE_W)
    uf, wf = u[f], w[f]
    ty0 = np.clip(np.floor(wf.min(1) / TILE_H).astype(int), 0, n_ty - 1)
    ty1 = np.clip(np.floor(wf.max(1) / TILE_H).astype(int), 0, n_ty - 1)
    tx0 = np.clip(np.floor(uf.min(1) / TILE_W).astype(int), 0, n_tx - 1)
    tx1 = np.clip(np.floor(uf.max(1) / TILE_W).astype(int), 0, n_tx - 1)
    return ty0, ty1, tx0, tx1, n_ty, n_tx


def pick_cap(verts_cam: np.ndarray, faces: np.ndarray, fx, fy, cx, cy,
             height: int, width: int, hi: int = 8192,
             span_y: int = SPAN, span_x: int = SPAN) -> tuple:
    """(max_chunks, big_cap): static per-tile chunk budget covering the
    densest tile's segment (+1 for chunk straddle) and the global big-face
    capacity, pow2-bucketed to bound jit recompiles. span_y/span_x must
    match the rasterize_tiled call (use pick_spans first)."""
    ty0, ty1, tx0, tx1, n_ty, n_tx = _face_tile_spans(
        verts_cam, faces, fx, fy, cx, cy, height, width)
    big = (ty1 - ty0 >= span_y) | (tx1 - tx0 >= span_x)
    counts = np.zeros(n_ty * n_tx, int)
    for dy in range(span_y):
        for dx in range(span_x):
            sel = (~big) & (ty0 + dy <= ty1) & (tx0 + dx <= tx1)
            np.add.at(counts, ((ty0 + dy) * n_tx + (tx0 + dx))[sel], 1)
    need = int(counts.max()) if counts.size else 1
    mc = 1
    while mc * CHUNK < min(need, hi):
        mc *= 2
    mc += 1  # chunk straddle: a segment can touch one extra block
    nbig = int(big.sum())
    # 128-slot floor (the f32 VMEM lane width), NOT CHUNK: every tile
    # sweeps ceil(big_n/gchunk) gchunk-slot blocks of the big list at its
    # init step, so an oversized cap multiplies work across ALL tiles
    # (960 tiles x the 512-vs-actual slack was a large slice of the
    # full-res kernel)
    big_cap = 128
    while big_cap < min(max(nbig, 1), hi):
        big_cap *= 2
    return mc, big_cap


def pick_active(verts_cam: np.ndarray, faces: np.ndarray, fx, fy, cx, cy,
                height: int, width: int, margin: float = 1.0,
                floor: int = 32) -> int:
    """act_cap for rasterize_tiled: pow2-bucketed count of tiles touched
    by any face's clipped screen bbox (a superset of the traced active
    set, which additionally culls backfaces/behind-camera faces — so the
    cap can never drop a tile for THIS frame). Batched callers sampling
    frames should pass margin > 1 (e.g. 1.25) so un-sampled frames stay
    under the cap; a frame whose active count exceeds act_cap renders
    its overflow tiles as background."""
    n_active, n_tiles = active_count(verts_cam, faces, fx, fy, cx, cy,
                                     height, width)
    cap = floor
    while cap < min(int(np.ceil(n_active * margin)), n_tiles):
        cap *= 2
    return min(cap, n_tiles)


def entries_count(verts_cam: np.ndarray, faces: np.ndarray, fx, fy, cx, cy,
                  height: int, width: int, span_y: int = SPAN,
                  span_x: int = SPAN) -> tuple:
    """(n_entries, n_max): upper bound on the frame's REAL sort entries
    (kept small faces x tiles their clipped bbox touches) vs the
    uncapped total faces*span_y*span_x. Applies the same behind-camera
    and backface culls as the traced _face_setup — WITH a tolerance
    band (near-degenerate normals stay counted) so f32-vs-f64 rounding
    can never make this a subset of the traced set. Host numpy; the
    audit twin of pick_entries, like active_count for pick_active."""
    v = np.asarray(verts_cam, np.float64)
    f = np.asarray(faces)
    tri = v[f]                                          # (F, 3, 3)
    valid = (tri[..., 2] > 1e-6).all(axis=1)
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    n_z = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    scale = np.abs(e1).max(1) * np.abs(e2).max(1) + 1e-30
    kept = valid & (n_z < 1e-6 * scale)   # traced: n_z < 0, f32
    ty0, ty1, tx0, tx1, _, _ = _face_tile_spans(
        verts_cam, faces, fx, fy, cx, cy, height, width)
    dy = ty1 - ty0
    dx = tx1 - tx0
    small = kept & (dy < span_y) & (dx < span_x)
    n = int(((dy + 1) * (dx + 1))[small].sum())
    return n, len(ty0) * span_y * span_x


def pick_entries(verts_cam: np.ndarray, faces: np.ndarray, fx, fy, cx, cy,
                 height: int, width: int, span_y: int = SPAN,
                 span_x: int = SPAN, margin: float = 1.0) -> int:
    """entry_cap for rasterize_tiled: pow2-bucketed superset count of the
    frame's real sort entries (see entries_count). The single-key sort
    places real entries before the sentinel tail, so any cap >= the real
    count is pixel-EXACT while shrinking the (12, Np) sorted-edge
    gather/materialization AND the static kernel grid (round-5 ablation:
    phase-1 marshaling was 2.9 of 5.1 ms/frame at 720x1280). Batched
    callers sampling frames should pass margin > 1 (e.g. 1.25); a frame
    whose real count exceeds the cap gets its highest-tile-id segments
    CLIPPED (those rows render the remaining faces only)."""
    n, n_max = entries_count(verts_cam, faces, fx, fy, cx, cy,
                             height, width, span_y, span_x)
    # 4096-granular bucket (NOT pow2): the static sorted-edge arrays are
    # sized by the cap, so a pow2 bucket wastes up to 2x of the gather it
    # exists to shrink — measured at 720x1280: cap 20480 (this rule) 485
    # fps raster vs pow2's 32768 at 434 (r5c sweep log). Coarser than
    # CHUNK so caps stay stable across similar frames (compile reuse).
    cap = max(-(-min(int(np.ceil(n * margin)), n_max) // 4096) * 4096,
              CHUNK)
    return min(cap, n_max)


def active_count(verts_cam: np.ndarray, faces: np.ndarray, fx, fy, cx, cy,
                 height: int, width: int) -> tuple:
    """(n_active, n_tiles): exact count of tiles touched by any face's
    clipped screen bbox for ONE frame (host numpy; the superset-of-traced
    active set pick_active buckets). Batched callers that sized act_cap
    from sampled frames can audit un-sampled frames with this — a frame
    whose count exceeds act_cap renders overflow tiles as background."""
    ty0, ty1, tx0, tx1, n_ty, n_tx = _face_tile_spans(
        verts_cam, faces, fx, fy, cx, cy, height, width)
    diff = np.zeros((n_ty + 1, n_tx + 1), np.int64)
    np.add.at(diff, (ty0, tx0), 1)
    np.add.at(diff, (ty0, tx1 + 1), -1)
    np.add.at(diff, (ty1 + 1, tx0), -1)
    np.add.at(diff, (ty1 + 1, tx1 + 1), 1)
    cov = diff.cumsum(0).cumsum(1)[:n_ty, :n_tx]
    return int((cov > 0).sum()), n_ty * n_tx


def pick_spans(verts_cam: np.ndarray, faces: np.ndarray, fx, fy, cx, cy,
               height: int, width: int, big_frac: float = 0.02,
               max_span: int = 8) -> tuple:
    """(span_y, span_x): smallest pow2 binning window (in tiles) that
    keeps the global big-face list under ``big_frac`` of the faces.

    Every tile sweeps the WHOLE big list at its k==0 step, so big faces
    cost O(n_tiles * big_n) — at 720x1280 the default 2x2 window leaves
    thousands of 10-30 px faces on the list and the sweep IS the kernel
    (23.8 ms/frame). Growing the window trades big-sweep work for
    span_y*span_x sort entries per face (phase-1 sort is ~0.5 ms/frame —
    cheap). Pow2-bucketed; pass the result to pick_cap AND
    rasterize_tiled."""
    ty0, ty1, tx0, tx1, _, _ = _face_tile_spans(
        verts_cam, faces, fx, fy, cx, cy, height, width)
    n = max(len(ty0), 1)

    def big_fraction(sy, sx):
        return np.sum((ty1 - ty0 >= sy) | (tx1 - tx0 >= sx)) / n

    # grow GREEDILY along whichever axis shrinks the big list more per
    # doubling (each doubling costs the same 2x sort entries either way);
    # growing one axis blindly can never fix a spill on the OTHER axis —
    # e.g. wide short faces keep (tx1-tx0 >= span_x) true no matter how
    # large span_y gets, and a y-only loop would inflate sort entries 4x
    # for nothing. Ties prefer span_y (a y-doubling adds only TILE_H=8
    # rows of window height vs TILE_W=128 columns).
    span_y, span_x = SPAN, SPAN
    while ((span_y < max_span or span_x < max_span)
           and big_fraction(span_y, span_x) > big_frac):
        f_y = big_fraction(span_y * 2, span_x) if span_y < max_span else np.inf
        f_x = big_fraction(span_y, span_x * 2) if span_x < max_span else np.inf
        if f_y <= f_x:
            span_y *= 2
        else:
            span_x *= 2
    return span_y, span_x


def render_overlay_tiled(verts_cam, faces, img_bgr: np.ndarray,
                         fx, fy, cx, cy) -> np.ndarray:
    """Composite the tiled render over a (H, W, 3) uint8 image (host).
    Drop-in for jax_raster.render_overlay_jax; auto-sizes the chunk
    budget and runs the kernel in interpret mode off-TPU."""
    h, w = img_bgr.shape[:2]
    sy, sx = pick_spans(np.asarray(verts_cam), np.asarray(faces),
                        fx, fy, cx, cy, h, w)
    mc, bc = pick_cap(np.asarray(verts_cam), np.asarray(faces),
                      fx, fy, cx, cy, h, w, span_y=sy, span_x=sx)
    ac = pick_active(np.asarray(verts_cam), np.asarray(faces),
                     fx, fy, cx, cy, h, w)
    # per-frame exact cap (margin 1.0): this frame's own count can never
    # overflow it, so the truncation is pixel-exact here
    ec = pick_entries(np.asarray(verts_cam), np.asarray(faces),
                      fx, fy, cx, cy, h, w, span_y=sy, span_x=sx)
    interp = jax.default_backend() == "cpu"
    gray, covered = rasterize_tiled(
        jnp.asarray(verts_cam), jnp.asarray(np.asarray(faces, np.int32)),
        float(fx), float(fy), float(cx), float(cy), h, w,
        max_chunks=mc, big_cap=bc, interpret=interp, span_y=sy, span_x=sx,
        act_cap=ac, entry_cap=ec)
    gray = np.asarray(gray)
    covered = np.asarray(covered)
    out = img_bgr.copy()
    out[covered] = gray[covered][:, None]
    return out
