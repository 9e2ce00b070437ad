"""Tile-binned Pallas mesh rasterizer.

Replaces the scatter-min z-buffer (render/jax_raster.py, ~50 ms/frame at
480x270 — TPU scatters are slow, ROADMAP round-1 perf row) with a
scatter-FREE two-phase design shaped for the hardware:

  phase 1 (pure JAX, vectorized): per-face setup — projection, backface
     cull, flat shade, packed (depth<<8|gray) key (IDENTICAL semantics to
     jax_raster.rasterize_zbuffer, itself parity-tested against the host
     painter renderer of RenderSMPLMesh.h) — plus SORT-BASED BINNING:
     each face emits (tile_id, face_id) entries for the screen tiles its
     bbox touches; one lax.sort groups them; ranks within each tile give
     a fixed-capacity (n_tiles, cap) bin table. No scatters of fragments,
     only one sort of ~8F small integers.

  phase 2 (Pallas kernel, grid = tile grid): each (8, 128)-pixel tile
     walks its binned faces in chunks; per chunk the three edge functions
     for ALL 1024 pixels are THREE (1024,3)x(3,chunk) MXU matmuls, the
     inside test and key-select are VPU ops, and the running z-buffer is
     a (1024,) VMEM scratch min — the depth test never leaves VMEM.

Triangles spanning more than SPAN_Y x SPAN_X tiles (32 px tall / 256 px
wide) are clipped to that many tiles — same truncation class as
jax_raster's fixed patch window; at SMPL mesh density a triangle spans a
few pixels. Faces beyond a tile's capacity are dropped (capacity is
auto-sized from the binning counts, pow2-bucketed to bound recompiles).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128
SPAN_Y = 4      # default max tile rows a face may touch (32 px tall)
SPAN_X = 2      # default max tile cols a face may touch (256 px wide)
SENTINEL = 0x7FFFFFFF  # int32 max: plain python int so the kernel closure
# does not capture a traced constant
DEPTH_BITS = 22  # packed key: depth<<8 | gray, same as jax_raster


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
    depth_q = jnp.clip(depth / zmax * (2 ** DEPTH_BITS - 2), 0,
                       2 ** DEPTH_BITS - 2).astype(jnp.int32)
    key = jnp.where(keep, (depth_q << 8) | gray, jnp.int32(SENTINEL))
    return u.astype(f32), v.astype(f32), key, keep


def _bin_faces(u, v, keep, n_ty, n_tx, cap, span_y, span_x):
    """Sort-based binning. Returns bins (n_tiles, cap) int32 face indices
    (n_faces = invalid slot) and per-tile counts (clipped to cap)."""
    n_faces = u.shape[0]
    n_tiles = n_ty * n_tx
    ty0 = jnp.clip(jnp.floor(jnp.min(v, 1) / TILE_H).astype(jnp.int32),
                   0, n_ty - 1)
    ty1 = jnp.clip(jnp.floor(jnp.max(v, 1) / TILE_H).astype(jnp.int32),
                   0, n_ty - 1)
    tx0 = jnp.clip(jnp.floor(jnp.min(u, 1) / TILE_W).astype(jnp.int32),
                   0, n_tx - 1)
    tx1 = jnp.clip(jnp.floor(jnp.max(u, 1) / TILE_W).astype(jnp.int32),
                   0, n_tx - 1)
    # bbox fully off-screen -> no entries
    on = keep & (jnp.max(u, 1) >= 0) & (jnp.min(u, 1) < n_tx * TILE_W) \
              & (jnp.max(v, 1) >= 0) & (jnp.min(v, 1) < n_ty * TILE_H)

    tids, fids = [], []
    face_idx = jnp.arange(n_faces, dtype=jnp.int32)
    for dy in range(span_y):
        for dx in range(span_x):
            ty = ty0 + dy
            tx = tx0 + dx
            ok = on & (ty <= ty1) & (tx <= tx1)
            tids.append(jnp.where(ok, ty * n_tx + tx, n_tiles))
            fids.append(face_idx)
    tile_id = jnp.concatenate(tids)
    face_id = jnp.concatenate(fids)

    order = jnp.argsort(tile_id)
    st, sf = tile_id[order], face_id[order]
    first = jnp.searchsorted(st, jnp.arange(n_tiles + 1, dtype=jnp.int32),
                             side="left")
    rank = jnp.arange(st.shape[0], dtype=jnp.int32) - first[jnp.clip(
        st, 0, n_tiles)]
    ok = (st < n_tiles) & (rank < cap)
    row = jnp.where(ok, st, n_tiles)
    col = jnp.where(ok, rank, 0)
    bins = jnp.full((n_tiles + 1, cap), n_faces, jnp.int32)
    bins = bins.at[row, col].set(jnp.where(ok, sf, n_faces))
    counts = jnp.minimum(first[1:n_tiles + 1] - first[:n_tiles], cap)
    return bins[:n_tiles], counts


def _raster_kernel(edge_ref, key_ref, out_ref, acc):
    """One (TILE_H, TILE_W) tile: min-reduce packed keys over the tile's
    binned faces. edge_ref (1, 12, cap) rows = [A0 B0 C0 A1 B1 C1 A2 B2 C2
    pad pad pad]; key_ref (1, cap); out/acc (1, 1024)."""
    cap = edge_ref.shape[2]
    chunk = min(cap, 256)
    n_pix = TILE_H * TILE_W
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    base_x = (tx * TILE_W).astype(jnp.float32)
    base_y = (ty * TILE_H).astype(jnp.float32)

    # pixel matrix (1024, 3): columns cx, cy, 1 at pixel centers; pixel p
    # is (y, x) = (p // TILE_W, p % TILE_W) within the tile
    r_id = jax.lax.broadcasted_iota(jnp.int32, (n_pix, 3), 0)
    c_id = jax.lax.broadcasted_iota(jnp.int32, (n_pix, 3), 1)
    px = (r_id % TILE_W).astype(jnp.float32) + base_x + 0.5
    py = (r_id // TILE_W).astype(jnp.float32) + base_y + 0.5
    pix = jnp.where(c_id == 0, px, jnp.where(c_id == 1, py, 1.0))

    acc[...] = jnp.full((n_pix, 1), SENTINEL, jnp.int32)
    # contract pix's 3-axis with the coefficient rows: (1024, chunk)
    contract = (((1,), (0,)), ((), ()))

    def body(k, _):
        sl = pl.ds(k * chunk, chunk)
        m = edge_ref[0, :, sl]                       # (12, chunk)
        keys = key_ref[:, sl]                        # (1, chunk)
        e0 = jax.lax.dot_general(pix, m[0:3], contract,
                                 preferred_element_type=jnp.float32)
        e1 = jax.lax.dot_general(pix, m[3:6], contract,
                                 preferred_element_type=jnp.float32)
        e2 = jax.lax.dot_general(pix, m[6:9], contract,
                                 preferred_element_type=jnp.float32)
        # jax_raster inside test: sign-consistency vs edge 0, 1e-12 slack
        s0 = e0 >= 0.0
        inside = (((e1 >= 0.0) == s0) | (jnp.abs(e1) < 1e-12)) \
            & (((e2 >= 0.0) == s0) | (jnp.abs(e2) < 1e-12))
        cand = jnp.where(inside, keys, SENTINEL)     # (1024, chunk), exact
        best = jnp.min(cand, axis=1, keepdims=True)  # (1024, 1)
        acc[...] = jnp.minimum(acc[...], best)
        return 0

    jax.lax.fori_loop(0, cap // chunk, body, 0)
    out_ref[...] = acc[...].reshape(1, n_pix)


@partial(jax.jit, static_argnames=("height", "width", "cap", "span_y",
                                   "span_x", "interpret"))
def rasterize_tiled(
    verts_cam: jnp.ndarray,   # (nV, 3) camera-space vertices
    faces: jnp.ndarray,       # (nF, 3) int32
    fx, fy, cx, cy,
    height: int,
    width: int,
    cap: int = 1024,
    span_y: int = SPAN_Y,
    span_x: int = SPAN_X,
    interpret: bool = False,
):
    """Rasterize one frame with the tile-binned kernel. Returns
    (gray (H, W) uint8, covered (H, W) bool) — same contract/semantics as
    jax_raster.rasterize_zbuffer."""
    n_faces = faces.shape[0]
    n_ty = -(-height // TILE_H)
    n_tx = -(-width // TILE_W)
    u, v, key, keep = _face_setup(verts_cam.astype(jnp.float32), faces,
                                  fx, fy, cx, cy)
    bins, _ = _bin_faces(u, v, keep, n_ty, n_tx, cap, span_y, span_x)

    # edge-function coefficients per face: e_k(x, y) = A x + B y + C with
    # (A, B, C) = (by - ay, -(bx - ax), (bx-ax)*(-ay) ... expanded from
    # jax_raster: e = (bx-ax)(cy - ay) - (by-ay)(cx - ax)
    def edge_coef(a_idx, b_idx):
        ax, ay = u[:, a_idx], v[:, a_idx]
        bx, by = u[:, b_idx], v[:, b_idx]
        A = -(by - ay)
        B = (bx - ax)
        C = (by - ay) * ax - (bx - ax) * ay
        return A, B, C

    coefs = []
    for k in range(3):
        coefs.extend(edge_coef(k, (k + 1) % 3))
    coef = jnp.stack(coefs)                       # (9, F)
    # pad with 3 zero rows to a 12-row block (sublane-friendly) and add a
    # sentinel face column whose edges never pass the inside test
    coef = jnp.concatenate([coef, jnp.zeros((3, n_faces), coef.dtype)])
    dead = jnp.zeros((12, 1), coef.dtype).at[0:9:3, 0].set(0.0)
    # sentinel face: all-zero edges => e==0 everywhere => inside is TRUE
    # under the slack test, so its key must be SENTINEL (it is: key[F]).
    coef = jnp.concatenate([coef, dead], axis=1)  # (12, F+1)
    key_ext = jnp.concatenate([key, jnp.full(1, SENTINEL, jnp.int32)])

    edge_t = coef.T[bins].transpose(0, 2, 1)      # (T, 12, cap)
    key_t = key_ext[bins]                         # (T, cap)

    out = pl.pallas_call(
        _raster_kernel,
        out_shape=jax.ShapeDtypeStruct((n_ty * n_tx, TILE_H * TILE_W),
                                       jnp.int32),
        grid=(n_ty, n_tx),
        in_specs=[
            pl.BlockSpec((1, 12, cap), lambda i, j, _ntx=n_tx: (i * _ntx + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap), lambda i, j, _ntx=n_tx: (i * _ntx + j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_H * TILE_W), lambda i, j, _ntx=n_tx: (i * _ntx + j, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TILE_H * TILE_W, 1), jnp.int32)],
        interpret=interpret,
    )(edge_t, key_t)

    buf = out.reshape(n_ty, n_tx, TILE_H, TILE_W).transpose(0, 2, 1, 3)
    buf = buf.reshape(n_ty * TILE_H, n_tx * TILE_W)[:height, :width]
    covered = buf != SENTINEL
    gray_img = (buf & 0xFF).astype(jnp.uint8)
    return jnp.where(covered, gray_img, 0), covered


def pick_cap(verts_cam: np.ndarray, faces: np.ndarray, fx, fy, cx, cy,
             height: int, width: int, lo: int = 128,
             hi: int = 4096) -> tuple:
    """(cap, span_y, span_x): pow2-bucketed bin capacity covering the
    densest tile plus the tile spans covering the largest visible face
    (host-side; bounds jit recompiles like jax_raster.pick_patch)."""
    v = np.asarray(verts_cam, np.float64)
    z = np.maximum(v[:, 2], 1e-8)
    u = fx * v[:, 0] / z + cx
    w = fy * v[:, 1] / z + cy
    f = np.asarray(faces)
    n_ty = -(-height // TILE_H)
    n_tx = -(-width // TILE_W)
    ty0 = np.clip(np.floor(w[f].min(1) / TILE_H).astype(int), 0, n_ty - 1)
    ty1 = np.clip(np.floor(w[f].max(1) / TILE_H).astype(int), 0, n_ty - 1)
    tx0 = np.clip(np.floor(u[f].min(1) / TILE_W).astype(int), 0, n_tx - 1)
    tx1 = np.clip(np.floor(u[f].max(1) / TILE_W).astype(int), 0, n_tx - 1)
    visible = (v[f[:, 0], 2] > 1e-6)
    span_y = span_x = 1
    if f.size:
        span_y = int((ty1 - ty0).max()) + 1
        span_x = int((tx1 - tx0).max()) + 1
    sy = 1
    while sy < span_y:
        sy *= 2
    sx = 1
    while sx < span_x:
        sx *= 2
    counts = np.zeros(n_ty * n_tx, int)
    for dy in range(sy):
        for dx in range(sx):
            sel = (ty0 + dy <= ty1) & (tx0 + dx <= tx1)
            np.add.at(counts, ((ty0 + dy) * n_tx + (tx0 + dx))[sel], 1)
    need = int(counts.max()) if counts.size else lo
    cap = lo
    while cap < min(need, hi):
        cap *= 2
    return cap, sy, sx
