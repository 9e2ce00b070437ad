"""Tile-binned Pallas rasterizer vs the scatter-min z-buffer reference.

Runs the kernel in interpret mode on the CPU test backend; the compiled
TPU path is exercised by bench.py / the CLI on real hardware. The two
rasterizers share the per-face setup semantics (projection, cull, shade,
packed key), so agreement must be pixel-EXACT once neither side truncates
(adaptive patch for the scatter version, auto cap/span for the tiled one).
"""

import numpy as np
import pytest

from smpltpu.render.jax_raster import pick_patch, rasterize_zbuffer
from smpltpu.render.pallas_raster import pick_cap, rasterize_tiled

FX = FY = 200.0
CX, CY = 64.0, 48.0
H, W = 96, 128


def _tiled(verts, faces, caps):
    import jax.numpy as jnp
    max_chunks, big_cap = caps
    g, c = rasterize_tiled(jnp.asarray(verts), jnp.asarray(faces),
                           FX, FY, CX, CY, H, W, max_chunks=max_chunks,
                           big_cap=big_cap, interpret=True)
    return np.asarray(g), np.asarray(c)


def test_single_triangle_matches_zbuffer():
    import jax.numpy as jnp
    verts = np.array([[-0.2, -0.2, 2.0], [0.2, -0.2, 2.0], [0.0, 0.3, 2.0]],
                     np.float32)
    faces = np.array([[0, 2, 1]], np.int32)
    g1, c1 = rasterize_zbuffer(jnp.asarray(verts), jnp.asarray(faces),
                               FX, FY, CX, CY, H, W, patch=128)
    g2, c2 = _tiled(verts, faces, pick_cap(verts, faces, FX, FY, CX, CY, H, W))
    np.testing.assert_array_equal(np.asarray(c1), c2)
    np.testing.assert_array_equal(np.asarray(g1), g2)
    assert c2.sum() > 100  # actually drew something


def test_full_mesh_pixel_exact(small_model_dict):
    """Whole synthetic mesh: the tiled kernel must reproduce the z-buffer
    render pixel-for-pixel (occlusion, shading, tie-breaks)."""
    import jax.numpy as jnp

    from smpltpu.models import SMPLModel, smpl_forward

    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float32)
    out = smpl_forward(model, jnp.zeros(10),
                       jnp.broadcast_to(jnp.eye(3), (24, 3, 3)),
                       jnp.asarray([0.0, 0.0, 2.5]))
    verts = np.asarray(out["verts"], np.float32)
    faces = np.asarray(model.faces, np.int32)
    patch = pick_patch(verts, faces, FX, FY, CX, CY)
    g1, c1 = rasterize_zbuffer(jnp.asarray(verts), jnp.asarray(faces),
                               FX, FY, CX, CY, H, W, patch=patch)
    g2, c2 = _tiled(verts, faces, pick_cap(verts, faces, FX, FY, CX, CY, H, W))
    np.testing.assert_array_equal(np.asarray(c1), c2)
    np.testing.assert_array_equal(np.asarray(g1), g2)
    assert c2.sum() > 500


def test_edge_mode_mxu_matches_vpu(small_model_dict):
    """The legacy MXU edge evaluation (K=3 HIGHEST dot_generals), the
    VPU broadcast-FMA form, and the hoisted-broadcast "rows" form must
    agree pixel-for-pixel — all compute the f32 sum A*x + B*y + C (the
    "rows" association (px*A) + (py*B + C) can only differ inside the
    1e-12 tie slack, which no SMPL-scale face exercises)."""
    import jax.numpy as jnp

    from smpltpu.models import SMPLModel, smpl_forward

    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float32)
    out = smpl_forward(model, jnp.zeros(10),
                       jnp.broadcast_to(jnp.eye(3), (24, 3, 3)),
                       jnp.asarray([0.0, 0.0, 2.5]))
    verts = np.asarray(out["verts"], np.float32)
    faces = np.asarray(model.faces, np.int32)
    mc, bc = pick_cap(verts, faces, FX, FY, CX, CY, H, W)
    outs = {}
    for mode in ("vpu", "mxu", "rows"):
        g, c = rasterize_tiled(jnp.asarray(verts), jnp.asarray(faces),
                               FX, FY, CX, CY, H, W, max_chunks=mc,
                               big_cap=bc, interpret=True, edge_mode=mode)
        outs[mode] = (np.asarray(g), np.asarray(c))
    for mode in ("mxu", "rows"):
        np.testing.assert_array_equal(outs["vpu"][1], outs[mode][1],
                                      err_msg=mode)
        np.testing.assert_array_equal(outs["vpu"][0], outs[mode][0],
                                      err_msg=mode)


def test_span_variants_pixel_exact(small_model_dict):
    """The binning window (span_y, span_x) redistributes faces between
    per-tile segments and the global big list — NEVER changes the image.
    Render at a close camera so faces genuinely span many tiles (the
    720x1280 regime where pick_spans grows the window), then assert every
    span choice is pixel-identical to the z-buffer reference."""
    import jax.numpy as jnp

    from smpltpu.models import SMPLModel, smpl_forward
    from smpltpu.render.pallas_raster import pick_spans

    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float32)
    out = smpl_forward(model, jnp.zeros(10),
                       jnp.broadcast_to(jnp.eye(3), (24, 3, 3)),
                       jnp.asarray([0.0, 0.0, 1.2]))  # close-up: big faces
    verts = np.asarray(out["verts"], np.float32)
    faces = np.asarray(model.faces, np.int32)
    patch = pick_patch(verts, faces, FX, FY, CX, CY)
    g_ref, c_ref = rasterize_zbuffer(jnp.asarray(verts), jnp.asarray(faces),
                                     FX, FY, CX, CY, H, W, patch=patch)
    auto = pick_spans(verts, faces, FX, FY, CX, CY, H, W)
    assert auto >= (2, 2)
    for sy, sx in {(2, 2), (4, 2), (4, 4), auto}:
        mc, bc = pick_cap(verts, faces, FX, FY, CX, CY, H, W,
                          span_y=sy, span_x=sx)
        # the close-up scene floods the global big-face list, so run the
        # hoisted "rows" kernel here too — it gates the mode's big-sweep
        # path (gbody) against the z-buffer reference where it matters
        for mode in ("vpu", "rows") if (sy, sx) == (2, 2) else ("vpu",):
            g, c = rasterize_tiled(jnp.asarray(verts), jnp.asarray(faces),
                                   FX, FY, CX, CY, H, W, max_chunks=mc,
                                   big_cap=bc, interpret=True,
                                   span_y=sy, span_x=sx, edge_mode=mode)
            np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c),
                                          err_msg=f"span {sy}x{sx} {mode}")
            np.testing.assert_array_equal(np.asarray(g_ref), np.asarray(g),
                                          err_msg=f"span {sy}x{sx} {mode}")


def test_pick_spans_grows_the_spilling_axis():
    """A purely HORIZONTAL spill (wide 300 px, short 8 px faces) must grow
    span_x, not span_y — growing span_y can never remove an x-axis spill
    from the big list and would only multiply phase-1 sort entries
    (the pre-fix code grew span_y to max_span first, 4x entries for
    nothing)."""
    from smpltpu.render.pallas_raster import pick_spans

    hh, ww = 128, 1024  # 16 y-tiles x 8 x-tiles
    rng = np.random.default_rng(3)
    verts, faces = [], []
    for i in range(50):
        x0 = rng.uniform(-1.5, 0.5)
        y0 = rng.uniform(-0.2, 0.2)
        verts.extend([[x0, y0, 1.0], [x0 + 1.5, y0, 1.0],
                      [x0 + 0.75, y0 + 0.04, 1.0]])
        faces.append([3 * i, 3 * i + 2, 3 * i + 1])
    sy, sx = pick_spans(np.array(verts, np.float32),
                        np.array(faces, np.int32),
                        200.0, 200.0, 512.0, 64.0, hh, ww)
    assert sy == 2, f"vertical window inflated to {sy} on an x-only spill"
    assert sx == 4, f"expected the x window to absorb the spill, got {sx}"


def test_active_cap_pixel_exact(small_model_dict):
    """pick_active's cap must reproduce the exact (act_cap=n_tiles)
    render pixel-for-pixel — the compacted worklist + gather-back only
    skips tiles no face's bbox can touch. Also pins the documented
    overflow behavior: a cap of 1 drops active ranks >= 1, rendering
    them as background (never garbage)."""
    import jax.numpy as jnp

    from smpltpu.models import SMPLModel, smpl_forward
    from smpltpu.render.pallas_raster import TILE_H, TILE_W, pick_active

    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float32)
    out = smpl_forward(model, jnp.zeros(10),
                       jnp.broadcast_to(jnp.eye(3), (24, 3, 3)),
                       jnp.asarray([0.0, 0.0, 5.0]))  # small on screen:
    verts = np.asarray(out["verts"], np.float32)      # some tiles blank
    faces = np.asarray(model.faces, np.int32)
    mc, bc = pick_cap(verts, faces, FX, FY, CX, CY, H, W)
    ac = pick_active(verts, faces, FX, FY, CX, CY, H, W, floor=1)
    n_tiles = (-(-H // TILE_H)) * (-(-W // TILE_W))
    # exactness must hold for ANY cap >= the true active-tile count; the
    # scene occupies tile rows 0-9 of 12 (single tile column), so 10 is
    # the tight cap — tighter than pick_active's pow2 bucket (16 -> 12)
    ac = min(ac, 10)
    assert ac < n_tiles  # the scene leaves some tiles provably blank

    def run(cap):
        g, c = rasterize_tiled(jnp.asarray(verts), jnp.asarray(faces),
                               FX, FY, CX, CY, H, W, max_chunks=mc,
                               big_cap=bc, interpret=True, act_cap=cap)
        return np.asarray(g), np.asarray(c)

    g_full, c_full = run(None)
    g_cap, c_cap = run(ac)
    np.testing.assert_array_equal(c_full, c_cap)
    np.testing.assert_array_equal(g_full, g_cap)
    assert c_cap.sum() > 300

    g_1, c_1 = run(1)           # overflow: tiles beyond rank 0 -> background
    assert c_1.sum() < c_full.sum()
    covered_both = c_1 & c_full
    np.testing.assert_array_equal(g_1[covered_both], g_full[covered_both])
    assert not c_1[~c_full].any()


def test_behind_camera_and_backface_culled():
    verts = np.array([
        [-0.2, -0.2, 2.0], [0.2, -0.2, 2.0], [0.0, 0.3, 2.0],
        [-0.2, -0.2, -1.0], [0.2, -0.2, -1.0], [0.0, 0.3, -1.0],
    ], np.float32)
    faces = np.array([[0, 1, 2], [3, 5, 4]], np.int32)
    _, c = _tiled(verts, faces, (2, 256))
    assert not c.any()


def test_entry_cap_pixel_exact(small_model_dict):
    """pick_entries' cap must reproduce the exact (entry_cap=None)
    render pixel-for-pixel — the single-key sort groups real entries
    before the sentinel tail, so truncating at cap >= the real count
    only drops sentinels (round-5 lever: the (12, Np) sorted-edge
    gather was 57% of the 720x1280 frame). Undersized caps CLIP the
    highest-tile-id segments: fewer covered pixels, never garbage."""
    import jax.numpy as jnp

    from smpltpu.models import SMPLModel, smpl_forward
    from smpltpu.render.pallas_raster import (
        CHUNK,
        entries_count,
        pick_entries,
    )

    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float32)
    out = smpl_forward(model, jnp.zeros(10),
                       jnp.broadcast_to(jnp.eye(3), (24, 3, 3)),
                       jnp.asarray([0.0, 0.0, 3.0]))
    verts = np.asarray(out["verts"], np.float32)
    faces = np.asarray(model.faces, np.int32)
    mc, bc = pick_cap(verts, faces, FX, FY, CX, CY, H, W)
    ec = pick_entries(verts, faces, FX, FY, CX, CY, H, W)
    n_real, n_max = entries_count(verts, faces, FX, FY, CX, CY, H, W)
    assert n_real <= ec <= n_max
    # the 4096-granular bucket floors at CHUNK, so this tiny scene's
    # auto cap is uncapped (== n_max); exercise real truncation with the
    # tightest CHUNK-aligned cap that still covers every real entry
    ec_tight = -(-n_real // CHUNK) * CHUNK
    assert ec_tight < n_max  # the manual cap actually truncates here

    def run(cap):
        g, c = rasterize_tiled(jnp.asarray(verts), jnp.asarray(faces),
                               FX, FY, CX, CY, H, W, max_chunks=mc,
                               big_cap=bc, interpret=True, entry_cap=cap)
        return np.asarray(g), np.asarray(c)

    g_full, c_full = run(None)
    for cap in (ec, ec_tight):
        g_cap, c_cap = run(cap)
        np.testing.assert_array_equal(c_full, c_cap)
        np.testing.assert_array_equal(g_full, g_cap)
    assert c_full.sum() > 300

    g_u, c_u = run(CHUNK)     # undersized: clipped segments, valid output
    assert c_u.sum() <= c_full.sum()
    covered_both = c_u & c_full
    np.testing.assert_array_equal(g_u[covered_both], g_full[covered_both])
    assert not c_u[~c_full].any()
