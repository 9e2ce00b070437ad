"""Renderer tests: geometry stage against a per-face oracle, fill behavior,
and the PNG codec fallbacks."""

import numpy as np
import pytest

from smpltpu.render import build_drawlist, render_mesh_overlay
from smpltpu.utils.image import _png_read, _png_write, imread, imwrite

FX = FY = 500.0
CX, CY = 320.0, 240.0


def oracle_drawlist(verts, faces):
    """Independent per-face loop implementing the documented semantics."""
    items = []
    for f_idx, (i0, i1, i2) in enumerate(faces):
        if verts[i0][2] <= 1e-6 or verts[i1][2] <= 1e-6 or verts[i2][2] <= 1e-6:
            continue
        v0, v1, v2 = verts[i0], verts[i1], verts[i2]
        n = np.cross(v1 - v0, v2 - v0)
        if n[2] >= 0:
            continue
        c = (v0 + v1 + v2) / 3.0
        shade = np.clip(np.dot(n / np.linalg.norm(n), -c / np.linalg.norm(c)), 0, 1)
        depth = c[2]
        items.append((depth, f_idx, shade))
    items.sort(key=lambda t: -t[0])
    return items


def test_drawlist_matches_oracle(rng):
    verts = rng.normal(size=(30, 3))
    verts[:, 2] += 3.0
    verts[0, 2] = -1.0  # one behind-camera vertex
    faces = rng.integers(0, 30, size=(60, 3))
    tris, shade = build_drawlist(verts, faces, FX, FY, CX, CY)
    ref = oracle_drawlist(verts, faces)
    assert len(shade) == len(ref)
    for k, (depth, f_idx, sh) in enumerate(ref):
        np.testing.assert_allclose(shade[k], sh, atol=1e-12)
        exp_uv = np.stack([
            FX * verts[faces[f_idx], 0] / verts[faces[f_idx], 2] + CX,
            FY * verts[faces[f_idx], 1] / verts[faces[f_idx], 2] + CY], axis=-1)
        np.testing.assert_allclose(tris[k], exp_uv, atol=1e-9)


def test_no_cull_keeps_both_sides(rng):
    verts = rng.normal(size=(12, 3))
    verts[:, 2] += 3.0
    faces = rng.integers(0, 12, size=(20, 3))
    _, s_cull = build_drawlist(verts, faces, FX, FY, CX, CY, backface_cull=True)
    _, s_all = build_drawlist(verts, faces, FX, FY, CX, CY, backface_cull=False)
    assert len(s_all) >= len(s_cull)


def test_render_fills_pixels():
    # a single big front-facing triangle in front of the camera
    verts = np.array([[-1.0, -1.0, 3.0], [1.0, -1.0, 3.0], [0.0, 1.5, 3.0]])
    # winding chosen so n.z < 0 (front-facing)
    faces = np.array([[0, 2, 1]])
    tris, shade = build_drawlist(verts, faces, FX, FY, CX, CY)
    assert len(shade) == 1
    img = np.zeros((480, 640, 3), np.uint8)
    render_mesh_overlay(verts, faces, img, FX, FY, CX, CY)
    assert img.sum() > 0
    gray = int(round(220 * shade[0]))
    center_px = img[240, 320]
    assert abs(int(center_px[0]) - gray) <= 2  # AA tolerance


def test_render_empty_when_behind_camera():
    verts = np.array([[-1.0, -1.0, -3.0], [1.0, -1.0, -3.0], [0.0, 1.5, -3.0]])
    faces = np.array([[0, 2, 1]])
    img = np.zeros((48, 64, 3), np.uint8)
    render_mesh_overlay(verts, faces, img, FX, FY, CX, CY)
    assert img.sum() == 0


def test_pure_png_roundtrip(tmp_path, rng):
    img = rng.integers(0, 255, size=(20, 31, 3)).astype(np.uint8)
    path = str(tmp_path / "x.png")
    _png_write(path, img)
    back = _png_read(path)
    np.testing.assert_array_equal(back, img)


def test_imread_imwrite_roundtrip(tmp_path, rng):
    img = rng.integers(0, 255, size=(16, 24, 3)).astype(np.uint8)
    path = str(tmp_path / "y.png")
    assert imwrite(path, img)
    back = imread(path)
    np.testing.assert_array_equal(back, img)


def test_numpy_fill_fallback(rng):
    """The no-cv2 scanline fill covers the same interior pixels."""
    from smpltpu.render.raster import _fill_triangles_numpy
    img = np.zeros((100, 100, 3), np.uint8)
    tri = np.array([[[10.0, 10.0], [90.0, 12.0], [50.0, 80.0]]])
    _fill_triangles_numpy(img, tri, np.array([[200, 200, 200]], np.uint8))
    assert (img[40, 50] == 200).all()   # interior
    assert (img[5, 5] == 0).all()       # exterior
