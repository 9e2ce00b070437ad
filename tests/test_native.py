"""Native C++ runtime tests: the ctypes-bound parser/rasterizer must be
bit-identical to the Python reference implementations."""

import json
import os
import time

import numpy as np
import pytest

from smpltpu import native
from smpltpu.io import load_keypoint_dir
from smpltpu.io.keypoints import keypoints_to_dense, load_mp_json
from tests.conftest import fixture_path

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ toolchain unavailable")


def _py_dense(path, w, h, mdv=1.0):
    return keypoints_to_dense(load_mp_json(path, w, h, mdv))


def test_parser_matches_python_full(tmp_path, rng):
    lms = [{"x": float(rng.random()), "y": float(rng.random()),
            "z": 0.0, "visibility": float(rng.random())} for _ in range(33)]
    path = str(tmp_path / "f.json")
    with open(path, "w") as f:
        json.dump(lms, f)
    got = native.parse_mp_json_bytes(open(path, "rb").read(), 640, 480)
    np.testing.assert_array_equal(got, _py_dense(path, 640, 480))


@pytest.mark.parametrize("content", [
    "[]", "{}", "{not json", "[{\"x\": \"oops\"}]",
    json.dumps([{"x": 0.5, "y": 0.5, "visibility": True}] * 33),
    json.dumps([{"x": 0.5, "y": 0.5}] * 12),          # short list
    json.dumps([{"x": 0.5, "y": 0.5}] * 33),          # missing visibility
    json.dumps([{"x": 0.5, "y": 0.5, "visibility": 0.4}] * 33),  # low vis
    json.dumps([{"x": 0.5, "y": 0.5, "extra": {"a": [1, "s", None]}}] * 33),
])
def test_parser_matches_python_edge_cases(tmp_path, content):
    path = str(tmp_path / "e.json")
    with open(path, "w") as f:
        f.write(content)
    for mdv in (1.0, 0.0):
        got = native.parse_mp_json_bytes(open(path, "rb").read(), 100, 100, mdv)
        np.testing.assert_array_equal(got, _py_dense(path, 100, 100, mdv),
                                      err_msg=f"content={content!r} mdv={mdv}")


@pytest.mark.skipif(
    not os.path.isdir(fixture_path("data/keypoints/video1")),
    reason="video1 fixture unavailable")
def test_batch_loader_matches_python_on_fixture():
    d = fixture_path("data/keypoints/video1")
    batch_py, paths = load_keypoint_dir(d, 720, 1280, backend="python")
    batch_nat, paths2 = load_keypoint_dir(d, 720, 1280, backend="native")
    assert paths == paths2
    np.testing.assert_array_equal(batch_nat, batch_py)


def test_fill_triangles_matches_numpy(rng):
    from smpltpu.render.raster import _fill_triangles_numpy
    img_c = np.zeros((80, 120, 3), np.uint8)
    img_py = np.zeros((80, 120, 3), np.uint8)
    tris = (rng.random(size=(12, 3, 2)) * [140, 100] - 10).astype(np.float64)
    gray = rng.integers(0, 255, size=12).astype(np.int32)
    native.fill_triangles(img_c, tris, gray)
    _fill_triangles_numpy(img_py, tris,
                          np.stack([gray] * 3, axis=-1).astype(np.uint8))
    np.testing.assert_array_equal(img_c, img_py)


def test_batch_loader_speed(tmp_path, rng):
    """Native batch parse should beat the Python loop comfortably."""
    lms = [{"x": 0.4, "y": 0.5, "z": 0.0, "visibility": 0.9}] * 33
    content = json.dumps(lms)
    n = 200
    for i in range(n):
        (tmp_path / f"f_{i:04d}.json").write_text(content)
    t0 = time.perf_counter()
    b_py, _ = load_keypoint_dir(str(tmp_path), 640, 480, backend="python")
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    b_nat, _ = load_keypoint_dir(str(tmp_path), 640, 480, backend="native")
    t_nat = time.perf_counter() - t0
    np.testing.assert_array_equal(b_nat, b_py)
    assert t_nat < t_py, f"native {t_nat:.4f}s not faster than python {t_py:.4f}s"
