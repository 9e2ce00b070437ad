"""Shared pipeline plumbing: dataset loading, log.csv sink, overlay
rendering, fitted-parameter persistence."""

from __future__ import annotations

import os
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smpltpu.energy.reproj import Camera
from smpltpu.io import load_keypoint_dir, load_pose_prior_txt, load_smpl_npz
from smpltpu.io.keypoints import list_sorted
from smpltpu.models import SMPLModel, smpl_forward
from smpltpu.render import render_mesh_overlay
from smpltpu.utils import default_intrinsics, mean_pixel_error
from smpltpu.utils.image import imread, imwrite
from smpltpu.utils.writeback import params_to_pose

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp")


def is_number(s: str) -> bool:
    """Token classifier for the reference-style hand-rolled parsers
    (numerics consumed positionally, interleaved with flags)."""
    try:
        float(s)
        return True
    except ValueError:
        return False


def append_log(out_dir: str, rows: List[Tuple[int, float, float]]) -> str:
    """Append rows to out_dir/log.csv with a header-once guard.

    Schema parity: 'frame,mean_pixel_error_px,time_ms'
    (src/main_single_frame.cpp:260-269, src/main_multi_frame.cpp:39-42).
    """
    path = os.path.join(out_dir, "log.csv")
    exists = os.path.isfile(path)
    with open(path, "a") as f:
        if not exists:
            f.write("frame,mean_pixel_error_px,time_ms\n")
        for frame, err, ms in rows:
            f.write(f"{frame},{err},{ms}\n")
    return path


def load_dataset(smpl_path: str, kps_folder: str, img_folder: str,
                 midpoint_default_vis: float, dtype=jnp.float32,
                 pose_prior_path: Optional[str] = None):
    """Load model, images list + intrinsics from the first image, and the
    dense keypoint batch. Returns dict or raises ValueError with the
    reference's early-exit messages."""
    images = list_sorted(img_folder, IMAGE_EXTS)
    if not images:
        raise ValueError(f"No images in {img_folder}")
    img0 = imread(images[0])
    if img0 is None:
        raise ValueError(f"Failed to read {images[0]}")
    height, width = img0.shape[:2]
    cam = default_intrinsics(width, height, dtype=dtype)

    # model spec: a real npz path, the avatar-model directory (reference
    # argv convention — model.npz + pose_prior.txt inside), a registry
    # name (female/male/neutral), or synthetic[:n] (models/registry.py)
    if os.path.isfile(smpl_path):
        from smpltpu.models.registry import _is_lfs_stub
        if _is_lfs_stub(smpl_path):
            # the reference repo ships exactly such stubs in assets/raw/
            # (.MISSING_LARGE_BLOBS) — fail with the registry's clear
            # message instead of a cryptic np.load zipfile error
            raise ValueError(
                f"{smpl_path} is a git-LFS pointer stub, not a real model "
                "npz — fetch the real SMPL asset (see smpltpu.models.registry)")
        model_dict = load_smpl_npz(smpl_path)
        model_dir = os.path.dirname(os.path.abspath(smpl_path))
    else:
        from smpltpu.models.registry import find_model_file, resolve_model
        # resolve_model's priority: synthetic (exact) > registry name >
        # model directory; model_dir (for pose_prior.txt discovery) must
        # mirror whichever source actually won
        model_dict = resolve_model(smpl_path)
        found = find_model_file(smpl_path)
        if found is not None:
            model_dir = os.path.dirname(found)
        elif os.path.isdir(smpl_path):
            model_dir = os.path.abspath(smpl_path)
        else:
            model_dir = None
    model = SMPLModel.from_dict(model_dict, dtype=dtype)

    kp_batch, json_paths = load_keypoint_dir(
        kps_folder, width, height, midpoint_default_vis)
    if len(json_paths) == 0:
        raise ValueError(f"No JSON files in {kps_folder}")

    # pose prior: explicit path, else the avatar-model convention of a
    # pose_prior.txt next to the npz
    prior = None
    candidate = pose_prior_path or (
        os.path.join(model_dir, "pose_prior.txt") if model_dir else "")
    if os.path.isfile(candidate):
        prior = load_pose_prior_txt(candidate)

    return {
        "model": model,
        "model_dict": model_dict,
        "cam": cam,
        "images": images,
        "json_paths": json_paths,
        "kp_batch": kp_batch.astype(np.float64),
        "width": width,
        "height": height,
        "gmm": prior,
    }


_eval_cache: dict = {}


def batched_frame_eval(model: SMPLModel, params, shapes, r0, kp, cam: Camera,
                       want_verts: bool = True):
    """ONE jitted vmapped pass computing every frame's evaluation error and
    (optionally) skinned vertices for rendering.

    Replaces the reference's per-frame avatar.update() + mean_pixel_error
    (src/main_single_frame.cpp:254-255); batching avoids paying the ~28 ms
    device-dispatch latency once per frame per op.

    params (F, P), shapes (F, nS), r0 (F, 3, 3), kp (F, K, 4).
    Returns (errors (F,) np, verts (F, nV, 3) np or None).
    """
    key = (id(model), tuple(float(c) for c in cam), bool(want_verts))
    if key not in _eval_cache:
        def one(p, w, r, k):
            pose = params_to_pose(p, r, model.num_joints)
            out = smpl_forward(model, w, pose.rotations, pose.root_pos,
                               want_verts=want_verts)
            err = mean_pixel_error(out["joints"], k, cam)
            return (err, out["verts"]) if want_verts else (err, None)
        # pin `model` in the value: id() keys are only unique while the
        # object is alive — a recycled id must not hit a stale eval fn
        _eval_cache[key] = (model, jax.jit(jax.vmap(one)))
    dtype = model.v_template.dtype
    err, verts = _eval_cache[key][1](
        jnp.asarray(params, dtype), jnp.asarray(shapes, dtype),
        jnp.asarray(r0, dtype), jnp.asarray(kp, dtype))
    return np.asarray(err), (None if verts is None else np.asarray(verts))


def render_overlay_image(model: SMPLModel, verts_cam: np.ndarray,
                         image_path: str, out_path: str, cam: Camera,
                         use_jax: bool = False,
                         img: Optional[np.ndarray] = None) -> bool:
    """Overlay render from precomputed camera-space vertices (reference:
    renderSMPLMesh + imwrite, src/main_single_frame.cpp:273-277).
    use_jax switches to the on-device z-buffer rasterizer
    (render/jax_raster.py) instead of the host painter renderer.
    Pass a preloaded ``img`` to skip the read (callers that already
    checked readability, e.g. the single CLI's skip-unreadable path)."""
    if img is None:
        img = imread(image_path)
    if img is None:
        return False
    if use_jax:
        # prefer the tile-binned Pallas kernel (26x the scatter-min
        # z-buffer on TPU, pixel-identical); fall back to the scatter-min
        # rasterizer if the kernel path is unavailable
        try:
            from smpltpu.render.pallas_raster import render_overlay_tiled
            img = render_overlay_tiled(
                verts_cam, model.faces, img,
                float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy))
        except Exception:
            from smpltpu.render.jax_raster import render_overlay_jax
            img = render_overlay_jax(
                verts_cam, model.faces, img,
                float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy))
    else:
        render_mesh_overlay(
            verts_cam, model.faces, img,
            float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
            fill=True, backface_cull=True, wireframe=False)
    return imwrite(out_path, img)


def np_rodrigues(aa: np.ndarray) -> np.ndarray:
    """Host-side angle-axis -> rotation matrix (write-back bookkeeping;
    avoids a device round-trip per frame)."""
    theta = float(np.linalg.norm(aa))
    if theta < 1e-14:
        return np.eye(3)
    k = aa / theta
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0.0]])
    return np.eye(3) + np.sin(theta) * kx + (1 - np.cos(theta)) * (kx @ kx)


def save_params(out_dir: str, name: str, params: np.ndarray,
                shape: np.ndarray, extra: Optional[dict] = None) -> str:
    """Persist fitted parameters (framework extension: the reference README
    claims 'Save optimized parameters' but never does — SURVEY.md section 5
    checkpoint/resume row; this also enables resume)."""
    path = os.path.join(out_dir, name)
    payload = {"params": np.asarray(params), "shape": np.asarray(shape)}
    if extra:
        payload.update({k: np.asarray(v) for k, v in extra.items()})
    np.savez(path, **payload)
    return path


class StageTimer:
    def __init__(self):
        self.t0 = time.perf_counter()

    def ms(self) -> float:
        return (time.perf_counter() - self.t0) * 1e3
