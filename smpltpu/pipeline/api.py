"""High-level library API: fit a whole video's keypoints in one call.

The CLI drivers (single.py / multi.py) reproduce the reference's file-based
workflow; this module is the programmatic surface for framework users —
numpy/JAX arrays in, fitted parameters + diagnostics out, no filesystem.

    result = fit_video(model_dict, kp_batch, width, height,
                       mode="multi", init_from_anchors=True)
    result.params      # (F, 76) packed per-frame pose vectors
    result.shape       # (nS,) shared shape (multi) / (F, nS) (single opt-shape)
    result.errors_px   # (F,) mean pixel reprojection error per frame
    result.verts       # optional (F, nV, 3) skinned vertices
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from smpltpu.constants import init_root_rotation
from smpltpu.energy import make_skeleton_spec
from smpltpu.energy.params import N_FRAME_PARAMS, init_frame_params
from smpltpu.models import SMPLModel
from smpltpu.pipeline.common import batched_frame_eval
from smpltpu.solve import (
    MultiFrameConfig,
    build_fitter,
    build_multi_fitter,
    make_single_frame_problem,
)
from smpltpu.utils import default_intrinsics


class FitResult(NamedTuple):
    params: np.ndarray      # (F, P)
    shape: np.ndarray       # (nS,) or (F, nS)
    errors_px: np.ndarray   # (F,)
    verts: Optional[np.ndarray]  # (F, nV, 3) if requested
    converged: np.ndarray   # per-frame (single) or scalar (multi)
    # MODE-DEPENDENT shape/meaning:
    #   mode="single": (F, max_iters) per-frame per-iteration cost trace
    #   mode="multi":  (max_iters,)   stage-1 anchor-fit iteration trace
    #   mode="stream": (F,)           per-frame FINAL costs (the causal
    #                  solver keeps no per-iteration trace; drive
    #                  solve.online.OnlineFitter.step() directly for one)
    # Trailing slots of iteration traces are back-filled with the final
    # cost after the convergence exit (solve/lm.py contract).
    cost_history: np.ndarray


def fit_video(
    model_dict: dict,
    kp_batch: np.ndarray,        # (F, 17, 4) dense keypoints (io layout)
    width: int,
    height: int,
    mode: str = "multi",         # 'single' | 'multi' | 'stream'
    beta_pose: float = 5.0,
    beta_shape: float = 25.0,
    lambda_temporal: float = 3.0,
    max_iters: int = 100,
    opt_shape: bool = False,     # single mode only
    gmm_dict: Optional[dict] = None,
    anchor_skip: int = 10,
    window: int = 20,
    overlap: int = 5,
    s2_iters: int = 60,
    init_from_anchors: bool = True,
    want_verts: bool = False,
    calib: int = 10,             # stream mode only: calibration buffer
    dtype=jnp.float32,
) -> FitResult:
    """Fit every frame of a video. 'single' = independent per-frame fits
    (reference 3dba_single); 'multi' = shared-shape anchors + batched
    sliding windows (reference 3dba_multi, --batched-windows fast path);
    'stream' = causal per-frame warm-started solves with the shape locked
    by a calibration buffer (solve/online.py — the serving mode; frames
    with no detections hold the previous pose and report converged=False)."""
    model = SMPLModel.from_dict(model_dict, dtype=dtype)
    cam = default_intrinsics(width, height, dtype=dtype)
    r0 = np.asarray(init_root_rotation(), np.float64)
    n_frames = kp_batch.shape[0]
    kp = jnp.asarray(kp_batch, dtype)

    if mode == "single":
        prob = make_single_frame_problem(
            model, r0, cam, beta_pose=beta_pose, beta_shape=beta_shape,
            opt_shape=opt_shape, gmm_dict=gmm_dict, dtype=dtype)
        x0_one = init_frame_params(dtype=dtype)
        if opt_shape:
            x0_one = jnp.concatenate(
                [x0_one, jnp.zeros(model.num_shapes, dtype)])
        fitter = build_fitter(prob, max_iters=max_iters, dtype=dtype)
        st = fitter(jnp.tile(x0_one, (n_frames, 1)), kp)
        params = np.asarray(st.x[:, :N_FRAME_PARAMS])
        shape = (np.asarray(st.x[:, N_FRAME_PARAMS:]) if opt_shape
                 else np.zeros((n_frames, model.num_shapes)))
        converged = np.asarray(st.converged)
        cost_history = np.asarray(st.cost_history)
    elif mode == "multi":
        spec = make_skeleton_spec(model, r0, with_shape=True)
        anchor_idx = list(range(0, n_frames, anchor_skip))
        cfg1 = MultiFrameConfig(beta_pose=beta_pose, beta_shape=beta_shape,
                                lambda_temporal=lambda_temporal,
                                max_iters=max_iters)
        fit1 = build_multi_fitter(spec, cam, cfg1, model.num_shapes, dtype)
        p0 = jnp.tile(init_frame_params(dtype=dtype), (len(anchor_idx), 1))
        r0j = jnp.tile(jnp.asarray(r0, dtype), (len(anchor_idx), 1, 1))
        st1 = fit1(p0, jnp.zeros(model.num_shapes, dtype),
                   kp[np.asarray(anchor_idx)], r0j)
        anchor_params = np.asarray(st1.params)
        shape = np.asarray(st1.shape)

        poses = np.tile(np.asarray(init_frame_params(dtype=dtype)),
                        (n_frames, 1))
        if init_from_anchors:
            for k, fid in enumerate(anchor_idx):
                nxt = anchor_idx[k + 1] if k + 1 < len(anchor_idx) else n_frames
                pb = (anchor_params[k + 1] if k + 1 < len(anchor_idx)
                      else anchor_params[k])
                poses[fid] = anchor_params[k]
                for i in range(fid + 1, min(nxt, n_frames)):
                    t = (i - fid) / max(nxt - fid, 1)
                    poses[i] = (1 - t) * anchor_params[k] + t * pb

        stride = window - overlap
        starts = list(range(0, n_frames, stride))
        cfg2 = MultiFrameConfig(beta_pose=beta_pose, beta_shape=1e5,
                                lambda_temporal=lambda_temporal,
                                max_iters=s2_iters)
        fit2 = build_multi_fitter(spec, cam, cfg2, model.num_shapes, dtype)
        default_pose = np.asarray(init_frame_params(dtype=dtype))
        wp = np.tile(default_pose, (len(starts), window, 1))
        wk = np.zeros((len(starts), window) + kp_batch.shape[1:], np.float32)
        wv = np.zeros((len(starts), window), np.float32)
        for wi, s in enumerate(starts):
            e = min(s + window, n_frames)
            wp[wi, :e - s] = poses[s:e]
            wk[wi, :e - s] = kp_batch[s:e]
            wv[wi, :e - s] = 1.0
        import jax
        bfit = jax.jit(jax.vmap(lambda a, b, c, d, e: fit2(a, b, c, d, e)))
        st2 = bfit(jnp.asarray(wp, dtype),
                   jnp.tile(jnp.asarray(shape, dtype), (len(starts), 1)),
                   jnp.asarray(wk, dtype),
                   jnp.tile(jnp.asarray(r0, dtype), (len(starts), window, 1, 1)),
                   jnp.asarray(wv, dtype))
        fitted = np.asarray(st2.params)
        params = poses
        for wi, s in enumerate(starts):
            e = min(s + window, n_frames)
            params[s:e] = fitted[wi, :e - s]
        converged = np.asarray(st2.converged)
        cost_history = np.asarray(st1.cost_history)
    elif mode == "stream":
        from smpltpu.solve.online import OnlineConfig, OnlineFitter

        fit = OnlineFitter(
            model, cam,
            OnlineConfig(beta_pose=beta_pose,
                         lambda_temporal=lambda_temporal,
                         max_iters=max_iters),
            gmm_dict=gmm_dict, dtype=dtype)
        kp_np = np.asarray(kp_batch, np.float32)
        valid_idx = np.flatnonzero(kp_np[:, :, 3].sum(axis=1) > 0)
        params = np.tile(np.asarray(fit.prev), (n_frames, 1))
        converged = np.zeros(n_frames, dtype=bool)
        n_calib = min(calib, valid_idx.size)
        start_at = 0
        if n_calib > 0:
            calib_idx = valid_idx[:n_calib]
            params[calib_idx] = fit.calibrate(kp_np[calib_idx],
                                              beta_shape=beta_shape)
            converged[calib_idx] = True
            start_at = int(calib_idx[-1]) + 1
        # causal replay: the whole post-calibration chain in ONE dispatch
        # (identical recursion to per-frame step(), pinned in
        # tests/test_online.py — avoids the ~28 ms/frame dispatch floor
        # a host-side step loop pays through the TPU tunnel)
        costs = np.zeros(n_frames)
        if start_at < n_frames:
            xs, _solved, fcosts, _iters, conv = fit.replay(kp_np[start_at:])
            params[start_at:] = xs
            converged[start_at:] = conv
            costs[start_at:] = fcosts
        # streamed mode: per-frame FINAL costs (a full per-iteration trace
        # is a step()-loop affordance; use OnlineFitter directly for that)
        cost_history = costs
        shape = np.asarray(fit.shape)
    else:
        raise ValueError(f"unknown mode {mode!r}")

    shapes_per_frame = (shape if shape.ndim == 2
                        else np.tile(shape, (n_frames, 1)))
    errors, verts = batched_frame_eval(
        model, params, shapes_per_frame,
        np.tile(r0.astype(np.float32), (n_frames, 1, 1)),
        np.asarray(kp_batch), cam, want_verts=want_verts)
    return FitResult(params=params, shape=shape, errors_px=errors,
                     verts=verts, converged=converged,
                     cost_history=cost_history)
