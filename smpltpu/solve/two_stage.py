"""Fused two-stage pipeline: ONE compiled dispatch for stage-1 anchors +
in-graph anchor interpolation + stage-2 windows (VERDICT r4 #8 stretch).

The production two-stage recipe (bench.py, `pipeline.multi
--batched-windows --init-from-anchors`) runs three host-separated steps:
the shared-shape anchor solve, a host-side linear interpolation of anchor
optima into window starts, and the vmapped window solve. On a remote
backend each dispatch pays the tunnel round trip (~28 ms here), and the
host interpolation (a Python loop over frames) sits on the wall-clock
between them. This helper compiles the whole chain as one XLA program:
the interpolation becomes two static gathers + a lerp (micro-ops on
device), the stage-1 -> stage-2 handoff never leaves HBM, and one
dispatch replaces two.

Semantics are IDENTICAL to the sequential path (pinned by
tests/test_two_stage.py): same stage-1 fitter, same interpolation rule
(between consecutive anchors; constant past the last anchor — the
`pb = anchor_params[k]` tail case), same blind-init padding rows for
window frames beyond the video end (masked by frame_valid, but padding
values are matched exactly so optima compare bit-for-bit).
"""

from __future__ import annotations

import numpy as np

from smpltpu.energy.params import init_frame_params
from smpltpu.solve.multi_frame import build_multi_fitter


def interp_tables(anchor_idx, n_frames: int):
    """Static (seg_lo, seg_hi, t) tables reproducing the host
    interpolation loop: frame i in anchor segment [a_k, a_{k+1}) gets
    poses[i] = (1-t) * anchor[k] + t * anchor[k+1] with
    t = (i - a_k) / (a_{k+1} - a_k); frames at/past the last anchor get
    anchor[last] (hi == lo there)."""
    anchor_idx = np.asarray(anchor_idx, np.int64)
    n_a = len(anchor_idx)
    i = np.arange(n_frames)
    seg = np.clip(np.searchsorted(anchor_idx, i, side="right") - 1,
                  0, n_a - 1)
    lo_f = anchor_idx[seg]
    hi = np.minimum(seg + 1, n_a - 1)
    nxt = np.where(seg + 1 < n_a, anchor_idx[hi], n_frames)
    t = (i - lo_f) / np.maximum(nxt - lo_f, 1)
    # past-the-last-anchor frames lerp anchor[k] -> anchor[k] (t moot)
    return seg, hi, t.astype(np.float64)


def build_fused_two_stage(
    spec,
    cam,
    cfg1,
    cfg2,
    n_shapes: int,
    anchor_idx,
    win_starts,
    wsize: int,
    n_frames: int,
    dtype=None,
    spec2=None,
):
    """Return a jitted fn(p0a (A,P), shape0 (nS,), kpa (A,K,4),
    r0a (A,3,3), kpw (W,wsize,K,4), r0w (W,wsize,3,3), vw (W,wsize))
    -> (MultiFrameResult stage-1, MultiFrameResult stage-2 vmapped over
    windows). Single-chip, unchunked; the sequential path stays the
    building block for meshes/chunking.

    ``spec2``: stage-2 skeleton spec when it differs from stage-1's —
    the multi CLI's beta_shape=0 parity case drops the shape dependence
    from stage 1 (MultiFrameBA.h:88 passes a null jointShapeReg there)
    while stage 2 always carries the 1e5 shape lock."""
    import jax
    import jax.numpy as jnp

    dtype = jnp.float32 if dtype is None else dtype
    fit1 = build_multi_fitter(spec, cam, cfg1, n_shapes, dtype)
    fit2 = build_multi_fitter(spec if spec2 is None else spec2,
                              cam, cfg2, n_shapes, dtype)

    seg, hi, t = interp_tables(anchor_idx, n_frames)
    seg_j = jnp.asarray(seg, jnp.int32)
    hi_j = jnp.asarray(hi, jnp.int32)
    t_j = jnp.asarray(t, dtype)[:, None]

    win_starts = np.asarray(win_starts, np.int64)
    win_f = win_starts[:, None] + np.arange(wsize)[None]     # (W, wsize)
    valid_j = jnp.asarray(win_f < n_frames)[..., None]
    win_g = jnp.asarray(np.clip(win_f, 0, n_frames - 1), jnp.int32)
    n_j = len(spec.parents)
    init_p = jnp.asarray(np.asarray(init_frame_params(n_j)), dtype)

    @jax.jit
    def run(p0a, shape0, kpa, r0a, kpw, r0w, vw):
        st1 = fit1(p0a, shape0, kpa, r0a)
        ap = st1.params.astype(dtype)
        poses = (1.0 - t_j) * ap[seg_j] + t_j * ap[hi_j]     # (N, P)
        p0w = jnp.where(valid_j, poses[win_g], init_p)       # (W, wsize, P)
        st2 = jax.vmap(lambda a, c, d, e: fit2(a, st1.shape, c, d, e))(
            p0w, kpw, r0w, vw)
        return st1, st2

    return run
