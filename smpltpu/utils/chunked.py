"""Chunked batched dispatch: lax.map over chunk-sized vmapped batches.

The solvers' convergence-exit while_loops (the LM loop AND the chol TR
solver's secular-Newton loop) lift their conditions over the whole
vmapped batch, so one slow problem spins every lane until the globally
slowest member converges. Splitting a wide batch into chunk-sized
lax.map steps bounds that tail per chunk (measured: 1000-frame video
945 -> 1617 fps at 10k frames, single-frame batch 244 -> 364 fps — see
BASELINE.md). This helper is the ONE implementation of the
pad/reshape/map/unpad pattern shared by solve/single_frame.py,
solve/multi_frame.py and both parallel/sharded.py DP routes.

Padding replicates the last element (always a well-formed problem by
construction, so the padded lanes converge at least as fast as the real
ones); padded outputs are stripped before returning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chunked_map(fn, chunk: int, *args):
    """Apply ``fn`` (already vmapped over the leading axis) to ``args``
    in chunk-sized slices via lax.map; pad by replicating each arg's
    last leading-axis element, strip the padding from every output leaf.

    All args must share the leading-axis length n >= 1. Trace-safe
    (shapes only), usable inside jit/shard_map.
    """
    n = args[0].shape[0]
    pad = (-n) % chunk
    if pad:
        args = tuple(
            jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)], axis=0)
            for a in args)
    args = tuple(a.reshape((-1, chunk) + a.shape[1:]) for a in args)
    out = jax.lax.map(lambda xs: fn(*xs), args)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[2:])[:n], out)
