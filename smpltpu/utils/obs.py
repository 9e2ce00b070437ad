"""Observability: metrics sinks and profiling.

The reference's observability is a CSV sink + stdout INFO lines + a
dormant link-only Weights & Biases option (CMakeLists.txt:9,51-54 —
USE_WANDB links wandbcpp but nothing calls it; SURVEY.md section 5). This
module provides the working equivalents:

  * MetricsLogger — per-event metrics to a JSONL sink and/or wandb (when
    the package is importable), in addition to the pipeline's log.csv;
  * profile_trace — a context manager wrapping jax.profiler traces for the
    solver stages (--profile flag on the CLIs).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


class MetricsLogger:
    """Tiny multi-sink metrics logger. All sinks optional; no-ops cleanly."""

    def __init__(self, jsonl_path: Optional[str] = None,
                 use_wandb: bool = False, run_name: str = "smpltpu"):
        self._jsonl = None
        self._wandb = None
        if jsonl_path:
            os.makedirs(os.path.dirname(os.path.abspath(jsonl_path)),
                        exist_ok=True)
            self._jsonl = open(jsonl_path, "a")
        if use_wandb:
            try:
                import wandb  # type: ignore
                self._wandb = wandb
                wandb.init(project="smpltpu", name=run_name)
            except Exception:
                self._wandb = None

    def log(self, event: str, **fields) -> None:
        rec = {"ts": time.time(), "event": event, **fields}
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log({f"{event}/{k}": v for k, v in fields.items()
                             if isinstance(v, (int, float))})

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()


@contextlib.contextmanager
def profile_trace(out_dir: Optional[str]):
    """jax.profiler trace context; no-op when out_dir is None."""
    if not out_dir:
        yield
        return
    import jax

    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        yield


def enable_compile_cache(cache_dir: str, min_compile_secs: float = 1.0,
                         ) -> None:
    """Point JAX's persistent compilation cache at cache_dir (idempotent:
    a no-op if some cache dir is already configured). Shared by bench.py
    and __graft_entry__.py — the stage-1/stage-2 programs cost ~30 s to
    compile cold through the axon tunnel, so every driver entry point
    wants the same warm cache. Never raises: the cache is an
    optimization, not a dependency."""
    import jax

    try:
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              min_compile_secs)
    except Exception:
        pass
