"""Checkpoint backends for long-video fits.

The reference has no real checkpointing (its "resume" is accidental
log-append only — src/main_multi_frame.cpp:39-42 opens log.csv in append
mode; SURVEY.md section 5 checkpoint row). The multi CLI's --resume is a
framework extension; this module gives it two interchangeable backends:

  * "npz"   — single-file numpy archive (the default; zero deps). Written
              ATOMICALLY (tmp file + os.replace) so a crash mid-save can't
              destroy the previous checkpoint — important for the very
              long videos checkpointing exists for.
  * "orbax" — orbax.checkpoint PyTree directory (the JAX-ecosystem
              standard). Optional: falls back to npz with a warning when
              orbax is not importable, so the CLI never hard-depends on it.

`load_checkpoint(..., backend="auto")` restores from whichever backend's
artifact exists (orbax directory preferred when both do), so a run can
switch backends between resumes.
"""

from __future__ import annotations

import os
import shutil
import sys
from typing import Dict, Optional

import numpy as np


def _npz_path(path_base: str) -> str:
    return path_base + ".npz"


def _orbax_path(path_base: str) -> str:
    return os.path.abspath(path_base + ".orbax")


def save_checkpoint(path_base: str, tree: Dict[str, np.ndarray],
                    backend: str = "npz") -> str:
    """Persist a flat dict of numpy arrays; returns the artifact path."""
    if backend == "orbax":
        try:
            import orbax.checkpoint as ocp
        except Exception:
            print("[WARN] orbax not importable; falling back to npz",
                  file=sys.stderr)
            backend = "npz"
        else:
            # crash-safe directory swap: write the new checkpoint BESIDE
            # the old one, then two renames — a kill at any point leaves
            # either the old dir at `path` or (between the renames) at
            # `path + ".old"`, which load_checkpoint falls back to. Never
            # delete the only copy before the replacement exists (the
            # rmtree-first version lost all resume state on a mid-save
            # crash — the exact case checkpointing exists for).
            path = _orbax_path(path_base)
            tmp, old = path + ".tmp", path + ".old"
            for d in (tmp, old):
                if os.path.isdir(d):
                    shutil.rmtree(d)
            with ocp.PyTreeCheckpointer() as ckptr:
                ckptr.save(tmp, {k: np.asarray(v) for k, v in tree.items()})
            if os.path.isdir(path):
                os.rename(path, old)
            os.rename(tmp, path)
            shutil.rmtree(old, ignore_errors=True)
            return path
    if backend != "npz":
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    path = _npz_path(path_base)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **tree)
    os.replace(tmp, path)  # atomic on POSIX: never a torn checkpoint
    return path


def load_checkpoint(path_base: str,
                    backend: str = "auto") -> Optional[Dict[str, np.ndarray]]:
    """Restore the dict saved by save_checkpoint; None if nothing exists.

    backend="auto" picks the NEWER artifact when both formats exist (a
    run that switched --ckpt-backend between resumes must not restore the
    stale one), and recovers the ``.old`` directory a crash mid-swap can
    leave behind.
    """
    opath, npath = _orbax_path(path_base), _npz_path(path_base)
    if not os.path.isdir(opath) and os.path.isdir(opath + ".old"):
        os.rename(opath + ".old", opath)  # finish an interrupted swap
    if backend == "auto":
        have_o, have_n = os.path.isdir(opath), os.path.isfile(npath)
        if have_o and have_n:
            backend = ("orbax" if os.path.getmtime(opath)
                       >= os.path.getmtime(npath) else "npz")
        elif have_o or have_n:
            backend = "orbax" if have_o else "npz"
        else:
            return None
    if backend == "orbax":
        if not os.path.isdir(opath):
            return None
        try:
            import orbax.checkpoint as ocp
        except Exception:
            # symmetric with save_checkpoint's fallback: degrade to the
            # npz artifact when one exists rather than dying on import
            if os.path.isfile(npath):
                print("[WARN] orbax not importable; restoring the npz "
                      "checkpoint instead", file=sys.stderr)
                return dict(np.load(npath))
            raise RuntimeError(
                f"checkpoint {opath} needs orbax.checkpoint, which is not "
                "importable here, and no npz fallback exists")
        with ocp.PyTreeCheckpointer() as ckptr:
            out = ckptr.restore(opath)
        return {k: np.asarray(v) for k, v in out.items()}
    if backend != "npz":
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    if not os.path.isfile(npath):
        return None
    return dict(np.load(npath))
