#!/usr/bin/env python3
"""Fix a raw SMPL npz kintree so the root's parent is -1.

Parity with the reference asset-prep tool (scripts/npz_fixer.py:1-17):
raw SMPL npz files store the root's parent as itself/garbage; this rewrites
kintree_table row 0 and saves <name>_fixed.npz. Unlike the reference's
hard-coded paths, input/output are CLI arguments.
"""

import os
import sys

import numpy as np


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("Usage: python npz_fixer.py <model.npz> [out.npz]")
        return 1
    src = argv[0]
    dst = argv[1] if len(argv) > 1 else (
        os.path.splitext(src)[0] + "_fixed.npz")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from smpltpu.io import fix_kintree

    model = dict(np.load(src, allow_pickle=True))
    model["kintree_table"] = fix_kintree(model["kintree_table"])
    np.savez(dst, **model)
    print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
