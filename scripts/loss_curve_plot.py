#!/usr/bin/env python3
"""Plot a loss_curve.txt (columns iteration,loss) to loss_curve.png.

Parity with the reference plotting tool (scripts/loss_curve_plot.py:1-12);
unlike the reference, the pipeline CLIs here actually WRITE loss_curve.txt
(per-iteration LM cost), so this tool has input out of the box.
"""

import csv
import sys


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    src = argv[0] if argv else "loss_curve.txt"
    dst = argv[1] if len(argv) > 1 else "loss_curve.png"
    with open(src) as f:
        rows = list(csv.DictReader(f))
    iters = [int(r["iteration"]) for r in rows]
    loss = [float(r["loss"]) for r in rows]
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; printing curve instead")
        for i, l in zip(iters, loss):
            print(i, l)
        return 0
    plt.plot(iters, loss)
    plt.xlabel("Iteration")
    plt.ylabel("Loss")
    plt.title("Loss Curve - Optimization of SMPL")
    plt.grid(True)
    plt.tight_layout()
    plt.savefig(dst)
    print(f"Visualization saved to '{dst}'")
    return 0


if __name__ == "__main__":
    sys.exit(main())
