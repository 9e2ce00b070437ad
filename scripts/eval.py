#!/usr/bin/env python3
"""Aggregate a pipeline log.csv into the two headline metrics.

Parity with the reference eval tool (scripts/eval.py:1-16): prints the
mean of the mean_pixel_error_px column and the mean optimization time in
seconds (time_ms / 1e3), same output format.
"""

import csv
import sys


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 1:
        print("Usage: python eval.py <csv_path>")
        return 1
    try:
        with open(argv[0]) as f:
            rows = list(csv.DictReader(f))
    except OSError as e:
        print(f"cannot read {argv[0]}: {e}", file=sys.stderr)
        return 1
    if not rows:
        print("empty log")
        return 1
    errs = [float(r["mean_pixel_error_px"]) for r in rows]
    times = [float(r["time_ms"]) for r in rows]
    print(f"Mean Pixel Error: {sum(errs) / len(errs):.4f}")
    print(f"Optimization Time (s): {sum(times) / len(times) / 1e3:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
