#!/usr/bin/env python3
"""Stitch sorted per-frame PNGs into an mp4 (FPS=10, mp4v codec).

Parity with the reference assembly tool (data/scripts/create_video.py:1-30)
but parameterized via CLI instead of hard-coded paths, and with a natural
sort implemented inline (the natsort dependency is unavailable here).
"""

from __future__ import annotations

import os
import re
import sys

FPS = 10


def natural_key(name: str):
    return [int(t) if t.isdigit() else t.lower()
            for t in re.split(r"(\d+)", name)]


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("Usage: create_video.py <frames_dir> [out.mp4] [fps]")
        return 1
    frames_dir = argv[0]
    out_path = argv[1] if len(argv) > 1 else "annotated.mp4"
    fps = float(argv[2]) if len(argv) > 2 else FPS

    try:
        import cv2  # type: ignore
    except ImportError:
        print("create_video needs opencv-python (not available)", file=sys.stderr)
        return 1

    frame_files = sorted(
        (f for f in os.listdir(frames_dir) if f.endswith(".png")),
        key=natural_key)
    if not frame_files:
        print(f"no PNGs in {frames_dir}", file=sys.stderr)
        return 1
    first = cv2.imread(os.path.join(frames_dir, frame_files[0]))
    h, w = first.shape[:2]
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter.fourcc(*"mp4v"),
                             fps, (w, h))
    for name in frame_files:
        writer.write(cv2.imread(os.path.join(frames_dir, name)))
    writer.release()
    print(f"Video saved at {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
