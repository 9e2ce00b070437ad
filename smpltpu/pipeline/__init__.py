"""CLI drivers (reference layer L5: src/main_single_frame.cpp and
src/main_multi_frame.cpp). Run as:

    python -m smpltpu.pipeline.single  <SMPL.npz> <kps> <imgs> <out> [...]
    python -m smpltpu.pipeline.multi   <SMPL.npz> <kps> <imgs> <out> [...]
"""
