"""Constants shared across the framework.

These reproduce the numeric constants baked into the reference pipeline
(reference: jonH34400/3DBodyAnimation). Each constant cites the reference
source (file:line under /root/reference) it provides parity with.
"""

import numpy as np

# ---------------------------------------------------------------------------
# MediaPipe(33 landmarks) -> SMPL(24 joints) mapping.
# MP_MAP[smpl_jid] = mediapipe landmark index, or -1 if unmapped.
# Parity: include/Utils.h:18-21 (identical table at src/main_single_frame.cpp:23-27).
#   SMPL 1/2 = hips      <- MP 23/24
#   SMPL 4/5 = knees     <- MP 25/26
#   SMPL 7/8 = ankles    <- MP 27/28
#   SMPL 10/11 = feet    <- MP 31/32
#   SMPL 15 = head       <- MP 0 (nose)
#   SMPL 16/17 = shoulders <- MP 11/12
#   SMPL 18/19 = elbows  <- MP 13/14
#   SMPL 20/21 = wrists  <- MP 15/16
MP_MAP = np.array(
    [-1, 23, 24, -1, 25, 26, -1, 27, 28, -1,
     31, 32, -1, -1, -1, 0, 11, 12, 13, 14,
     15, 16, -1, -1],
    dtype=np.int32,
)

# The set of SMPL joint ids used as keypoint observations.
# Parity quirk (documented in SURVEY.md section 2.1): the reference declares
# std::array<int,17> but initializes only 15 values (include/Utils.h:22-23),
# so the two trailing entries are value-initialized to 0 — SMPL joint 0
# (pelvis, synthesized as the MP hip midpoint) is therefore iterated TWICE,
# emitting a duplicated pelvis keypoint (doubling its weight in the solver).
# We reproduce that exact 17-slot iteration order.
USE_SMPL = np.array(
    [1, 2, 4, 5, 7, 8, 10, 11, 15, 16, 17, 18, 19, 20, 21, 0, 0],
    dtype=np.int32,
)

# Number of keypoint slots per frame in the dense (static-shape) layout.
N_KP_SLOTS = len(USE_SMPL)  # 17 (pelvis slot duplicated, see above)

# Joints hard-fixed to zero rotation in the pose-only single-frame solve
# because MediaPipe never observes them (feet tips + hands).
# Parity: include/Sim3BA.h:607-611.
FIXED_JOINTS_POSE_ONLY = (10, 11, 22, 23)

# Huber robust-loss scale used for all keypoint reprojection residuals.
# Parity: include/Sim3BA.h:407,570 and include/MultiFrameBA.h:64.
HUBER_DELTA = 3.0

# Sim3 scale bounds. Parity: include/Sim3BA.h:450-451,613-614.
SCALE_MIN = 0.3
SCALE_MAX = 3.0

# Keypoint visibility threshold. Parity: include/Utils.h:95,
# src/main_single_frame.cpp:98.
VISIBILITY_THRESHOLD = 0.5

# Pinhole intrinsics heuristic: f = 0.9*max(W,H), fx=fy, cx=W/2, cy=H/2.
# Parity: src/main_single_frame.cpp:172-176, src/main_multi_frame.cpp:60-61.
FOCAL_FACTOR = 0.9

# Initial body placement: 3 m in front of the camera, facing it with Y
# flipped (image Y grows downward).
# Parity: src/main_single_frame.cpp:208-212, src/main_multi_frame.cpp:85-93.
INIT_ROOT_DEPTH = 3.0

# Skeleton-edge table for keypoint visualizations. The reference declares
# this and never uses it (src/main_single_frame.cpp:32-37, noted in
# SURVEY.md section 2.1); kept for drop-in parity and available to plotting
# tools here.
BONES = np.array(
    [[1, 2], [1, 4], [2, 5], [4, 7], [5, 8],
     [16, 17], [15, 16], [15, 17],
     [16, 18], [17, 19], [18, 20], [19, 21],
     [1, 16], [2, 17]],
    dtype=np.int32,
)

# SMPL topology dimensions (standard basicModel_{f,m}_lbs_10_207_0).
SMPL_NUM_JOINTS = 24
SMPL_NUM_SHAPES = 10
SMPL_NUM_VERTS = 6890
SMPL_NUM_FACES = 13776

# Canonical SMPL parent table (kintree_table row 0 after the npz root fix,
# scripts/npz_fixer.py:9-14: root's parent becomes -1).
SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
     18, 19, 20, 21],
    dtype=np.int32,
)


def init_root_rotation() -> np.ndarray:
    """Initial root orientation R0 = yaw(pi) @ diag(1,-1,1).

    Parity: src/main_single_frame.cpp:210-212 (Eigen::AngleAxisd(M_PI, UnitY())
    times a flip of the Y axis).
    """
    yaw_pi = np.array([[-1.0, 0.0, 0.0],
                       [0.0, 1.0, 0.0],
                       [0.0, 0.0, -1.0]])
    flip_y = np.diag([1.0, -1.0, 1.0])
    return yaw_pi @ flip_y
