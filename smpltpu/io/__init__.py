"""Data IO: SMPL npz model loading, GMM pose-prior parsing, MediaPipe
keypoint JSON loading (reference layer L3, include/Utils.h + the avatar
submodule's loaders)."""

from smpltpu.io.smpl_npz import load_smpl_npz, save_smpl_npz, fix_kintree  # noqa: F401
from smpltpu.io.gmm import load_pose_prior_txt, save_pose_prior_txt  # noqa: F401
from smpltpu.io.keypoints import (  # noqa: F401
    load_mp_json,
    load_keypoint_dir,
    list_sorted,
)
