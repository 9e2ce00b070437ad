#!/usr/bin/env python3
"""Convert a SMPLify GMM pickle (gmm_08.pkl: means/covars/weights, K=8,
D=69) into the avatar pose-prior text format.

Parity with the reference converter (scripts/convert_gmm_to_avatar.py:1-32);
the text format (header 'K D', weights line, K mean rows, K row-major DxD
covariance rows) is produced by smpltpu.io.gmm.save_pose_prior_txt and
round-trips through smpltpu.io.gmm.load_pose_prior_txt.
"""

import os
import pickle
import sys

import numpy as np


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print("Usage:  convert_gmm_to_avatar.py  gmm_08.pkl  pose_prior.txt")
        return 1
    src, dst = argv[0], argv[1]

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from smpltpu.io import save_pose_prior_txt

    with open(src, "rb") as f:
        gmm = pickle.load(f, encoding="latin1")
    means = np.asarray(gmm["means"])
    covs = np.asarray(gmm["covars"]).reshape(means.shape[0], means.shape[1],
                                             means.shape[1])
    weights = np.asarray(gmm["weights"])
    assert means.shape[1] == 69, f"Expected 69-D pose, got {means.shape[1]}"
    save_pose_prior_txt(dst, weights, means, covs)
    print(f"pose prior written: {means.shape[0]} components, "
          f"{means.shape[1]} dims each")
    return 0


if __name__ == "__main__":
    sys.exit(main())
