"""Vendored sample annotated frames (data/frames_annotated/video1).

The reference ships 38 annotated PNGs next to the 38 keypoint JSONs
(reference data/frames_annotated/video1, SURVEY.md section 2.3); round 5
vendors them so the checkout is self-contained (same category as the
vendored keypoints — shared DATA fixtures, not code). Pinned here:

  * the fixture resolves repo-locally (no reference mount needed);
  * counts and stems pair 1:1 with the keypoint JSONs (the CLIs REQUIRE
    image count == json count, src/main_multi_frame.cpp:45-49);
  * the repo's dependency-free PNG codec (utils/image.py) decodes them
    (the overlay path must work when cv2 is absent).
"""

import os

import numpy as np

from tests.conftest import REPO_DIR, fixture_path

FRAMES = fixture_path("data/frames_annotated/video1")
KPS = fixture_path("data/keypoints/video1")


def test_fixture_is_vendored_repo_locally():
    assert FRAMES.startswith(REPO_DIR), FRAMES


def test_frames_pair_with_keypoint_jsons():
    pngs = sorted(f for f in os.listdir(FRAMES) if f.endswith(".png"))
    jsons = sorted(f for f in os.listdir(KPS) if f.endswith(".json"))
    assert len(pngs) == len(jsons) == 38
    # frame_0000_annotated.png <-> frame_0000.json
    png_stems = [p.replace("_annotated.png", "") for p in pngs]
    json_stems = [j.replace(".json", "") for j in jsons]
    assert png_stems == json_stems


def test_repo_png_codec_decodes_fixture():
    from smpltpu.utils.image import imread

    img = imread(os.path.join(FRAMES, "frame_0040_annotated.png"))
    assert img is not None
    assert img.ndim == 3 and img.shape[2] == 3, img.shape
    assert img.shape[:2] == (270, 480), img.shape   # reference sample res
    assert img.dtype == np.uint8
    # a real photo, not a blank canvas
    assert img.std() > 10.0
