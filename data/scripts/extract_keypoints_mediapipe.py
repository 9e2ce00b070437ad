#!/usr/bin/env python3
"""Video -> per-frame MediaPipe keypoint JSONs + raw/annotated PNGs.

Parity with the reference preprocessing tool
(data/scripts/extract_keypoints_mediapipe.py:13-184): for up to 1000
frames, writes data/frames/<video>/frame_%04d.png, an annotated copy under
data/frames_annotated/<video>/, and a 33-landmark JSON
[{x, y, z, visibility}, ...] (normalized coords; [] when no person is
detected) under data/keypoints/<video>/ — the exact input format consumed
by smpltpu.io.keypoints.load_mp_json.

MediaPipe, OpenCV and yt-dlp are optional in this environment; the tool
degrades with clear errors when they are missing.
"""

from __future__ import annotations

import json
import os
import sys

try:
    import cv2  # type: ignore
except ImportError:  # pragma: no cover
    cv2 = None

try:
    from mediapipe.python.solutions import drawing_utils as mp_drawing  # type: ignore
    from mediapipe.python.solutions import pose as mp_pose  # type: ignore
except ImportError:  # pragma: no cover
    mp_pose = None
    mp_drawing = None

MAX_FRAMES = 1000


def setup_directories(video_name: str, base: str = "data"):
    dirs = [os.path.join(base, sub, video_name)
            for sub in ("frames", "frames_annotated", "keypoints")]
    for d in dirs:
        os.makedirs(d, exist_ok=True)
    return dirs


def extract_keypoints(pose_landmarks) -> list:
    """33 landmarks -> list of {x, y, z, visibility}; [] if no detection."""
    if not pose_landmarks:
        return []
    return [{"x": lm.x, "y": lm.y, "z": lm.z, "visibility": lm.visibility}
            for lm in pose_landmarks.landmark]


def process_video(video_path: str, base: str = "data") -> int:
    if cv2 is None or mp_pose is None:
        raise RuntimeError(
            "extract_keypoints_mediapipe needs opencv-python and mediapipe "
            "(not available in this environment)")
    name = os.path.basename(video_path)
    frames_dir, an_dir, kp_dir = setup_directories(name, base)
    pose = mp_pose.Pose(static_image_mode=True, model_complexity=1,
                        enable_segmentation=False,
                        min_detection_confidence=0.5)
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise ValueError(f"Could not open video file: {video_path}")
    frame_id = 0
    try:
        while frame_id < MAX_FRAMES:
            ok, frame = cap.read()
            if not ok:
                break
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            results = pose.process(rgb)
            landmarks = getattr(results, "pose_landmarks", None)
            keypoints = extract_keypoints(landmarks)

            annotated = rgb.copy()
            if landmarks is not None and mp_drawing is not None:
                mp_drawing.draw_landmarks(annotated, landmarks,
                                          list(mp_pose.POSE_CONNECTIONS))
            cv2.imwrite(os.path.join(frames_dir, f"frame_{frame_id:04d}.png"),
                        frame)
            cv2.imwrite(
                os.path.join(an_dir, f"frame_{frame_id:04d}_annotated.png"),
                cv2.cvtColor(annotated, cv2.COLOR_RGB2BGR))
            with open(os.path.join(kp_dir, f"frame_{frame_id:04d}.json"),
                      "w") as f:
                json.dump(keypoints, f, indent=2)
            frame_id += 1
    finally:
        cap.release()
        pose.close()
    print(f"Processed {frame_id} frames from {video_path}")
    return frame_id


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("Usage: extract_keypoints_mediapipe.py <video.mp4 | url>")
        return 1
    target = argv[0]
    if target.startswith(("http://", "https://")):
        sys.path.insert(0, os.path.dirname(__file__))
        from download_video import download_youtube
        target = download_youtube(target)
    process_video(target)
    return 0


if __name__ == "__main__":
    sys.exit(main())
