"""Stub-injected coverage for the gated optional dependencies.

mediapipe / yt-dlp / wandb are absent in this environment (CLAUDE.md), so
the code paths that consume them were previously exercised only down to
their import guards. These tests inject minimal fakes with the exact call
surface the real packages expose, so the LOGIC around them — the
per-frame extraction loop and its on-disk format (reference
data/scripts/extract_keypoints_mediapipe.py:106-157), the yt-dlp option
plumbing (:160-174), and the MetricsLogger wandb sink — runs for real.
The written keypoint JSONs are round-tripped through the production
loader (io/keypoints.load_mp_json) to pin format compatibility.
"""

import json
import os
import sys
import types
import zipfile

import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "data", "scripts")
sys.path.insert(0, os.path.abspath(SCRIPTS))

import extract_keypoints_mediapipe as ek  # noqa: E402
import download_video as dv  # noqa: E402


# ---------------------------------------------------------------- fakes

class _FakeCapture:
    def __init__(self, frames):
        self._frames = list(frames)
        self.released = False

    def isOpened(self):
        return True

    def read(self):
        if self._frames:
            return True, self._frames.pop(0)
        return False, None

    def release(self):
        self.released = True


def _fake_cv2(frames, written):
    cv2 = types.SimpleNamespace()
    cv2.COLOR_BGR2RGB = 4
    cv2.COLOR_RGB2BGR = 3
    cv2.VideoCapture = lambda path: _FakeCapture(frames)
    cv2.cvtColor = lambda img, code: img[..., ::-1]
    def imwrite(path, img):
        written.append(path)
        with open(path, "wb") as f:
            f.write(b"png")
        return True
    cv2.imwrite = imwrite
    return cv2


class _Landmark:
    def __init__(self, x, y, z=0.0, visibility=0.9):
        self.x, self.y, self.z, self.visibility = x, y, z, visibility


class _Landmarks:
    def __init__(self, pts):
        self.landmark = pts


class _FakePose:
    """Detects a person on every frame except the second ([] parity with
    the reference's no-detection frames, e.g. video1 frame_0000)."""

    def __init__(self, **kwargs):
        self.kwargs = kwargs
        self.n = 0
        self.closed = False

    def process(self, rgb):
        i = self.n
        self.n += 1
        out = types.SimpleNamespace(pose_landmarks=None)
        if i != 1:
            out.pose_landmarks = _Landmarks(
                [_Landmark(0.2 + 0.01 * k, 0.3 + 0.01 * k) for k in range(33)])
        return out

    def close(self):
        self.closed = True


# ------------------------------------------------------- mediapipe loop

def test_extraction_loop_with_stub_mediapipe(tmp_path, monkeypatch):
    frames = [np.full((16, 12, 3), 9, np.uint8) for _ in range(3)]
    written = []
    pose_holder = {}

    def make_pose(**kw):
        pose_holder["pose"] = _FakePose(**kw)
        return pose_holder["pose"]

    mp_pose = types.SimpleNamespace(Pose=make_pose,
                                    POSE_CONNECTIONS={(0, 1), (1, 2)})
    drawn = []
    mp_drawing = types.SimpleNamespace(
        draw_landmarks=lambda img, lms, conns: drawn.append(len(conns)))
    monkeypatch.setattr(ek, "cv2", _fake_cv2(frames, written))
    monkeypatch.setattr(ek, "mp_pose", mp_pose)
    monkeypatch.setattr(ek, "mp_drawing", mp_drawing)

    n = ek.process_video(str(tmp_path / "vid.mp4"), base=str(tmp_path))
    assert n == 3
    # reference Pose config (extract_keypoints_mediapipe.py:117-122)
    assert pose_holder["pose"].kwargs == dict(
        static_image_mode=True, model_complexity=1,
        enable_segmentation=False, min_detection_confidence=0.5)
    assert pose_holder["pose"].closed
    kp_dir = tmp_path / "keypoints" / "vid.mp4"
    for sub in ("frames", "frames_annotated", "keypoints"):
        assert (tmp_path / sub / "vid.mp4").is_dir()
    # raw + annotated per frame
    assert len(written) == 6
    # frame 1 had no detection -> [] (reference :34-52); others 33 landmarks
    j0 = json.loads((kp_dir / "frame_0000.json").read_text())
    j1 = json.loads((kp_dir / "frame_0001.json").read_text())
    assert j1 == [] and len(j0) == 33
    assert set(j0[0]) == {"x", "y", "z", "visibility"}
    # detected frames get the landmark overlay, empty ones don't
    assert len(drawn) == 2

    # the production loader consumes the written format
    from smpltpu.io.keypoints import keypoints_to_dense, load_mp_json
    kp = keypoints_to_dense(load_mp_json(str(kp_dir / "frame_0000.json"),
                                         12, 16))
    assert kp.shape == (17, 4) and np.any(kp[:, 3] > 0)
    assert load_mp_json(str(kp_dir / "frame_0001.json"), 12, 16) == []


def test_extraction_clear_error_when_gated(monkeypatch, tmp_path):
    monkeypatch.setattr(ek, "cv2", None)
    with pytest.raises(RuntimeError, match="mediapipe"):
        ek.process_video(str(tmp_path / "v.mp4"))


# ------------------------------------------------------------- yt-dlp

def test_download_youtube_with_stub_ytdlp(tmp_path, monkeypatch):
    calls = {}

    class _YDL:
        def __init__(self, opts):
            calls["opts"] = opts

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def extract_info(self, url, download):
            calls["url"], calls["download"] = url, download
            return {"title": "clip"}

        def prepare_filename(self, info):
            return os.path.join(calls["opts"]["outtmpl"].split("%")[0],
                                info["title"] + ".webm")

    monkeypatch.setitem(sys.modules, "yt_dlp",
                        types.SimpleNamespace(YoutubeDL=_YDL))
    out = dv.download_youtube("https://youtu.be/x", str(tmp_path / "vids"))
    assert out.endswith("clip.mp4")          # merged-mp4 normalization
    assert calls["download"] is True
    # reference format selection: avc1 mp4 video+audio (:160-174)
    assert "mp4" in calls["opts"]["format"]
    assert calls["opts"]["merge_output_format"] == "mp4"


def test_download_youtube_clear_error_when_gated(monkeypatch):
    monkeypatch.setitem(sys.modules, "yt_dlp", None)
    with pytest.raises(RuntimeError, match="yt-dlp"):
        dv.download_youtube("https://youtu.be/x")


def test_unzip_file_real_roundtrip(tmp_path):
    z = tmp_path / "bundle.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("videos/a.txt", "hello")
    dv.unzip_file(str(z), str(tmp_path / "out"))
    assert (tmp_path / "out" / "videos" / "a.txt").read_text() == "hello"
    assert not z.exists()                    # reference deletes the archive


# -------------------------------------------------------------- wandb

def test_metrics_logger_wandb_sink(tmp_path, monkeypatch):
    events = {"init": [], "log": [], "finish": 0}
    fake = types.SimpleNamespace(
        init=lambda **kw: events["init"].append(kw),
        log=lambda d: events["log"].append(d),
        finish=lambda: events.__setitem__("finish", events["finish"] + 1))
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from smpltpu.utils.obs import MetricsLogger
    ml = MetricsLogger(jsonl_path=str(tmp_path / "m.jsonl"), use_wandb=True,
                       run_name="r2")
    ml.log("stage1", ms=12.5, note="skipped-nonnumeric")
    ml.close()
    assert events["init"] == [dict(project="smpltpu", name="r2")]
    # only numeric fields reach wandb, namespaced by event
    assert events["log"] == [{"stage1/ms": 12.5}]
    assert events["finish"] == 1
    # the jsonl sink got the full record regardless
    rec = json.loads((tmp_path / "m.jsonl").read_text().splitlines()[0])
    assert rec["event"] == "stage1" and rec["note"] == "skipped-nonnumeric"
