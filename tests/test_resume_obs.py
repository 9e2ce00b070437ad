"""Checkpoint/resume and observability tests for the multi CLI."""

import json
import os

import numpy as np
import pytest

from smpltpu.pipeline import multi as multi_cli
from tests.test_pipeline import N_FRAMES, _make_dataset


def test_multi_resume_skips_completed_windows(tmp_path, rng, capsys):
    model_path, kp_dir, img_dir = _make_dataset(tmp_path, rng, empty_frames=())
    out_dir = str(tmp_path / "out")
    args = [model_path, kp_dir, img_dir, out_dir,
            "30", "30", "3", "4", "1", "2.0", "25.0", "1.0",
            "--s2-iters", "15"]
    assert multi_cli.main(args) == 0
    ck = np.load(os.path.join(out_dir, "checkpoint_multi.npz"))
    assert int(ck["next_start"]) == N_FRAMES
    poses_full = np.load(os.path.join(out_dir, "params_multi.npz"))["params"]
    n_log_full = len(open(os.path.join(out_dir, "log.csv")).readlines())

    capsys.readouterr()
    # resume on a finished run: no stage-1, no windows re-run, params stable
    assert multi_cli.main(args + ["--resume"]) == 0
    out = capsys.readouterr().out
    assert "resuming from" in out
    assert "stage-1" not in out
    assert "window [" not in out
    poses_resumed = np.load(os.path.join(out_dir, "params_multi.npz"))["params"]
    np.testing.assert_array_equal(poses_resumed, poses_full)
    # log unchanged (no windows re-logged)
    assert len(open(os.path.join(out_dir, "log.csv")).readlines()) == n_log_full


def test_multi_resume_midway(tmp_path, rng):
    """Simulate an interruption: rewind the checkpoint to an earlier window
    and resume; the run must complete and only re-log the remaining frames."""
    model_path, kp_dir, img_dir = _make_dataset(tmp_path, rng, empty_frames=())
    out_dir = str(tmp_path / "out")
    args = [model_path, kp_dir, img_dir, out_dir,
            "30", "30", "3", "4", "1", "2.0", "25.0", "1.0",
            "--s2-iters", "15"]
    assert multi_cli.main(args) == 0
    ck_path = os.path.join(out_dir, "checkpoint_multi.npz")
    ck = dict(np.load(ck_path))
    ck["next_start"] = 3  # pretend windows from start>=3 never ran
    ck["rendered"][3:] = False
    np.savez(ck_path, **ck)
    n_log_before = len(open(os.path.join(out_dir, "log.csv")).readlines())
    assert multi_cli.main(args + ["--resume"]) == 0
    # windows at starts 3, 6 re-ran -> 4+? window frames re-logged
    n_log_after = len(open(os.path.join(out_dir, "log.csv")).readlines())
    assert n_log_after > n_log_before
    for i in range(N_FRAMES):
        assert os.path.isfile(os.path.join(out_dir, f"frame_{i}_multi.png"))


def test_metrics_jsonl_sink(tmp_path, rng):
    model_path, kp_dir, img_dir = _make_dataset(tmp_path, rng, empty_frames=())
    out_dir = str(tmp_path / "out")
    mpath = str(tmp_path / "metrics.jsonl")
    assert multi_cli.main([model_path, kp_dir, img_dir, out_dir,
                           "20", "20", "3", "4", "1", "2.0", "25.0", "1.0",
                           "--s2-iters", "10", "--metrics-jsonl", mpath]) == 0
    events = [json.loads(l) for l in open(mpath)]
    kinds = {e["event"] for e in events}
    assert "stage1" in kinds and "window" in kinds
    w = [e for e in events if e["event"] == "window"]
    assert all("ms" in e and "mean_px" in e for e in w)
