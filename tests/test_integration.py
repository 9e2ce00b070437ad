"""Integration guards: the full single-frame pipeline against the
reference's real video1 keypoint fixture, and a bench.py smoke run."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from smpltpu.io import save_smpl_npz
from smpltpu.models.synthetic import make_synthetic_model
from smpltpu.pipeline import single as single_cli
from smpltpu.utils.image import imwrite
from tests.conftest import fixture_path

VIDEO1_KPS = fixture_path("data/keypoints/video1")


@pytest.mark.skipif(not os.path.isdir(VIDEO1_KPS),
                    reason="reference fixture not mounted")
def test_single_pipeline_on_video1_fixture(tmp_path):
    """Deterministic regression pin: fit the real 38-frame video1 keypoints
    with the seed-0 synthetic model. Guards loader semantics, solver
    behavior and the logging contract end to end."""
    model_path = str(tmp_path / "model.npz")
    save_smpl_npz(model_path, make_synthetic_model(n_verts=300, seed=0))
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(0, 380, 10):
        imwrite(str(img_dir / f"frame_{i:04d}.png"),
                np.zeros((64, 36, 3), np.uint8))  # 36x64 -> same aspect

    out_dir = str(tmp_path / "out")
    rc = single_cli.main([model_path, VIDEO1_KPS, str(img_dir), out_dir,
                          "60", "2.0", "0.0"])
    assert rc == 0
    rows = open(os.path.join(out_dir, "log.csv")).read().splitlines()[1:]
    # frames 0000-0030 + 0060 have no detections in the fixture
    logged = [int(r.split(",")[0]) for r in rows]
    assert len(logged) == 33
    assert set(range(0, 4)).isdisjoint(logged)
    errs = np.array([float(r.split(",")[1]) for r in rows])
    # Reference-parity mode optimizes scale freely (Sim3BA.h:612-614) while
    # the eval/render write-back DISCARDS scale (Utils.h:102-116 pinned
    # quirk), so frames whose fit uses scale != 1 log inflated errors —
    # on the reference exactly as here. Pin a loose band on the quirk
    # metric; the true-objective quality is pinned by the tight run below.
    assert errs.mean() < 30.0, errs.mean()
    assert np.isfinite(errs).all()

    # gauge-consistent mode (--freeze-scale: scale pinned to the value the
    # eval convention assumes) + multi-start: the real quality pin
    out2 = str(tmp_path / "out2")
    rc = single_cli.main([model_path, VIDEO1_KPS, str(img_dir), out2,
                          "60", "2.0", "0.0", "--freeze-scale",
                          "--multi-start"])
    assert rc == 0
    rows2 = open(os.path.join(out2, "log.csv")).read().splitlines()[1:]
    errs2 = np.array([float(r.split(",")[1]) for r in rows2])
    assert len(rows2) == 33
    # observed ~0.8 px mean at 36x64 with the round-2 exact-TR solver
    assert errs2.mean() < 3.0, errs2.mean()


def test_bench_smoke():
    """bench.py must print exactly one valid JSON line on stdout (driver
    contract) on the SINGLE-device CPU backend with a reduced frame count
    (conftest's inherited XLA_FLAGS would otherwise make this an 8-device
    run — the mesh path has its own smoke below)."""
    flags = " ".join(f for f in os.environ.get("XLA_FLAGS", "").split()
                     if "xla_force_host_platform_device_count" not in f)
    env = dict(os.environ, BENCH_FRAMES="60", JAX_PLATFORMS="cpu",
               XLA_FLAGS=flags,
               JAX_COMPILATION_CACHE_DIR=os.path.join(
                   os.path.dirname(os.path.abspath(__file__)), ".xla_cache"),
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.5")
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        timeout=480, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "mesh size 1" in proc.stderr, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, proc.stdout
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0


def test_bench_single_smoke():
    """BENCH_SINGLE=1 wiring end-to-end on CPU: the single-frame variant
    must emit its own JSON record on stderr (gmm + multistart + chunk
    knobs exercised tiny) while the headline stdout contract stays ONE
    line."""
    flags = " ".join(f for f in os.environ.get("XLA_FLAGS", "").split()
                     if "xla_force_host_platform_device_count" not in f)
    env = dict(os.environ, BENCH_FRAMES="60", JAX_PLATFORMS="cpu",
               XLA_FLAGS=flags,
               BENCH_SINGLE="1", BENCH_SINGLE_FRAMES="6",
               BENCH_SINGLE_GMM="1", BENCH_SINGLE_CHUNK="3",
               JAX_COMPILATION_CACHE_DIR=os.path.join(
                   os.path.dirname(os.path.abspath(__file__)), ".xla_cache"),
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.5")
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, proc.stdout  # headline contract unchanged
    single = [l for l in proc.stderr.splitlines()
              if l.startswith('{"metric": "single_frame')]
    assert len(single) == 1, proc.stderr[-2000:]
    rec = json.loads(single[0])
    assert rec["value"] > 0 and rec["gmm"] is True


def test_bench_mesh_smoke():
    """bench.py on an 8-virtual-device CPU mesh: the EXACT code path a
    real v5e-8 takes (auto mesh detection -> sharded stage-1 LM + window
    DP with dummy padding). The dryrun exercises the library functions on
    tiny shapes; this drives bench.py's own wiring end-to-end."""
    env = dict(os.environ, BENCH_FRAMES="60", JAX_PLATFORMS="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "") +
                          " --xla_force_host_platform_device_count=8"),
               JAX_COMPILATION_CACHE_DIR=os.path.join(
                   os.path.dirname(os.path.abspath(__file__)), ".xla_cache"),
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.5")
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "mesh size 8" in proc.stderr, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, proc.stdout
    rec = json.loads(lines[0])
    assert rec["value"] > 0


@pytest.mark.skipif(not os.path.isdir(VIDEO1_KPS),
                    reason="reference fixture not mounted")
def test_fit_video_one_command(tmp_path):
    """VERDICT round-1 item 6: the one-command driver on the video1
    fixture must produce log.csv + renders (+ mp4 when cv2 is present)
    from just a keypoints folder."""
    from smpltpu.pipeline import video as video_cli

    model_path = str(tmp_path / "model.npz")
    save_smpl_npz(model_path, make_synthetic_model(n_verts=300, seed=0))
    out = str(tmp_path / "out")
    rc = video_cli.main([model_path, VIDEO1_KPS, out,
                         "--size", "90x160", "--iters", "40",
                         "--s2-iters", "20", "--fps", "5"])
    assert rc == 0
    fit_out = os.path.join(out, "fit")
    assert os.path.isfile(os.path.join(fit_out, "log.csv"))
    assert os.path.isfile(os.path.join(fit_out, "params_multi.npz"))
    renders = [f for f in os.listdir(fit_out) if f.endswith("_multi.png")]
    assert len(renders) == 38
    try:
        import cv2  # noqa: F401
        assert os.path.isfile(os.path.join(out, "annotated.mp4"))
    except ImportError:
        pass


@pytest.mark.skipif(not os.path.isdir(VIDEO1_KPS),
                    reason="reference fixture not mounted")
def test_fit_video_stream_mode(tmp_path):
    """--mode stream routes the one-command driver through the causal
    streaming CLI (pipeline/stream.py): log.csv + per-frame stream renders
    from just a keypoints folder."""
    from smpltpu.pipeline import video as video_cli

    model_path = str(tmp_path / "model.npz")
    save_smpl_npz(model_path, make_synthetic_model(n_verts=300, seed=0))
    out = str(tmp_path / "out")
    rc = video_cli.main([model_path, VIDEO1_KPS, out,
                         "--mode", "stream", "--size", "90x160",
                         "--iters", "12", "--calib", "4", "--no-video"])
    assert rc == 0
    fit_out = os.path.join(out, "fit")
    log = open(os.path.join(fit_out, "log.csv")).read().splitlines()
    assert log[0] == "frame,mean_pixel_error_px,time_ms"
    assert len(log) == 1 + 33   # 38 video1 frames, 5 without detections
    assert os.path.isfile(os.path.join(fit_out, "params_stream.npz"))
    renders = [f for f in os.listdir(fit_out) if f.endswith("_stream.png")]
    assert len(renders) == 33


N_ANCHOR_V1 = len(range(0, 38, 5))


@pytest.fixture(scope="module")
def v1_multi_env(tmp_path_factory):
    """Shared video1 multi-CLI dataset (model npz + blank frame images)."""
    root = tmp_path_factory.mktemp("v1multi")
    model_path = str(root / "model.npz")
    save_smpl_npz(model_path, make_synthetic_model(n_verts=300, seed=0))
    img_dir = root / "imgs"
    img_dir.mkdir()
    for i in range(0, 380, 10):
        imwrite(str(img_dir / f"frame_{i:04d}.png"),
                np.zeros((64, 36, 3), np.uint8))
    return root, model_path, str(img_dir)


def _run_v1_multi(env, tag, extra):
    """Run the multi CLI on video1 with the shared base argv; return
    (anchor-row mean err, window-row mean err)."""
    from smpltpu.pipeline import multi as multi_cli

    root, model_path, img_dir = env
    out = str(root / tag)
    rc = multi_cli.main([model_path, VIDEO1_KPS, img_dir, out,
                         "60", "60", "5", "8", "2", "2.0", "25.0",
                         "1.0", "--s2-iters", "25"] + extra)
    assert rc == 0
    rows = open(os.path.join(out, "log.csv")).read().splitlines()[1:]
    errs = np.array([float(r.split(",")[1]) for r in rows])
    return float(errs[:N_ANCHOR_V1].mean()), float(errs[N_ANCHOR_V1:].mean())


@pytest.fixture(scope="module")
def v1_base_run(v1_multi_env):
    """The sequential no-flag run, shared by the two tests below (it is
    both the 'seq' baseline and the 'blind-init' baseline — identical
    argv, deterministic solver)."""
    return _run_v1_multi(v1_multi_env, "base", [])


@pytest.mark.skipif(not os.path.isdir(VIDEO1_KPS),
                    reason="reference fixture not mounted")
def test_stage2_batched_vs_sequential_on_video1(v1_multi_env, v1_base_run):
    """VERDICT round-1 item 9: quantify the documented stage-2 divergence
    on REAL data. --batched-windows drops the sequential init chain (all
    windows start from the post-stage-1 snapshot); --init-from-anchors
    must close the gap to within 20% of the sequential path's error."""
    e_seq = v1_base_run[1]
    _, e_bat = _run_v1_multi(v1_multi_env, "bat", ["--batched-windows"])
    _, e_anch = _run_v1_multi(v1_multi_env, "anch",
                              ["--batched-windows", "--init-from-anchors"])
    # the raw batched path may diverge from sequential (documented);
    # anchors-warm-started batching must be competitive with sequential
    assert e_anch <= max(1.2 * e_seq, e_seq + 1.0), (e_seq, e_bat, e_anch)
    # and the batched paths must both be sane fits at this resolution
    assert e_bat < 40.0 and e_anch < 40.0, (e_seq, e_bat, e_anch)
    # --window-chunk: per-chunk convergence exits must not change the
    # optima (converged windows freeze; library equivalence is pinned
    # bit-tight in test_multi_frame.py — here just the CLI wiring, f32)
    _, e_chunk = _run_v1_multi(v1_multi_env, "chunk",
                               ["--batched-windows", "--window-chunk", "2"])
    assert abs(e_chunk - e_bat) <= max(0.01 * e_bat, 0.05), (e_bat, e_chunk)


@pytest.mark.skipif(not os.path.isdir(VIDEO1_KPS),
                    reason="reference fixture not mounted")
def test_multi_cli_data_init_on_video1(v1_multi_env, v1_base_run):
    """--data-init (framework extension): closed-form per-frame depth/
    translation init from the detections seeds stage-1 anchors and the
    stage-2 window starts. On the real video1 keypoints it must not hurt
    the anchors and must keep the whole fit sane (the blind reference
    init is the basin-lottery documented in solve/init.py)."""
    a_blind, w_blind = v1_base_run
    a_di, w_di = _run_v1_multi(v1_multi_env, "di", ["--data-init"])
    # anchors: the data-driven init must be at least as good as blind
    # (small tolerance: both are converged solves of the same problem)
    assert a_di <= a_blind * 1.05 + 0.5, (a_blind, a_di)
    assert w_di < 40.0, (w_blind, w_di)
