"""Regression pin for the driver contract in __graft_entry__.py.

Round 1 failed the driver's multi-chip dryrun (MULTICHIP_r01.json ok=false):
the platform-forcing jax.config.update was guarded behind "device-count flag
not yet in XLA_FLAGS", which the driver's preset flag skipped, so the latched
JAX_PLATFORMS=axon won and only 1 device existed. These tests reproduce the
driver's exact environments in subprocesses so the bug can never return.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AXON_SITE = "/root/.axon_site"


def _run_dryrun(extra_env):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    pythonpath = REPO
    if os.path.isdir(AXON_SITE):
        pythonpath += os.pathsep + AXON_SITE
    env["PYTHONPATH"] = pythonpath
    # share the suite's persistent XLA cache with the subprocess (the
    # in-process tests get it from conftest's jax.config.update)
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".xla_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600)


def test_dryrun_with_driver_preset_xla_flags():
    """The driver presets the host-device-count flag itself (the round-1
    failure mode): the platform force must still apply."""
    res = _run_dryrun(
        {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    assert res.returncode == 0, res.stderr[-2000:]
    assert "dryrun_multichip OK: 8 devices" in res.stdout


def test_dryrun_with_no_env():
    """Plain invocation (no XLA_FLAGS, latched platform from sitecustomize)
    must set up its own 8 virtual devices."""
    res = _run_dryrun({})
    assert res.returncode == 0, res.stderr[-2000:]
    assert "dryrun_multichip OK: 8 devices" in res.stdout


def test_entry_is_production_window_solve():
    """entry() must return the jitted PRODUCTION step (window trust-region
    fit + skinning), runnable with its example args, finite outputs."""
    import numpy as np

    import __graft_entry__ as g

    fn, args = g.entry()
    params, cost, shape, verts = fn(*args)
    assert params.shape == (4, 6, 76)
    assert cost.shape == (4,)
    assert shape.shape == (4, 10)
    assert verts.shape[0] == 4 and verts.shape[2] == 3
    assert np.isfinite(np.asarray(params)).all()
    assert np.isfinite(np.asarray(cost)).all()
    assert np.isfinite(np.asarray(verts)).all()
    # the fit must actually move the params off the init
    assert float(np.abs(np.asarray(params)).max()) > 0.0


def test_entry_verts_use_the_production_pose_decode():
    """Regression (round-3 review): entry() once hand-rolled the packed
    params -> rotations decode and built a 23-row tensor (dropping joint
    1 and never composing the fitted root axis-angle with R0); FK's
    clamped gather made every joint silently use its neighbor's rotation.
    Pin: the skinned verts returned by entry() must equal an independent
    re-skin of the SAME fitted params through the production
    params_to_pose + smpl_forward path."""
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as g
    from smpltpu.constants import init_root_rotation
    from smpltpu.models import SMPLModel, make_synthetic_model, smpl_forward
    from smpltpu.utils.writeback import params_to_pose

    fn, args = g.entry()
    params, _cost, shape, verts = fn(*args)

    model = SMPLModel.from_dict(make_synthetic_model(n_verts=1024),
                                dtype=jnp.float32)
    r0 = jnp.asarray(np.asarray(init_root_rotation(), np.float32))

    def reskin(p, w):
        pose = params_to_pose(p, r0, model.num_joints)
        return smpl_forward(model, w, pose.rotations,
                            pose.root_pos)["verts"]

    ref = jnp.stack([reskin(params[i, 0], shape[i])
                     for i in range(params.shape[0])])
    np.testing.assert_allclose(np.asarray(verts), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # and the fitted root axis-angle must MATTER: re-decoding with the
    # root aa zeroed must change the verts (the old bug ignored it)
    p_noroot = params[0, 0].at[1:4].set(0.0)
    assert not np.allclose(np.asarray(reskin(p_noroot, shape[0])),
                           np.asarray(ref[0]), atol=1e-4)
