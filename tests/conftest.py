"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
tests need no TPU (SURVEY.md section 4: CPU-backend tests for CI, the same
code pjit-sharded on TPU for integration runs)."""

import os

# force CPU: the environment pre-sets JAX_PLATFORMS=axon (remote TPU
# tunnel), which would make every eager op a network round-trip and
# emulate float64; tests must run on the local virtual-8-device CPU.
# NOTE: the axon sitecustomize imports jax at interpreter startup, so the
# env var is already latched — jax.config.update below is what takes effect.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Make float64 available for oracle comparisons; library code is explicit
# about dtypes, defaulting to float32 on the TPU path.
jax.config.update("jax_enable_x64", True)
# the suite is XLA-compile-bound; persist compilations across runs
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from smpltpu.models.synthetic import make_synthetic_gmm, make_synthetic_model  # noqa: E402

REFERENCE_DIR = "/root/reference"
REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fixture_path(rel: str) -> str:
    """Resolve a sample-data fixture path: prefer the vendored copy under
    repo data/ (self-contained checkout), fall back to the read-only
    reference mount. `rel` is e.g. 'data/keypoints/video1'."""
    local = os.path.join(REPO_DIR, rel)
    if os.path.exists(local):
        return local
    return os.path.join(REFERENCE_DIR, rel)


@pytest.fixture(scope="session")
def small_model_dict():
    return make_synthetic_model(n_verts=300, n_shapes=10, seed=0)


@pytest.fixture(scope="session")
def gmm_prior():
    return make_synthetic_gmm(n_comps=8, dim=69, seed=0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
