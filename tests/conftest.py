"""Test harness: force an 8-device virtual CPU mesh before jax import.

SURVEY.md §4: multi-device tests without a TPU via
``--xla_force_host_platform_device_count=8``; exercises sharded train steps,
psum grad reduction, and per-device batch sharding in CI.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU PJRT plugin at interpreter start
# and rewrites jax_platforms to "axon,cpu", overriding the env var — force
# CPU back on top so unit tests run on the virtual 8-device host mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compilation cache: identical HLO across tests/runs compiles
# once. Repo-local (gitignored, NOT committed) and keyed by a CPU-feature
# fingerprint: XLA:CPU AOT entries encode the compile machine's feature
# set, and loading another machine's entries can SIGILL a process
# (observed r5: killed a pod worker mid-collective). See util.py.
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from util import test_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", test_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _fresh_config():
    """Each test starts from default global config (module-global like ref)."""
    from epipolarpose_tpu.config import reset_config
    reset_config()
    yield
    reset_config()
