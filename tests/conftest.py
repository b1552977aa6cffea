"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere.
"""

import os

# Force CPU even when the ambient environment points at a real TPU
# (JAX_PLATFORMS=axon): tests must never occupy the tunneled chip, and
# eager dispatch over the tunnel is ~1000x slower than local CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
# Tests intentionally exercise structure/flow on random weights.
os.environ["PDF_TABLE_TPU_ALLOW_RANDOM_INIT"] = "quiet"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: model-zoo tests are compile-dominated on CPU;
# caching XLA executables across runs cuts repeat suite time by ~10x.
import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU plugin and sets
# jax.config.jax_platforms programmatically, overriding the env var — force
# the config back to cpu so tests never touch the tunneled chip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_mesh():
    import jax
    from jax.sharding import Mesh

    devices = np.array(jax.devices("cpu")[:8]).reshape(8)
    return Mesh(devices, axis_names=("dp",))


@pytest.fixture(scope="session")
def cpu_mesh3d():
    import jax
    from jax.sharding import Mesh

    devices = np.array(jax.devices("cpu")[:8]).reshape(2, 2, 2)
    return Mesh(devices, axis_names=("dp", "tp", "sp"))
