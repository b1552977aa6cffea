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


# -- quick tier ---------------------------------------------------------------
# `pytest -m quick` = a <2-minute gate touching every component layer once
# (VERDICT r3 #9); the full suite stays the pre-commit bar for touched
# areas. Selection: cheapest test CLASS per component, compile-light.
_QUICK = {
    "test_entity.py": None,               # L1 data model (all fast)
    "test_utils.py": None,                # L0 + charsets
    "test_hub_resolve.py": None,          # registry/hub chain
    "test_flops.py": None,                # MFU accounting
    "test_table_master_match.py": None,   # token-path HTML
    "test_pdf_assign.py": None,           # pdf-flavor text assign
    "test_deform_blend.py": None,         # pallas DCN kernel
    "test_native_ops.py": None,           # C++ oracle parity
    "test_line_cell.py": None,            # wired-table extractors
    "test_pdfio.py": "TestWriterReader",  # native PDF reader/writer
    "test_pdf_table.py": "TestLattice",   # classical flavors
    "test_ops.py": "TestCtcDecode",       # device op suite (sample)
    "test_engine.py": "TestInferTask",    # task engine
    "test_pipeline.py": "TestDigitalLayoutFallback",  # digital e2e bit
    "test_serve.py": "TestTempCleanupOnFailure",      # serving
    "test_train_eval.py": "TestTeds",     # eval metric
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.fspath.basename
        want = _QUICK.get(fname, "skip")
        if want == "skip":
            continue
        if want is None or f"::{want}::" in item.nodeid \
                or item.nodeid.endswith(f"::{want}"):
            item.add_marker(pytest.mark.quick)
