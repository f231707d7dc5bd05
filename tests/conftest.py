"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU answer to "test multi-chip without a cluster" — XLA's host
platform is split into 8 virtual devices so Mesh/NamedSharding/pjit paths are
exercised for real (collectives included), while numerics stay on CPU where
torch (CPU) is available for parity checks.

Note: this environment force-registers an ``axon`` TPU backend at interpreter
start (sitecustomize sets jax_platforms="axon,cpu"), so we must override via
``jax.config.update`` — the JAX_PLATFORMS env var alone is not enough.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent CPU compile cache (separate from the TPU remote-compile cache —
# mixing them loads AOT results built for a different machine)
jax.config.update("jax_compilation_cache_dir", "/tmp/canonswap_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# fast/slow split: `pytest -m "not slow"` is the commit gate (measured 11 min
# on this single-core host with a warm /tmp compile cache, 2026-08-18); the
# full suite (torch-oracle parity + e2e media pipelines) is ~25-30 min.
# Budgets re-measured each round — if the gate outgrows ~12 min, move the
# slowest modules into SLOW_MODULES rather than letting the claim drift.
# ---------------------------------------------------------------------------
SLOW_MODULES = {
    "test_pipeline_e2e",
    "test_reference_parity",
    "test_parsing_parity",
    "test_train_and_parallel",
    "test_convert_cli",
    "test_stitching_cli",
    "test_golden_chain",
    "test_video_and_weights",
    "test_canonical_parity",
    "test_convert_rehearsal",
    "test_onnx_realistic",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
