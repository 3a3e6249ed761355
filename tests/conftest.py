"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so `shard_map` / mesh logic is
exercised without TPU hardware (SURVEY.md §4 item 3). The axon sitecustomize
forces JAX_PLATFORMS=axon, so env vars alone don't stick — we override via
jax.config before any backend is initialised. Set TPZ_TEST_TPU=1 to run the
suite against the real accelerator instead.
"""

import os

if not os.environ.get("TPZ_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


import pytest

# Device-pipeline modules run Pallas kernels in interpret mode — the bulk
# of the suite's wall clock (VERDICT r3 weak #9). `pytest -m "not slow"`
# (make test-fast) keeps a local run under ~5 min; ci.sh runs everything.
_SLOW_MODULES = {
    "test_inflate_pipeline", "test_resolve_walk", "test_bzip2_walk",
    "test_lzhuf_pipeline", "test_deflate_pipeline", "test_bzip2_pipeline",
    "test_ibwt_walk", "test_plan_device",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: interpret-mode device-pipeline tests")


def pytest_collection_modifyitems(config, items):
    for it in items:
        mod = getattr(it, "module", None)
        if mod is not None and mod.__name__ in _SLOW_MODULES:
            it.add_marker(pytest.mark.slow)
