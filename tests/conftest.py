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
