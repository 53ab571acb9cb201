"""Test harness config: force CPU with 8 virtual devices.

The container's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (the TPU
tunnel), so plain env-var edits are too late — override through jax.config before
any backend is initialized. All tests run on CPU (fast, deterministic); multi-device
sharding tests use the 8 virtual devices. Benchmarks (bench.py) run on the real TPU.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {jax.device_count()}"
