"""Test harness config: force CPU with 8 virtual devices.

The container's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (the TPU
tunnel), so plain env-var edits are too late — override through jax.config before
any backend is initialized. All tests run on CPU (fast, deterministic); multi-device
sharding tests use the 8 virtual devices. Benchmarks (bench.py) run on the real TPU.
"""
import os
import tempfile

# isolate the persistent matrix-harvest cache (io/matrix_cache.py): tests load
# hundreds of synthetic dual-illuminant DNGs, and the auto-harvest side effect
# must never touch the user's real ~/.cache registry
os.environ["PYSP_TPU_MATRIX_CACHE"] = os.path.join(
    tempfile.mkdtemp(prefix="pysp_matcache_"), "harvested_matrices.json"
)

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


def pytest_configure(config):
    """Build the native decode lib so the LJ92 tests run instead of skipping."""
    import pathlib
    import shutil
    import subprocess

    native = pathlib.Path(__file__).resolve().parent.parent / "native"
    so = native / "libdng_fast.so"
    src = native / "dng_fast.cc"
    if shutil.which("g++") and src.exists() and (
        not so.exists() or so.stat().st_mtime < src.stat().st_mtime
    ):
        subprocess.run(["make", "-C", str(native)], check=False, timeout=300)
