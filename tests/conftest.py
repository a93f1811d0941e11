"""Test config: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers an `axon` TPU backend and imports
jax before any test code runs, so env vars alone are too late — we override
through jax.config (effective until a backend is actually initialized) and
set the host-device-count XLA flag before the CPU client spins up.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

from cvd_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

assert jax.device_count() == 8, (
    f"tests expect an 8-device virtual CPU mesh, got {jax.devices()}"
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: compile-heavy end-to-end tests (pipelines/CLIs/train); "
        'deselect with -m "not slow" for the fast gate',
    )
