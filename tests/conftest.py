"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multi-chip
path; real-TPU benchmarks live behind the `tpu` marker).

IMPORTANT (environment quirk): a sitecustomize in this image imports jax at
interpreter startup and registers the remote-TPU backend, so setting
JAX_PLATFORMS via os.environ here is too late -- jax has already read its
env.  Forcing CPU must go through jax.config, and XLA_FLAGS must be set
before the first backend initialization (it is read then, not at import).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA compiles dominate test wall-time on small
# CPU hosts; cache them across pytest runs.
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    # Fail fast if the CPU forcing ever stops working: running the test
    # suite against the single tunneled TPU chip is both slow and wrong
    # (the 8-device mesh tests need the virtual CPU devices).
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh, got " + jax.default_backend()
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
