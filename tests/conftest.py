"""Test config: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (SURVEY §4's substitute for
the reference's nonexistent distributed tests).
"""
import os

# the axon sitecustomize pins JAX_PLATFORMS=axon; config.update below wins
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8, devs
    return devs


@pytest.fixture(autouse=True)
def _f32_matmuls():
    # exact float32 matmuls for parity tests
    with jax.default_matmul_precision("highest"):
        yield
