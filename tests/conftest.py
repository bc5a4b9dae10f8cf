"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are tested the standard way — CPU with
``--xla_force_host_platform_device_count`` — so the suite runs anywhere;
the real-TPU path is exercised by bench.py / the driver.

The override must survive environments whose ``sitecustomize`` imports JAX
at interpreter startup and registers an accelerator backend (setting the
env var then would be a silent no-op, and every "multi-device" test would
silently skip against 1 accelerator): env vars are set first, and if JAX
is already imported, ``jax.config.update("jax_platforms", ...)`` flips the
platform before any backend is instantiated. If the 8-device CPU mesh
still can't be established, the suite FAILS loudly instead of skipping.

Set SNARK_TPU_TESTS=1 to opt out of the CPU override and run the suite on
whatever accelerator JAX_PLATFORMS selects (slow over remote tunnels).
"""

import os
import sys

_USE_ACCEL = os.environ.get("SNARK_TPU_TESTS") == "1"

if not _USE_ACCEL:
    if os.environ.get("JAX_PLATFORMS") not in (None, "", "cpu"):
        sys.stderr.write(
            "[conftest] overriding JAX_PLATFORMS=%s -> cpu for the test "
            "suite (set SNARK_TPU_TESTS=1 to keep the accelerator)\n"
            % os.environ["JAX_PLATFORMS"]
        )
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    # sitecustomize may have imported jax before this conftest ran, in
    # which case the env var was already consumed; flip the live config
    # (safe as long as no backend has been initialized yet).
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

from snark_bn254_verifier_tpu.utils.config import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def pytest_configure(config):
    if _USE_ACCEL:
        return
    import jax

    devs = jax.devices()
    if len(devs) < 8 or devs[0].platform != "cpu":
        raise pytest.UsageError(
            "expected an 8-device virtual CPU mesh for the test suite, got "
            f"{devs!r}; the JAX backend was initialized before conftest "
            "could configure it"
        )


@pytest.fixture(scope="session")
def golden_dir():
    path = "/root/reference/examples/binaries"
    if not os.path.isdir(path):
        pytest.skip("reference golden vectors not available")
    return path
