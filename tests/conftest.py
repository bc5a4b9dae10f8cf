"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are tested the standard way — CPU with
``--xla_force_host_platform_device_count`` — so the suite runs anywhere;
the real-TPU path is exercised by bench.py / the driver.
"""

import os

# Hard-set (not setdefault): under the driver, JAX_PLATFORMS=axon points at a
# remote TPU tunnel, where per-op round trips make eager tests pathologically
# slow. The suite always runs on the virtual CPU mesh; bench.py uses the TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

from snark_bn254_verifier_tpu.utils.config import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


@pytest.fixture(scope="session")
def golden_dir():
    path = "/root/reference/examples/binaries"
    if not os.path.isdir(path):
        pytest.skip("reference golden vectors not available")
    return path
