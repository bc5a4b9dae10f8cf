"""The Pallas kernel registry / preflight-coverage contract.

r04 shipped a TPU-unlowerable kernel behind a PASSING preflight because the
preflight validated only the single-proof kernels. These tests pin the
contract that prevents a recurrence: every public Pallas entry point is
listed in ops/pairing_pallas.py::KERNEL_ENTRY_POINTS, and bench.py's
preflight stage map covers that registry — so adding a kernel without
wiring its on-TPU validation fails the suite immediately.
"""

import importlib.util
import os

import pytest

pytestmark = pytest.mark.smoke


def _load_bench():
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_registry_matches_public_module_surface():
    from snark_bn254_verifier_tpu.ops import pairing_pallas as PP

    public = {
        n
        for n in dir(PP)
        if n.endswith("_mega") and not n.startswith("_")
        and callable(getattr(PP, n))
    }
    assert public == set(PP.KERNEL_ENTRY_POINTS)


def test_preflight_stage_map_covers_registry():
    from snark_bn254_verifier_tpu.ops import pairing_pallas as PP

    bench = _load_bench()
    covered = set()
    for kernels in bench.PREFLIGHT_KERNEL_COVERAGE.values():
        covered.update(kernels)
    missing = set(PP.KERNEL_ENTRY_POINTS) - covered
    assert not missing, (
        f"Pallas kernels with no preflight validation stage: {missing}"
    )
