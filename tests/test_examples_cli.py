"""Examples CLI driver (parity with examples/script/src/main.rs CLI)."""

from snark_bn254_verifier_tpu.examples import main

import pytest

pytestmark = pytest.mark.smoke  # host-only: sub-2-minute iteration tier


def test_synthetic_groth16():
    assert main(["--synthetic", "--mode", "groth16"]) == 0


def test_synthetic_plonk():
    assert main(["--synthetic", "--mode", "plonk"]) == 0


def test_golden_structure_check(golden_dir):
    assert main(["--golden", "--elf", "sha2", "--mode", "plonk"]) == 0


def test_profiling_section_timer():
    from snark_bn254_verifier_tpu.utils import profiling as prof

    prof.reset_timings()
    with prof.section("demo"):
        pass
    assert "demo" in prof.get_timings()
    stats = prof.RunStats(
        protocol="groth16", batch_size=100, n_chips=1, elapsed_s=0.5, n_valid=100
    )
    assert stats.proofs_per_sec == 200.0
    assert "proofs_per_sec_per_chip" in stats.to_json()
