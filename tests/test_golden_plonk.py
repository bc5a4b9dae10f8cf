"""Golden-vector end-to-end PlonK verification.

Reproduces the reference's only real test assertion — `verify == Ok(true)`
on the golden SP1 vectors (/root/reference/examples/script/src/main.rs:215-229)
— for the PlonK half, using the SP1 v2.0.0 PlonK verifying key recovered from
the reference guest ELF (see fixtures/extract_vk.py; the ELF embeds it via
include_bytes!, examples/program/src/plonk.rs:7).

The Groth16 VK is genuinely unrecoverable from the reference repo: both guest
ELFs are byte-identical copies of the PlonK guest (md5
da2eed74d61b418f0b66d8525466c6d0), so the groth16_vk.bin bytes never shipped.
Groth16 end-to-end coverage instead uses the trapdoor-generated synthetic
vectors (fixtures/gen.py), plus golden *structure* checks in
test_serialization.py.
"""

import os
from pathlib import Path

import pytest

from snark_bn254_verifier_tpu import PlonkVerifier
from snark_bn254_verifier_tpu.utils.sp1_wrapper import load_sp1_wrapper

pytestmark = pytest.mark.smoke  # host-only: sub-2-minute iteration tier

ELFS = ["fibonacci", "is-prime", "sha2", "tendermint"]
VK_PATH = (
    Path(__file__).resolve().parent.parent
    / "snark_bn254_verifier_tpu"
    / "fixtures"
    / "plonk_vk.bin"
)


@pytest.fixture(scope="module")
def plonk_vk() -> bytes:
    return VK_PATH.read_bytes()


@pytest.fixture(scope="module")
def golden(golden_dir):
    out = {}
    for elf in ELFS:
        w = load_sp1_wrapper(os.path.join(golden_dir, f"{elf}_plonk_proof.bin"))
        out[elf] = w
    return out


@pytest.mark.parametrize("elf", ELFS)
def test_golden_plonk_oracle(plonk_vk, golden, elf):
    w = golden[elf]
    assert PlonkVerifier.verify(w.raw_proof, plonk_vk, w.public_inputs) is True


@pytest.mark.parametrize("elf", ELFS)
def test_golden_plonk_negative_mutated_proof(plonk_vk, golden, elf):
    """Flipping a byte in each structural region must fail verification
    (either load error -> exception mirrors the reference's unwrap, or
    verify False)."""
    w = golden[elf]
    for offset in (3, 520, 810):  # lro[0].x, a claimed value, z_shifted value
        bad = bytearray(w.raw_proof)
        bad[offset] ^= 0x01
        try:
            ok = PlonkVerifier.verify(bytes(bad), plonk_vk, w.public_inputs)
        except Exception:
            continue
        assert ok is False


def test_golden_plonk_negative_wrong_inputs(plonk_vk, golden):
    """Wrong public inputs are rejected at the linearization check — an
    error, mirroring the reference's Err(OpeningPolyMismatch)
    (plonk/verify.rs:209-213)."""
    from snark_bn254_verifier_tpu.utils import errors

    w = golden["fibonacci"]
    wrong = list(w.public_inputs)
    wrong[0] = (wrong[0] + 1) % (2**250)
    with pytest.raises(errors.VerifierError):
        PlonkVerifier.verify(w.raw_proof, plonk_vk, wrong)


@pytest.mark.slow
@pytest.mark.parametrize("elf", ELFS)
def test_golden_plonk_jax_backend(plonk_vk, golden, elf):
    w = golden[elf]
    assert (
        PlonkVerifier.verify(w.raw_proof, plonk_vk, w.public_inputs, backend="jax")
        is True
    )


@pytest.mark.slow
def test_golden_plonk_batch(plonk_vk, golden):
    """All four golden vectors in one batch, plus one corrupted lane that
    must be isolated as False without poisoning the others."""
    from snark_bn254_verifier_tpu.parallel.batch import PlonkBatchVerifier

    proofs = [golden[e].raw_proof for e in ELFS]
    inputs = [list(golden[e].public_inputs) for e in ELFS]
    bad = bytearray(proofs[0])
    bad[530] ^= 0x01  # corrupt a claimed value (stays canonical w.h.p.)
    proofs.append(bytes(bad))
    inputs.append(inputs[0])

    verifier = PlonkBatchVerifier(plonk_vk)
    got = verifier.verify_batch(proofs, inputs)
    assert list(got) == [True, True, True, True, False]
