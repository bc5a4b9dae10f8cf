"""gnark codec tests: round-trips, flags, golden-vector structure."""

import os
import random

import pytest

from snark_bn254_verifier_tpu.oracle import bn254 as bn
from snark_bn254_verifier_tpu.utils import errors
from snark_bn254_verifier_tpu.utils import serialization as ser
from snark_bn254_verifier_tpu.utils.sp1_wrapper import load_sp1_wrapper

pytestmark = pytest.mark.smoke  # host-only: sub-2-minute iteration tier

rng = random.Random(99)


def rand_g1():
    return bn.g1_mul(bn.G1_GEN, rng.randrange(1, bn.R))


def rand_g2():
    return bn.g2_mul(bn.G2_GEN, rng.randrange(1, bn.R))


def test_g1_compressed_roundtrip():
    for _ in range(8):
        pt = rand_g1()
        buf = ser.g1_to_compressed_bytes(pt)
        assert len(buf) == 32
        assert ser.compressed_to_g1(buf) == pt


def test_g1_uncompressed_roundtrip():
    pt = rand_g1()
    buf = ser.g1_to_uncompressed_bytes(pt)
    assert len(buf) == 64
    assert ser.uncompressed_to_g1(buf) == pt


def test_g2_compressed_roundtrip():
    for _ in range(8):
        pt = rand_g2()
        buf = ser.g2_to_compressed_bytes(pt)
        assert len(buf) == 64
        assert ser.compressed_to_g2(buf) == pt


def test_g2_uncompressed_roundtrip():
    pt = rand_g2()
    buf = ser.g2_to_uncompressed_bytes(pt)
    assert len(buf) == 128
    assert ser.uncompressed_to_g2(buf) == pt


def test_compressed_flags_select_y():
    pt = rand_g1()
    x, y = pt
    buf = bytearray(x.to_bytes(32, "big"))
    big, small = (y, bn.P - y) if y > bn.P - y else (bn.P - y, y)
    buf[0] |= ser.FLAG_NEGATIVE
    assert ser.compressed_to_g1(bytes(buf)) == (x, big)
    buf[0] = (buf[0] & ~ser.MASK) | ser.FLAG_POSITIVE
    assert ser.compressed_to_g1(bytes(buf)) == (x, small)


def test_infinity_flag_requires_zeroed_bits():
    buf = bytearray(32)
    buf[0] = ser.FLAG_INFINITY
    assert ser.compressed_to_g1(bytes(buf)) is None
    buf[5] = 1
    with pytest.raises(errors.InvalidPointError):
        ser.compressed_to_g1(bytes(buf))


def test_invalid_flag_rejected():
    buf = bytearray(ser.g1_to_compressed_bytes(rand_g1()))
    buf[0] &= ~ser.MASK  # flag 0b00 is invalid
    with pytest.raises(errors.InvalidPointError):
        ser.compressed_to_g1(bytes(buf))


def test_noncanonical_fq_rejected():
    buf = (bn.P).to_bytes(32, "big") + (2).to_bytes(32, "big")
    with pytest.raises(errors.FieldError):
        ser.uncompressed_to_g1(buf)


def test_off_curve_uncompressed_rejected():
    buf = (1).to_bytes(32, "big") + (3).to_bytes(32, "big")  # (1,3) not on curve
    with pytest.raises(errors.GroupError):
        ser.uncompressed_to_g1(buf)


def test_all_zero_uncompressed_rejected_g1_g2():
    """Reference parity: uncompressed (0,0) is NOT an infinity encoding —
    converter.rs:78-88/135-153 pass it to AffineG1/G2::new, whose on-curve
    check (0 != b) errors. All three parsers agree: this Python path, the
    native batch parser (bn254_host.cc g1_check), and the device G2 check
    (VERDICT r3 item #6)."""
    with pytest.raises(errors.GroupError):
        ser.uncompressed_to_g1(b"\x00" * 64)
    with pytest.raises(errors.GroupError):
        ser.uncompressed_to_g2(b"\x00" * 128)


def test_all_zero_uncompressed_native_parser_agrees():
    """The C++ batch parser marks a (0,0)-ar lane invalid (not infinity)."""
    from snark_bn254_verifier_tpu.utils import native

    if not native.native_available():
        pytest.skip("native parser not built")
    good = ser.g1_to_bytes(rand_g1())
    g2b = ser.g2_to_uncompressed_bytes(rand_g2())
    proof_zero_ar = b"\x00" * 64 + g2b + good
    outs = native.parse_groth16_batch(proof_zero_ar, len(proof_zero_ar), 1)
    assert not bool(outs["valid"][0])


def test_fr_from_slice_canonical():
    with pytest.raises(errors.FieldError):
        ser.fr_from_slice(bn.R.to_bytes(32, "big"))
    assert ser.fr_from_slice((bn.R - 1).to_bytes(32, "big")) == bn.R - 1


GOLDEN = [
    ("fibonacci", "groth16"), ("fibonacci", "plonk"),
    ("is-prime", "groth16"), ("is-prime", "plonk"),
    ("sha2", "groth16"), ("sha2", "plonk"),
    ("tendermint", "groth16"), ("tendermint", "plonk"),
]


@pytest.mark.parametrize("elf,mode", GOLDEN)
def test_golden_vector_raw_proofs_parse(golden_dir, elf, mode):
    """The 8 golden SP1 wrapper binaries parse, and every proof point is on
    the curve with canonical encodings — the strongest end-to-end byte check
    available without the out-of-repo SP1 VK fixtures (SURVEY.md §4)."""
    w = load_sp1_wrapper(os.path.join(golden_dir, f"{elf}_{mode}_proof.bin"))
    assert w.kind == mode
    assert len(w.public_inputs) == 2
    assert all(0 < v < bn.R for v in w.public_inputs)
    if mode == "groth16":
        assert len(w.raw_proof) == 324
        proof = ser.load_groth16_proof_from_bytes(w.raw_proof)
        assert bn.g1_is_on_curve(proof.ar) and proof.ar is not None
        assert bn.g1_is_on_curve(proof.krs) and proof.krs is not None
        assert bn.g2_is_on_curve(proof.bs) and proof.bs is not None
        # trailing bytes: u32 commitment count then pok
        assert int.from_bytes(w.raw_proof[256:260], "big") == 0
    else:
        assert len(w.raw_proof) == 904
        proof = ser.load_plonk_proof_from_bytes(w.raw_proof)
        for pt in (*proof.lro, proof.z, *proof.h, proof.batched_proof.h,
                   proof.z_shifted_opening.h, *proof.bsb22_commitments):
            assert pt is not None and bn.g1_is_on_curve(pt)
        assert len(proof.batched_proof.claimed_values) == 7
        assert len(proof.bsb22_commitments) == 1
