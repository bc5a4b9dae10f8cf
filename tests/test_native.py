"""Native C++ host data-plane vs the Python reference implementations."""

import random

import numpy as np
import pytest

from snark_bn254_verifier_tpu.fixtures.gen import gen_groth16_vector
from snark_bn254_verifier_tpu.oracle import bn254 as bn
from snark_bn254_verifier_tpu.ops import field as F
from snark_bn254_verifier_tpu.ops.limbs import limbs_batch_to_ints
from snark_bn254_verifier_tpu.utils import native
from snark_bn254_verifier_tpu.utils import serialization as ser

pytestmark = [
    pytest.mark.skipif(
        not native.native_available(), reason="native library unavailable"
    ),
    pytest.mark.smoke,  # host-only: sub-2-minute iteration tier
]

rng = random.Random(17)
RINV = pow(F.FQ.r_mod, -1, bn.P)


def test_pack_matches_python_packer():
    vals = [rng.randrange(bn.P) for _ in range(32)]
    data = b"".join(v.to_bytes(32, "big") for v in vals)
    out, flags = native.pack_be_batch(data, 32, "fq", to_mont=True)
    assert (out == F.FQ.pack(vals)).all()
    assert not flags.any()


def test_pack_fr():
    vals = [rng.randrange(bn.R) for _ in range(8)]
    data = b"".join(v.to_bytes(32, "big") for v in vals)
    out, _ = native.pack_be_batch(data, 8, "fr", to_mont=False)
    assert limbs_batch_to_ints(out) == vals


def test_noncanonical_flagged_and_reduced():
    data = (bn.P + 7).to_bytes(32, "big")
    out, flags = native.pack_be_batch(data, 1, "fq", to_mont=False)
    assert flags[0] == 1
    assert limbs_batch_to_ints(out)[0] == 7


def test_groth16_batch_parse_matches_loader():
    v = gen_groth16_vector(0)
    b = 4
    outs = native.parse_groth16_batch(v.proof * b, len(v.proof), b)
    proof = ser.load_groth16_proof_from_bytes(v.proof)

    def un(a):
        return [x * RINV % bn.P for x in limbs_batch_to_ints(a)]

    assert un(outs["ar_x"]) == [proof.ar[0]] * b
    assert un(outs["ar_y"]) == [proof.ar[1]] * b
    assert un(outs["bs_x0"]) == [proof.bs[0][0]] * b
    assert un(outs["bs_x1"]) == [proof.bs[0][1]] * b
    assert un(outs["bs_y0"]) == [proof.bs[1][0]] * b
    assert un(outs["krs_y"]) == [proof.krs[1]] * b
    assert outs["valid"].all()


def test_groth16_batch_parse_rejects_bad_lane():
    v = gen_groth16_vector(0)
    blob = bytearray(v.proof * 3)
    blob[len(v.proof) + 40] ^= 0xFF  # lane 1: corrupt ar.y -> off-curve
    outs = native.parse_groth16_batch(bytes(blob), len(v.proof), 3)
    assert outs["valid"].tolist() == [True, False, True]


def test_groth16_batch_parse_rejects_noncanonical():
    v = gen_groth16_vector(0)
    blob = bytearray(v.proof)
    blob[0:32] = bn.P.to_bytes(32, "big")  # ar.x = p (non-canonical)
    outs = native.parse_groth16_batch(bytes(blob), len(v.proof), 1)
    assert outs["valid"].tolist() == [False]
