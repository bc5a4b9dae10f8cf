"""Single-proof device path: JaxBackend and backend dispatch.

The batched pipeline (parallel/batch.py) has its own tests; these pin the
``backend="jax"`` single-proof path (models/jax_backend.py) that serves the
reference's one-call API shape (verifier/src/lib.rs:44,69) with device
compute, plus ``set_default_backend`` which nothing else exercises.
"""

import random

import pytest

from snark_bn254_verifier_tpu import (
    Groth16Verifier,
    PlonkVerifier,
    set_default_backend,
)
from snark_bn254_verifier_tpu.fixtures.gen import gen_groth16_vector, gen_plonk_vector
from snark_bn254_verifier_tpu.models.backend import get_backend
from snark_bn254_verifier_tpu.models.groth16 import PreparedVerifyingKey, verify_groth16
from snark_bn254_verifier_tpu.oracle import bn254 as bn
from snark_bn254_verifier_tpu.utils import serialization as ser

pytestmark = pytest.mark.slow  # pays the single-lane pairing compile

rng = random.Random(17)


@pytest.fixture(scope="module")
def g16():
    return gen_groth16_vector(3)


@pytest.fixture(scope="module")
def plk():
    return gen_plonk_vector(3)


# -- backend primitive parity ----------------------------------------------


def test_jax_backend_msm_matches_oracle():
    be = get_backend("jax")
    pts = [bn.g1_mul(bn.G1_GEN, rng.randrange(1, bn.R)) for _ in range(5)]
    scs = [rng.randrange(bn.R) for _ in range(5)]
    scs[2] = 0
    assert be.msm(pts, scs) == bn.g1_msm(pts, scs)
    assert be.g1_mul(pts[0], scs[0]) == bn.g1_mul(pts[0], scs[0])


def test_jax_backend_pairing_matches_oracle():
    be = get_backend("jax")
    p = bn.g1_mul(bn.G1_GEN, 5)
    q = bn.g2_mul(bn.G2_GEN, 9)
    assert be.pairing(p, q) == bn.pairing(p, q)


def test_jax_backend_pairing_batch_matches_oracle():
    be = get_backend("jax")
    pairs = [
        (bn.g1_mul(bn.G1_GEN, 3), bn.g2_mul(bn.G2_GEN, 4)),
        (bn.g1_mul(bn.G1_GEN, 12), bn.g2_neg(bn.G2_GEN)),
    ]
    assert be.pairing_batch(pairs) == bn.pairing_batch(pairs)
    # e(3G1, 4G2) * e(12G1, -G2) == 1
    assert be.pairing_batch_is_one(pairs) is True


# -- protocol verifiers on the jax backend ---------------------------------


def test_groth16_jax_backend_verifies(g16):
    assert (
        Groth16Verifier.verify(g16.proof, g16.vk, g16.public_inputs, backend="jax")
        is True
    )


def test_groth16_jax_backend_wrong_input_fails(g16):
    bad = list(g16.public_inputs)
    bad[0] = (bad[0] + 1) % bn.R
    assert Groth16Verifier.verify(g16.proof, g16.vk, bad, backend="jax") is False


def test_groth16_jax_backend_prepared_vk(g16):
    vk = ser.load_groth16_verifying_key_from_bytes(g16.vk)
    proof = ser.load_groth16_proof_from_bytes(g16.proof)
    prepared = PreparedVerifyingKey.from_vk(vk, backend="jax")
    assert (
        verify_groth16(vk, proof, g16.public_inputs, backend="jax", prepared=prepared)
        is True
    )


def test_plonk_jax_backend_verifies(plk):
    assert (
        PlonkVerifier.verify(plk.proof, plk.vk, plk.public_inputs, backend="jax")
        is True
    )


def test_set_default_backend_routes_to_jax(g16):
    set_default_backend("jax")
    try:
        assert get_backend("default").name == "jax"
        assert Groth16Verifier.verify(g16.proof, g16.vk, g16.public_inputs) is True
    finally:
        set_default_backend("oracle")
    assert get_backend("default").name == "oracle"
