"""Batched device verification end-to-end (synthetic gnark vectors),
including per-lane failure isolation. Slow on a cold compile cache."""

import numpy as np
import pytest

from snark_bn254_verifier_tpu.fixtures.gen import gen_groth16_vector, gen_plonk_vector
from snark_bn254_verifier_tpu.parallel.batch import (
    Groth16BatchVerifier,
    PlonkBatchVerifier,
)

pytestmark = pytest.mark.slow

B = 8


@pytest.fixture(scope="module")
def g16():
    return gen_groth16_vector(0)


@pytest.fixture(scope="module")
def plk():
    return gen_plonk_vector(0)


def test_groth16_batch_with_bad_lanes(g16):
    ver = Groth16BatchVerifier(g16.vk)
    proofs = [g16.proof] * B
    inputs = [list(g16.public_inputs) for _ in range(B)]
    bad = bytearray(g16.proof)
    bad[5] ^= 0xFF  # corrupt ar.x -> off-curve
    proofs[3] = bytes(bad)
    inputs[5] = [1, 2]  # wrong public input (right count)
    inputs[6] = [1]  # wrong input count
    ok = ver.verify_batch(proofs, inputs)
    assert ok.tolist() == [True, True, True, False, True, False, False, True]
    # observability: every batch run emits structured RunStats
    stats = ver.last_stats
    assert stats.protocol == "groth16" and stats.batch_size == B
    assert stats.n_valid == 5 and stats.pairings_per_proof == 3
    assert stats.pairings_per_sec > 0


def test_groth16_batch_python_parser_agrees(g16):
    ver = Groth16BatchVerifier(g16.vk)
    proofs = [g16.proof] * 4
    inputs = [list(g16.public_inputs)] * 4
    native = ver._parse_proofs(proofs)
    py = ver._parse_proofs_python(proofs)
    assert native is not None
    for a, b in zip(native[:3], py[:3]):
        for xa, xb in zip(a, b):
            assert (np.asarray(xa) == np.asarray(xb)).all()
    assert (native[3] == py[3]).all()


def test_plonk_batch_with_bad_lanes(plk):
    ver = PlonkBatchVerifier(plk.vk)
    proofs = [plk.proof] * B
    inputs = [list(plk.public_inputs) for _ in range(B)]
    bad = bytearray(plk.proof)
    bad[516 + 31] ^= 1  # corrupt claimed_values[0] -> linearization reject
    proofs[2] = bytes(bad)
    inputs[6] = [1, 2]  # wrong public input
    ok = ver.verify_batch(proofs, inputs)
    assert ok.tolist() == [True, True, False, True, True, True, False, True]
    stats = ver.last_stats
    assert stats.protocol == "plonk" and stats.n_valid == 6
    assert stats.pairings_per_proof == 2
    assert stats.extra["host_s"] > 0
