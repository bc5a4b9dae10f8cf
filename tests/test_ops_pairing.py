"""Device pairing vs the oracle. Marked slow: first run pays a large
one-time XLA compile (cached persistently afterwards)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snark_bn254_verifier_tpu.models.jax_backend import (
    pack_g1,
    pack_g2,
    unpack_fq12,
)
from snark_bn254_verifier_tpu.oracle import bn254 as bn
from snark_bn254_verifier_tpu.ops import pairing as PR
from snark_bn254_verifier_tpu.utils.config import enable_compilation_cache

enable_compilation_cache()

rng = random.Random(31)
B = 4

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pairs():
    ps = [bn.g1_mul(bn.G1_GEN, rng.randrange(1, bn.R)) for _ in range(B)]
    qs = [bn.g2_mul(bn.G2_GEN, rng.randrange(1, bn.R)) for _ in range(B)]
    return ps, qs


def test_pairing_matches_oracle(pairs):
    ps, qs = pairs
    got = unpack_fq12(PR.pairing(pack_g1(ps), pack_g2(qs)))
    assert got == [bn.pairing(p, q) for p, q in zip(ps, qs)]


def test_pairing_infinity(pairs):
    ps, qs = pairs
    got = unpack_fq12(PR.pairing(pack_g1([None] * B), pack_g2(qs)))
    assert all(g == bn.FQ12_ONE for g in got)


def test_pairing_batch_matches_oracle(pairs):
    n = 3
    pps = [[bn.g1_mul(bn.G1_GEN, rng.randrange(1, bn.R)) for _ in range(B)] for _ in range(n)]
    qqs = [[bn.g2_mul(bn.G2_GEN, rng.randrange(1, bn.R)) for _ in range(B)] for _ in range(n)]
    P3 = tuple(jnp.stack([pack_g1(pp)[i] for pp in pps]) for i in range(3))
    Q3 = tuple(jnp.stack([pack_g2(qq)[i] for qq in qqs]) for i in range(3))
    got = unpack_fq12(PR.pairing_batch(P3, Q3))
    exp = [
        bn.pairing_batch([(pps[i][j], qqs[i][j]) for i in range(n)])
        for j in range(B)
    ]
    assert got == exp
