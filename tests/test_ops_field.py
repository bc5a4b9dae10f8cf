"""Device (jnp) Montgomery field ops vs the Python-int oracle."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from snark_bn254_verifier_tpu.oracle import bn254 as bn
from snark_bn254_verifier_tpu.ops import field as F
from snark_bn254_verifier_tpu.ops.limbs import (
    int_to_limbs,
    limbs_to_int,
    limbs_batch_to_ints,
)

rng = random.Random(1)
B = 8
RINV = pow(F.FQ.r_mod, -1, bn.P)


def unmont(x):
    return [v * RINV % bn.P for v in limbs_batch_to_ints(np.asarray(x))]


@pytest.fixture(scope="module")
def ab():
    va = [rng.randrange(bn.P) for _ in range(B)]
    vb = [rng.randrange(bn.P) for _ in range(B)]
    return va, vb, jnp.asarray(F.FQ.pack(va)), jnp.asarray(F.FQ.pack(vb))


def test_limb_roundtrip():
    for _ in range(5):
        v = rng.randrange(1 << 256)
        assert limbs_to_int(int_to_limbs(v)) == v


def test_mont_mul(ab):
    va, vb, a, b = ab
    assert unmont(F.fq_mul(a, b)) == [x * y % bn.P for x, y in zip(va, vb)]


def test_add_sub_neg(ab):
    va, vb, a, b = ab
    assert unmont(F.fq_add(a, b)) == [(x + y) % bn.P for x, y in zip(va, vb)]
    assert unmont(F.fq_sub(a, b)) == [(x - y) % bn.P for x, y in zip(va, vb)]
    assert unmont(F.fq_neg(a)) == [(-x) % bn.P for x in va]


def test_add_edge_values():
    vals = [0, 1, bn.P - 1, bn.P - 2]
    a = jnp.asarray(F.FQ.pack(vals))
    assert unmont(F.fq_add(a, a)) == [(2 * v) % bn.P for v in vals]
    assert unmont(F.fq_sub(a, jnp.asarray(F.FQ.pack([1] * 4)))) == [
        (v - 1) % bn.P for v in vals
    ]


def test_inverse(ab):
    va, _, a, _ = ab
    assert unmont(F.fq_inv(a)) == [pow(x, -1, bn.P) for x in va]


def test_pow_const(ab):
    va, _, a, _ = ab
    assert unmont(F.pow_const(F.FQ, a, 65537)) == [pow(x, 65537, bn.P) for x in va]


def test_sqrt(ab):
    va, _, a, _ = ab
    sq = F.fq_sq(a)
    root, ok = F.sqrt_q3mod4(F.FQ, sq)
    got = unmont(root)
    assert all((g * g) % bn.P == (x * x) % bn.P for g, x in zip(got, va))
    assert bool(np.asarray(ok).all())


def test_sqrt_nonresidue_flagged():
    nonres = next(a for a in range(2, 50) if pow(a, (bn.P - 1) // 2, bn.P) == bn.P - 1)
    a = jnp.asarray(F.FQ.pack([nonres]))
    _, ok = F.sqrt_q3mod4(F.FQ, a)
    assert not bool(np.asarray(ok).any())


def test_batch_inv_with_zero(ab):
    va, _, a, _ = ab
    vz = list(va)
    vz[3] = 0
    az = jnp.asarray(F.FQ.pack(vz))
    got = unmont(F.batch_inv(F.FQ, az))
    assert got == [pow(x, -1, bn.P) if x else 0 for x in vz]


def test_fr_field():
    va = [rng.randrange(bn.R) for _ in range(B)]
    a = jnp.asarray(F.FR.pack(va))
    rinv_r = pow(F.FR.r_mod, -1, bn.R)
    got = [v * rinv_r % bn.R for v in limbs_batch_to_ints(np.asarray(F.fr_mul(a, a)))]
    assert got == [x * x % bn.R for x in va]


def test_geq_half():
    vals = [0, 1, (bn.P - 1) // 2, (bn.P - 1) // 2 + 1, bn.P - 1]
    a = jnp.asarray(F.FQ.pack(vals, mont=False))
    got = list(np.asarray(F.geq_half(F.FQ, a)))
    assert got == [v > (bn.P - 1) // 2 for v in vals]


def test_wide_component_axis(ab):
    """Ops broadcast over an inserted component axis (tower layout)."""
    va, vb, a, b = ab
    aw = jnp.stack([a, b], axis=1)  # (16, 2, B)
    got = F.fq_mul(aw, aw)
    assert unmont(got[:, 0]) == [x * x % bn.P for x in va]
    assert unmont(got[:, 1]) == [x * x % bn.P for x in vb]
