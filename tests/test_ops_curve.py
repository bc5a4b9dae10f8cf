"""Device curve ops vs the oracle (G1 over Fq, G2 over Fq2 arrays)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snark_bn254_verifier_tpu.models.jax_backend import (
    pack_fr_canonical,
    pack_g1,
    pack_g2,
    unpack_fq,
    unpack_g1_jacobian,
)
from snark_bn254_verifier_tpu.oracle import bn254 as bn
from snark_bn254_verifier_tpu.ops import curve as C
from snark_bn254_verifier_tpu.ops import field as F

rng = random.Random(13)
B = 4


def rand_g1():
    return bn.g1_mul(bn.G1_GEN, rng.randrange(1, bn.R))


def rand_g2():
    return bn.g2_mul(bn.G2_GEN, rng.randrange(1, bn.R))


def un_g2_jacobian(p):
    aff = C.to_affine(C.G2_OPS, p)
    x0 = unpack_fq(aff[0][:, 0])
    x1 = unpack_fq(aff[0][:, 1])
    y0 = unpack_fq(aff[1][:, 0])
    y1 = unpack_fq(aff[1][:, 1])
    infs = np.asarray(aff[2])
    return [
        None if infs[j] else ((x0[j], x1[j]), (y0[j], y1[j]))
        for j in range(len(x0))
    ]


@pytest.fixture(scope="module")
def g1pts():
    ps = [rand_g1() for _ in range(B)]
    qs = [rand_g1() for _ in range(B)]
    return ps, qs


def test_g1_double_add(g1pts):
    ps, qs = g1pts
    jp = C.to_jacobian(C.G1_OPS, pack_g1(ps))
    got = unpack_g1_jacobian(C.jacobian_double(C.G1_OPS, jp))
    assert got == [bn.g1_double(p) for p in ps]
    got = unpack_g1_jacobian(C.jacobian_add_mixed(C.G1_OPS, jp, pack_g1(qs)))
    assert got == [bn.g1_add(p, q) for p, q in zip(ps, qs)]
    got = unpack_g1_jacobian(
        C.jacobian_add(C.G1_OPS, jp, C.to_jacobian(C.G1_OPS, pack_g1(qs)))
    )
    assert got == [bn.g1_add(p, q) for p, q in zip(ps, qs)]


def test_g1_add_edge_cases(g1pts):
    ps, _ = g1pts
    jp = C.to_jacobian(C.G1_OPS, pack_g1(ps))
    # p + p -> double
    got = unpack_g1_jacobian(C.jacobian_add_mixed(C.G1_OPS, jp, pack_g1(ps)))
    assert got == [bn.g1_double(p) for p in ps]
    # p + (-p) -> infinity
    got = unpack_g1_jacobian(
        C.jacobian_add_mixed(C.G1_OPS, jp, pack_g1([bn.g1_neg(p) for p in ps]))
    )
    assert got == [None] * B
    # inf + q -> q ; p + inf -> p
    inf_j = C.to_jacobian(C.G1_OPS, pack_g1([None] * B))
    assert unpack_g1_jacobian(C.jacobian_add_mixed(C.G1_OPS, inf_j, pack_g1(ps))) == ps
    assert unpack_g1_jacobian(C.jacobian_add_mixed(C.G1_OPS, jp, pack_g1([None] * B))) == ps


def test_g1_scalar_mul(g1pts):
    ps, _ = g1pts
    scal = [rng.randrange(bn.R) for _ in range(B)]
    out = C.scalar_mul(C.G1_OPS, pack_g1(ps), jnp.asarray(F.FR.pack(scal, mont=False)))
    assert unpack_g1_jacobian(out) == [bn.g1_mul(p, s) for p, s in zip(ps, scal)]


def test_g1_msm(g1pts):
    n = 3
    pts = [[rand_g1() for _ in range(B)] for _ in range(n)]
    scs = [[rng.randrange(bn.R) for _ in range(B)] for _ in range(n)]
    stacked = tuple(jnp.stack([pack_g1(row)[i] for row in pts]) for i in range(3))
    sc = jnp.stack([pack_fr_canonical(row) for row in scs], axis=0)
    got = unpack_g1_jacobian(C.msm(C.G1_OPS, stacked, sc))
    exp = [
        bn.g1_msm([pts[i][j] for i in range(n)], [scs[i][j] for i in range(n)])
        for j in range(B)
    ]
    assert got == exp


def test_g2_double_add():
    ps = [rand_g2() for _ in range(B)]
    qs = [rand_g2() for _ in range(B)]
    jp = C.to_jacobian(C.G2_OPS, pack_g2(ps))
    assert un_g2_jacobian(C.jacobian_double(C.G2_OPS, jp)) == [bn.g2_add(p, p) for p in ps]
    got = un_g2_jacobian(C.jacobian_add_mixed(C.G2_OPS, jp, pack_g2(qs)))
    assert got == [bn.g2_add(p, q) for p, q in zip(ps, qs)]


def test_on_curve_checks(g1pts):
    ps, _ = g1pts
    assert bool(np.asarray(C.is_on_curve_affine(C.G1_OPS, pack_g1(ps))).all())
    bad = pack_g1([(1, 3)] * B)  # (1,3) is off-curve
    assert not bool(np.asarray(C.is_on_curve_affine(C.G1_OPS, bad)).any())
    g2s = [rand_g2() for _ in range(B)]
    assert bool(np.asarray(C.is_on_curve_affine(C.G2_OPS, pack_g2(g2s))).all())
