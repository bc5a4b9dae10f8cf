"""Oracle (pure-Python BN254) correctness: algebraic identities.

Without an independent in-environment pairing library, correctness rests on
identities that essentially cannot hold by accident: bilinearity of the
pairing, group orders, tower inverse round-trips, Frobenius consistency.
"""

import random

from snark_bn254_verifier_tpu.oracle import bn254 as o

import pytest

pytestmark = pytest.mark.smoke  # host-only: sub-2-minute iteration tier

rng = random.Random(1234)


def rand_fr():
    return rng.randrange(1, o.R)


def rand_fq():
    return rng.randrange(0, o.P)


def rand_fq2():
    return (rand_fq(), rand_fq())


def rand_fq12():
    return (
        (rand_fq2(), rand_fq2(), rand_fq2()),
        (rand_fq2(), rand_fq2(), rand_fq2()),
    )


def test_generators_on_curve_and_order():
    assert o.g1_is_on_curve(o.G1_GEN)
    assert o.g2_is_on_curve(o.G2_GEN)
    assert o.g1_mul(o.G1_GEN, o.R) is None
    assert o.g2_mul(o.G2_GEN, o.R) is None


def test_fq_sqrt():
    for _ in range(10):
        a = rand_fq()
        s = o.fq_mul(a, a)
        r = o.fq_sqrt(s)
        assert r is not None and o.fq_mul(r, r) == s
    # quadratic non-residue must fail: find one
    nonresidues = [a for a in range(2, 40) if pow(a, (o.P - 1) // 2, o.P) == o.P - 1]
    assert nonresidues and o.fq_sqrt(nonresidues[0]) is None


def test_fq2_field_axioms_and_sqrt():
    for _ in range(10):
        a, b = rand_fq2(), rand_fq2()
        assert o.fq2_mul(a, b) == o.fq2_mul(b, a)
        assert o.fq2_mul(a, o.fq2_inv(a)) == o.FQ2_ONE
        s = o.fq2_sq(a)
        r = o.fq2_sqrt(s)
        assert r is not None and o.fq2_sq(r) == s


def test_fq6_fq12_inverse_roundtrip():
    for _ in range(5):
        a = (rand_fq2(), rand_fq2(), rand_fq2())
        assert o.fq6_mul(a, o.fq6_inv(a)) == o.FQ6_ONE
        f = rand_fq12()
        assert o.fq12_mul(f, o.fq12_inv(f)) == o.FQ12_ONE


def test_frobenius_is_pth_power():
    f = rand_fq12()
    # frobenius(f) == f^p  (checked via small exponent identity:
    # frob applied 12 times is the identity, and frob(f*g)=frob(f)frob(g))
    g = rand_fq12()
    assert o.fq12_frobenius(o.fq12_mul(f, g)) == o.fq12_mul(
        o.fq12_frobenius(f), o.fq12_frobenius(g)
    )
    x = f
    for _ in range(12):
        x = o.fq12_frobenius(x)
    assert x == f
    # direct check on a small element: frob(f) == f^p
    small = o.fq12_from_wbasis([(3, 5)] + [o.FQ2_ZERO] * 5)
    assert o.fq12_frobenius(small) == o.fq12_pow(small, o.P)


def test_pairing_bilinearity():
    e = o.pairing(o.G1_GEN, o.G2_GEN)
    assert e != o.FQ12_ONE
    assert o.fq12_pow(e, o.R) == o.FQ12_ONE
    a, b = rand_fr(), rand_fr()
    assert o.pairing(o.g1_mul(o.G1_GEN, a), o.g2_mul(o.G2_GEN, b)) == o.fq12_pow(
        e, a * b % o.R
    )


def test_pairing_batch_matches_product():
    a, b = 7, 11
    p1, q1 = o.g1_mul(o.G1_GEN, a), o.G2_GEN
    p2, q2 = o.g1_mul(o.G1_GEN, b), o.g2_mul(o.G2_GEN, 3)
    batch = o.pairing_batch([(p1, q1), (p2, q2)])
    prod = o.fq12_mul(o.miller_loop(p1, q1), o.miller_loop(p2, q2))
    assert batch == o.final_exponentiation(prod)
    assert batch == o.fq12_pow(o.pairing(o.G1_GEN, o.G2_GEN), (a + 3 * b) % o.R)


def test_pairing_batch_cancellation_is_one():
    # e(P, Q) * e(-P, Q) == 1 — the shape of the KZG final check
    p = o.g1_mul(o.G1_GEN, 42)
    assert o.fq12_is_one(o.pairing_batch([(p, o.G2_GEN), (o.g1_neg(p), o.G2_GEN)]))


def test_g1_msm():
    pts = [o.g1_mul(o.G1_GEN, k) for k in (2, 3, 5)]
    scalars = [7, 11, 13]
    expected = o.g1_mul(o.G1_GEN, 2 * 7 + 3 * 11 + 5 * 13)
    assert o.g1_msm(pts, scalars) == expected
