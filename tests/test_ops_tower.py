"""Device tower ops (array representation) vs the oracle."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snark_bn254_verifier_tpu.oracle import bn254 as bn
from snark_bn254_verifier_tpu.ops import field as F
from snark_bn254_verifier_tpu.ops import tower as T
from snark_bn254_verifier_tpu.ops.limbs import limbs_batch_to_ints

rng = random.Random(5)
B = 4
RINV = pow(F.FQ.r_mod, -1, bn.P)


def pack_fq(vals):
    return jnp.asarray(F.FQ.pack(vals))


def un_fq(x):
    return [v * RINV % bn.P for v in limbs_batch_to_ints(np.asarray(x))]


def pack_fq2(vals):
    return jnp.stack(
        [pack_fq([v[0] for v in vals]), pack_fq([v[1] for v in vals])], axis=1
    )


def un_fq2(x):
    a, b = un_fq(x[:, 0]), un_fq(x[:, 1])
    return list(zip(a, b))


def pack_fq12(vals):
    comps = []
    for h in range(2):
        for j in range(3):
            comps.append(pack_fq([v[h][j][0] for v in vals]))
            comps.append(pack_fq([v[h][j][1] for v in vals]))
    return jnp.stack(comps, axis=1)


def un_fq12(x):
    comps = [un_fq(x[:, c]) for c in range(12)]
    return [
        tuple(
            tuple((comps[6 * h + 2 * j][k], comps[6 * h + 2 * j + 1][k]) for j in range(3))
            for h in range(2)
        )
        for k in range(B)
    ]


def rand_fq2():
    return (rng.randrange(bn.P), rng.randrange(bn.P))


def rand_fq12():
    return (
        tuple(rand_fq2() for _ in range(3)),
        tuple(rand_fq2() for _ in range(3)),
    )


@pytest.fixture(scope="module")
def f2():
    a = [rand_fq2() for _ in range(B)]
    b = [rand_fq2() for _ in range(B)]
    return a, b, pack_fq2(a), pack_fq2(b)


def test_fq2_mul_sq_inv(f2):
    a, b, ja, jb = f2
    assert un_fq2(T.fq2_mul(ja, jb)) == [bn.fq2_mul(x, y) for x, y in zip(a, b)]
    assert un_fq2(T.fq2_sq(ja)) == [bn.fq2_sq(x) for x in a]
    assert un_fq2(T.fq2_inv(ja)) == [bn.fq2_inv(x) for x in a]
    assert un_fq2(T.fq2_mul_xi(ja)) == [bn.fq2_mul(bn.XI, x) for x in a]
    assert un_fq2(T.fq2_conj(ja)) == [bn.fq2_conj(x) for x in a]


def test_fq2_mul_many_wide(f2):
    a, b, ja, jb = f2
    outs = T.fq2_mul_many([(ja, jb), (jb, jb), (ja, ja)])
    assert un_fq2(outs[0]) == [bn.fq2_mul(x, y) for x, y in zip(a, b)]
    assert un_fq2(outs[1]) == [bn.fq2_sq(y) for y in b]
    assert un_fq2(outs[2]) == [bn.fq2_sq(x) for x in a]


def test_fq2_sqrt(f2):
    a, _, ja, _ = f2
    sq = T.fq2_sq(ja)
    root, ok = T.fq2_sqrt(sq)
    got = un_fq2(root)
    exp = [bn.fq2_sq(x) for x in a]
    assert all(bn.fq2_sq(g) == e for g, e in zip(got, exp))
    assert bool(np.asarray(ok).all())


def test_fq2_lex_largest():
    vals = [(1, 0), (bn.P - 1, 0), (5, (bn.P - 1) // 2 + 3), (7, 1)]
    packed = jnp.stack(
        [
            jnp.asarray(F.FQ.pack([v[0] for v in vals], mont=False)),
            jnp.asarray(F.FQ.pack([v[1] for v in vals], mont=False)),
        ],
        axis=1,
    )
    got = list(np.asarray(T.fq2_lexicographically_largest(packed)))
    assert got == [bn.fq2_lexicographically_largest(v) for v in vals]


@pytest.fixture(scope="module")
def f12():
    a = [rand_fq12() for _ in range(B)]
    b = [rand_fq12() for _ in range(B)]
    return a, b, pack_fq12(a), pack_fq12(b)


def test_fq12_mul_sq_inv(f12):
    a, b, ja, jb = f12
    assert un_fq12(T.fq12_mul(ja, jb)) == [bn.fq12_mul(x, y) for x, y in zip(a, b)]
    assert un_fq12(T.fq12_sq(ja)) == [bn.fq12_sq(x) for x in a]
    assert un_fq12(T.fq12_inv(ja)) == [bn.fq12_inv(x) for x in a]


def test_fq12_frobenius(f12):
    a, _, ja, _ = f12
    for p in (1, 2, 3):
        exp = list(a)
        for _ in range(p):
            exp = [bn.fq12_frobenius(x) for x in exp]
        assert un_fq12(T.fq12_frobenius(ja, p)) == exp


def test_fq12_cyclotomic_sq(f12):
    a, _, _, _ = f12
    cyc = []
    for x in a:
        f = bn.fq12_mul(bn.fq12_conj(x), bn.fq12_inv(x))
        cyc.append(bn.fq12_mul(bn.fq12_frobenius_n(f, 2), f))
    got = un_fq12(T.fq12_cyclotomic_sq(pack_fq12(cyc)))
    assert got == [bn.fq12_sq(x) for x in cyc]


def test_fq12_is_one(f12):
    _, _, ja, _ = f12
    one = T.fq12_one(ja.shape[2:])
    assert bool(np.asarray(T.fq12_is_one(one)).all())
    assert not bool(np.asarray(T.fq12_is_one(ja)).any())
