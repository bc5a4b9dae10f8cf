"""Pippenger MSM vs the oracle (small N so CPU compile stays bounded)."""

import random

import jax
import numpy as np
import pytest

from snark_bn254_verifier_tpu.models.jax_backend import unpack_g1_jacobian
from snark_bn254_verifier_tpu.oracle import bn254 as bn
from snark_bn254_verifier_tpu.ops import field as F
from snark_bn254_verifier_tpu.ops import msm as M

pytestmark = pytest.mark.slow

rng = random.Random(9)


def _pack(pts, scs):
    x = np.stack([F.FQ.pack_scalar(p[0] if p else 0) for p in pts])
    y = np.stack([F.FQ.pack_scalar(p[1] if p else 0) for p in pts])
    inf = np.asarray([p is None for p in pts])
    sc = np.stack([F.FR.pack_scalar(s, mont=False) for s in scs])
    return (x, y, inf), sc


def test_pippenger_matches_oracle_with_edge_cases():
    n = 32
    pts = [bn.g1_mul(bn.G1_GEN, rng.randrange(1, bn.R)) for _ in range(n)]
    scs = [rng.randrange(bn.R) for _ in range(n)]
    scs[3] = 0        # zero scalar
    pts[7] = None     # infinity input
    scs[9] = scs[10]  # duplicate scalar (same bucket, distinct points)
    pts[11] = pts[12]  # duplicate point (bucket doubling path)
    points, sc = _pack(pts, scs)
    out = M.msm_pippenger_jit(points, sc, c=8)
    got = unpack_g1_jacobian(jax.tree_util.tree_map(lambda a: a[:, None], out))[0]
    exp = bn.g1_msm([p for p in pts if p], [s for p, s in zip(pts, scs) if p])
    assert got == exp


def test_pippenger_all_zero_scalars_is_infinity():
    n = 8
    pts = [bn.g1_mul(bn.G1_GEN, i + 1) for i in range(n)]
    scs = [0] * n
    points, sc = _pack(pts, scs)
    out = M.msm_pippenger_jit(points, sc, c=8)
    got = unpack_g1_jacobian(jax.tree_util.tree_map(lambda a: a[:, None], out))[0]
    assert got is None
