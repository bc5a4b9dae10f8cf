"""Interpret-mode tests for the Pallas TPU kernel tier.

``pallas_call(interpret=True)`` executes the exact kernel bodies (the
``field.kernel_mode()`` tracing: fori_loop CIOS, dynamic limb selects, no
scatters) through XLA on any backend, so a regression in the TPU execution
tier fails here on CPU instead of surfacing as a wrong answer on the chip.

Kernel bodies under test, against the pure-Python oracle:
  * ops/field_pallas.py::_mont_kernel        (mont_mul_pallas, Fq and Fr)
  * ops/pairing_pallas.py::_msm_windowed_kernel + _jacobian_combine_kernel
including infinity lanes and zero scalars. The pairing mega-kernels
(_miller_kernel, _fq12_product_kernel, _final_exp_kernel) are validated on
real hardware by tools/validate_pallas_tpu.py instead — see the gated
xfail repro below for why interpret mode cannot cover them under jax 0.9.

Reference capability being exercised: the L0 math tier the reference
delegates to substrate-bn (SURVEY.md §2.2) — pairing_batch
(verifier/src/groth16/verify.rs:73), AffineG1::msm
(verifier/src/plonk/verify.rs:284).
"""

import os
import random

import numpy as np
import pytest

# The Miller-loop / final-exp interpret graphs take >45 min of XLA CPU
# compile on a 2-core host, and — measured on real hardware — jax 0.9's
# pallas interpret mode DIVERGES from the Mosaic lowering on the Miller
# mega-kernel (every output limb differs), while the Mosaic output matches
# both the XLA-scan path and the oracle bit-exactly, and the mont-mul/MSM
# kernels interpret correctly. Production coverage for the pairing kernels
# therefore comes from tools/validate_pallas_tpu.py (Mosaic vs oracle on
# the chip — validation record in its docstring); the tests below are kept
# as the upstream interpret-mode repro: env-gated against the compile
# cost, xfail against the known divergence.
_HEAVY = [
    pytest.mark.skipif(
        os.environ.get("SNARK_PALLAS_HEAVY") != "1",
        reason="interpret-mode pairing compile exceeds small-host budgets; "
        "set SNARK_PALLAS_HEAVY=1 (production kernels are validated on "
        "hardware by tools/validate_pallas_tpu.py)",
    ),
    pytest.mark.xfail(
        reason="jax 0.9 pallas interpret mode diverges on the Miller "
        "mega-kernel (Mosaic lowering is the bit-exact one; see "
        "tools/validate_pallas_tpu.py docstring)",
        strict=False,
    ),
]


def _heavy(fn):
    for mark in reversed(_HEAVY):
        fn = mark(fn)
    return fn

from snark_bn254_verifier_tpu.models.jax_backend import (
    pack_fq,
    pack_fr_canonical,
    pack_g1,
    pack_g2,
    unpack_fq,
    unpack_fq12,
)
from snark_bn254_verifier_tpu.oracle import bn254 as bn
from snark_bn254_verifier_tpu.ops import field as F
from snark_bn254_verifier_tpu.ops import field_pallas as FP
from snark_bn254_verifier_tpu.ops import pairing_pallas as PP

pytestmark = pytest.mark.slow  # pays one-time interpret-mode compiles

rng = random.Random(31)


@pytest.fixture(scope="module", autouse=True)
def small_tiles():
    """Shrink the pairing-kernel tile so interpret mode pads batches to 128
    lanes instead of 1024 (8x less CPU work; the kernel body is identical).
    The pallas_call caches key on `rows`, so entries created here are
    consistent with the patched tile within this process."""
    old = PP.TILE_S
    PP.TILE_S = 1
    PP._miller_call.cache_clear()
    PP._product_call.cache_clear()
    PP._fe_easy_expx_call.cache_clear()
    PP._fe_combine_call.cache_clear()
    PP._msm_chunk_call.cache_clear()
    PP._jacobian_combine_call.cache_clear()
    PP._clear_mega_jit_caches()
    yield
    PP.TILE_S = old
    PP._miller_call.cache_clear()
    PP._product_call.cache_clear()
    PP._fe_easy_expx_call.cache_clear()
    PP._fe_combine_call.cache_clear()
    PP._msm_chunk_call.cache_clear()
    PP._jacobian_combine_call.cache_clear()
    PP._clear_mega_jit_caches()


def _stack_pts(cols):
    """List (per point) of pack_g1/pack_g2 tuples -> point-major stack."""
    return tuple(np.stack([c[i] for c in cols], axis=0) for i in range(3))


@pytest.mark.parametrize("spec_name", ["fq", "fr"])
def test_mont_mul_pallas_interpret_matches_oracle(spec_name):
    spec = F.FQ if spec_name == "fq" else F.FR
    mod = spec.modulus
    avals = [0, 1, mod - 1, rng.randrange(mod), rng.randrange(mod)]
    bvals = [mod - 1, 0, mod - 1, rng.randrange(mod), 1]
    a = spec.pack(avals)
    b = spec.pack(bvals)
    out = np.asarray(FP.mont_mul_pallas(spec, a, b, interpret=True))
    exp = spec.pack([x * y % mod for x, y in zip(avals, bvals)])
    assert (out == exp).all()


def _pairs_fixture():
    """2 pairs x 3 lanes; lane 1 has an infinity P in pair 0, lane 2 an
    infinity Q in pair 1 (the zero-encoding the kernels detect in-VMEM)."""
    p_lanes = [
        [bn.g1_mul(bn.G1_GEN, rng.randrange(1, bn.R)) for _ in range(3)]
        for _ in range(2)
    ]
    q_lanes = [
        [bn.g2_mul(bn.G2_GEN, rng.randrange(1, bn.R)) for _ in range(3)]
        for _ in range(2)
    ]
    p_lanes[0][1] = None
    q_lanes[1][2] = None
    pairs_p = _stack_pts([pack_g1(lane) for lane in p_lanes])
    pairs_q = _stack_pts([pack_g2(lane) for lane in q_lanes])
    return p_lanes, q_lanes, pairs_p, pairs_q


@_heavy
def test_miller_product_and_final_exp_interpret_match_oracle():
    p_lanes, q_lanes, pairs_p, pairs_q = _pairs_fixture()
    f = PP.miller_product_mega(pairs_p, pairs_q, interpret=True)
    gt = PP.final_exp_mega(f, interpret=True)
    got = unpack_fq12(np.asarray(gt))
    for lane in range(3):
        pairs = [
            (p_lanes[i][lane], q_lanes[i][lane])
            for i in range(2)
            if p_lanes[i][lane] is not None and q_lanes[i][lane] is not None
        ]
        assert got[lane] == bn.pairing_batch(pairs)


@_heavy
def test_miller_mixed_interpret_matches_oracle():
    """The mixed (shared-chain, SMEM line-table) kernel body in interpret
    mode — the exact kernel both production batch pipelines dispatch.
    Gated like the other pairing interpret tests: the interpret compile
    exceeded 1 h of XLA:CPU on the 2-core build host (measured r05).
    Authoritative coverage is the on-TPU Mosaic preflight
    (bench.py::bench_pallas_validation stages miller_mixed_var /
    miller_mixed_fixed_only, bit-exact vs the oracle on v5e)."""
    from snark_bn254_verifier_tpu.ops import lines as LN

    q_fixed = [bn.g2_mul(bn.G2_GEN, rng.randrange(1, bn.R)) for _ in range(2)]
    tables = tuple(LN.g2_line_table(q) for q in q_fixed)
    fixed_lanes = [
        [bn.g1_mul(bn.G1_GEN, rng.randrange(1, bn.R)) for _ in range(2)]
        for _ in range(2)
    ]
    fixed_lanes[0][1] = None  # infinity lane
    fixed_ps = tuple(pack_g1(lane) for lane in fixed_lanes)
    vp_lanes = [bn.g1_mul(bn.G1_GEN, rng.randrange(1, bn.R)) for _ in range(2)]
    vq_lanes = [bn.g2_mul(bn.G2_GEN, rng.randrange(1, bn.R)) for _ in range(2)]
    for vp, vq, vlanes in (
        (pack_g1(vp_lanes), pack_g2(vq_lanes), (vp_lanes, vq_lanes)),
        (None, None, None),
    ):
        f = PP.miller_mixed_mega(vp, vq, fixed_ps, tables, interpret=True)
        gt = unpack_fq12(np.asarray(PP.final_exp_mega(f, interpret=True)))
        for lane in range(2):
            pairs = [
                (fixed_lanes[j][lane], q_fixed[j])
                for j in range(2)
                if fixed_lanes[j][lane] is not None
            ]
            if vlanes is not None:
                pairs.append((vlanes[0][lane], vlanes[1][lane]))
            assert gt[lane] == bn.pairing_batch(pairs)


@_heavy
def test_final_exp_interpret_isolated():
    """Feed an oracle Miller-loop output through the final-exp kernel alone."""
    p = bn.g1_mul(bn.G1_GEN, 7)
    q = bn.g2_mul(bn.G2_GEN, 11)
    f = bn.miller_loop(p, q)
    comps = []
    for h in range(2):
        for j in range(3):
            comps.append(F.FQ.pack_scalar(f[h][j][0]))
            comps.append(F.FQ.pack_scalar(f[h][j][1]))
    f_packed = np.stack(comps, axis=1)[:, :, None]  # (16, 12, 1)
    out = unpack_fq12(np.asarray(PP.final_exp_mega(f_packed, interpret=True)))[0]
    assert out == bn.final_exponentiation(f)


def test_msm_affine_mega_interpret_matches_oracle():
    n, b = 3, 4
    pt_lanes = [
        [bn.g1_mul(bn.G1_GEN, rng.randrange(1, bn.R)) for _ in range(b)]
        for _ in range(n)
    ]
    sc_lanes = [[rng.randrange(bn.R) for _ in range(b)] for _ in range(n)]
    sc_lanes[0][1] = 0           # zero scalar lane
    pt_lanes[1][2] = None        # infinity input lane
    for i in range(n):           # lane 3: all contributions vanish -> inf
        sc_lanes[i][3] = 0
    points = _stack_pts([pack_g1(lane) for lane in pt_lanes])
    scalars = np.stack([pack_fr_canonical(lane) for lane in sc_lanes], axis=0)
    ox, oy, oinf = PP.msm_affine_mega(points, scalars, interpret=True)
    xs, ys = unpack_fq(np.asarray(ox)), unpack_fq(np.asarray(oy))
    oinf = np.asarray(oinf)
    for lane in range(b):
        pts = [pt_lanes[i][lane] for i in range(n)]
        scs = [sc_lanes[i][lane] for i in range(n)]
        exp = bn.g1_msm(
            [p for p in pts if p is not None],
            [s for p, s in zip(pts, scs) if p is not None],
        )
        if exp is None:
            assert bool(oinf[lane])
        else:
            assert not bool(oinf[lane])
            assert (xs[lane], ys[lane]) == exp
