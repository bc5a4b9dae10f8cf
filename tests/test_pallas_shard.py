"""CPU-reproducible regression tests for the Pallas x shard_map combination.

Round 3 shipped a TPU-only crash: every real-TPU multi-chip run dispatches
``mont_mul`` to the Pallas kernel (ops/field.py::use_pallas), and
``pallas_call`` out_shapes without an explicit ``vma`` fail shard_map's
check_vma at TRACE time (jax 0.9). The CPU suite never saw it because
use_pallas() is False on CPU. These tests force the Pallas dispatch on
(TPU_BN254_PALLAS semantics, patched directly so ordering vs other tests
doesn't matter) and cover the combination in two tiers:

  * TRACE tier — ``jax.jit(prog).trace(...)`` of the exact sharded-MSM
    shard_map program and of the batched mega-kernels. Tracing is where
    the round-3 bug fired; it needs no TPU and no interpret execution.
  * EXECUTION tier — a sharded Montgomery multiply run end-to-end in
    interpret mode on the CPU mesh against the oracle (small enough to
    execute in seconds; full-MSM interpret execution takes >10 min and is
    covered on hardware by the bench preflight instead).

Reference point: the parallel layer has no reference counterpart
(SURVEY.md §2 — the reference is single-threaded Rust); the contract being
protected is BASELINE.json's multi-chip configs.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from snark_bn254_verifier_tpu.models.jax_backend import pack_fq, unpack_fq
from snark_bn254_verifier_tpu.oracle import bn254 as bn
from snark_bn254_verifier_tpu.ops import field as F
from snark_bn254_verifier_tpu.ops import field_pallas as FP
from snark_bn254_verifier_tpu.ops import pairing_pallas as PP
from snark_bn254_verifier_tpu.parallel.sharded import (
    make_mesh,
    sharded_msm_program,
)

pytestmark = pytest.mark.smoke


@pytest.fixture
def force_pallas(monkeypatch):
    """Turn the Pallas dispatch on (what a real TPU backend does) without
    touching the cached env detection of other tests."""
    monkeypatch.setattr(F, "_use_pallas_cached", True)
    monkeypatch.setattr(F, "_pallas_interpret_cached", False)
    yield


@pytest.fixture
def force_pallas_interpret(monkeypatch):
    monkeypatch.setattr(F, "_use_pallas_cached", True)
    monkeypatch.setattr(F, "_pallas_interpret_cached", True)
    yield


def _msm_inputs(n: int, b: int = 1):
    pts = [bn.g1_mul(bn.G1_GEN, i + 1) for i in range(n)]
    x = np.stack([F.FQ.pack_scalar(p[0]) for p in pts])
    y = np.stack([F.FQ.pack_scalar(p[1]) for p in pts])
    x = np.broadcast_to(x[..., None], (n, 16, b))
    y = np.broadcast_to(y[..., None], (n, 16, b))
    inf = np.zeros((n, b), bool)
    sc = np.stack([F.FR.pack_scalar(3 * i + 7, mont=False) for i in range(n)])
    sc = np.broadcast_to(sc[..., None], (n, 16, b))
    return (x, y, inf), sc


def test_sharded_msm_traces_with_pallas_straus(force_pallas):
    """The r03 crash class, Straus local kernel: tracing the shard_map
    program with Pallas dispatch on must succeed (vma threading,
    ops/field_pallas.py::out_vma)."""
    mesh = make_mesh(2, model_parallelism=2)
    points, sc = _msm_inputs(8)
    traced = jax.jit(sharded_msm_program(mesh, c=8)).trace(points, sc)
    assert [tuple(o.shape) for o in traced.out_info] == [(16, 1)] * 3


def test_sharded_msm_traces_with_pallas_pippenger(force_pallas):
    """Same, with the local shard large enough to take the Pippenger path
    (the BASELINE 2^16 config's local kernel, the one that crashed r03)."""
    from snark_bn254_verifier_tpu.ops import msm as M

    mesh = make_mesh(2, model_parallelism=2)
    points, sc = _msm_inputs(2 * M.PIPPENGER_THRESHOLD)
    traced = jax.jit(sharded_msm_program(mesh, c=8)).trace(points, sc)
    assert [tuple(o.shape) for o in traced.out_info] == [(16, 1)] * 3


@pytest.mark.slow  # tracing the mega-kernel bodies takes minutes on 2 cores
def test_mega_kernels_trace_with_pallas(force_pallas):
    """Batched pipeline stages (Miller product, final exp, mega MSM) must
    trace with the Pallas dispatch on — jit-level, as the batch verifiers
    run them."""
    from snark_bn254_verifier_tpu.models.jax_backend import pack_g1, pack_g2

    b = 4
    p = pack_g1([bn.g1_mul(bn.G1_GEN, i + 2) for i in range(b)])
    q = pack_g2([bn.g2_mul(bn.G2_GEN, i + 3) for i in range(b)])
    pairs_p = tuple(np.stack([c, c]) for c in p)
    pairs_q = tuple(np.stack([c, c]) for c in q)
    f = jax.jit(PP.miller_product_mega, static_argnames=("interpret",)).trace(
        pairs_p, pairs_q, interpret=False
    )
    assert tuple(f.out_info.shape) == (16, 12, b)
    points, sc = _msm_inputs(3, b)
    out = jax.jit(PP.msm_affine_mega, static_argnames=("interpret",)).trace(
        points, sc, interpret=False
    )
    assert tuple(out.out_info[0].shape) == (16, b)


def test_mont_mul_pallas_shard_map_interpret_executes(force_pallas_interpret):
    """Execution tier: a sharded Montgomery multiply through the REAL
    dispatch (mont_mul -> mont_mul_pallas) under shard_map, interpret mode,
    vs the oracle. Covers the vma threading end-to-end on the CPU mesh."""
    from functools import partial

    import random

    from jax import shard_map

    mesh = make_mesh(2, model_parallelism=2)
    rng = random.Random(5)
    vals_a = [rng.randrange(1, bn.P) for _ in range(8)]
    vals_b = [rng.randrange(1, bn.P) for _ in range(8)]
    a = np.stack([F.FQ.pack_scalar(v) for v in vals_a], axis=-1)  # (16, 8)
    b = np.stack([F.FQ.pack_scalar(v) for v in vals_b], axis=-1)

    # check_vma=False: the pallas INTERPRETER's internal block slicing mixes
    # varying data with non-varying index constants, which the vma checker
    # rejects inside JAX itself (the error says to use check_vma=False).
    # Production interpret runs disable it the same way
    # (parallel/sharded.py::sharded_msm_program); the TRACE-tier tests above
    # keep check_vma=True — the r03 regression class.
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, "model"), P(None, "model")),
        out_specs=P(None, "model"),
        check_vma=False,
    )
    def run(xa, xb):
        return F.mont_mul(F.FQ, xa, xb)

    out = np.asarray(jax.jit(run)(a, b))
    got = unpack_fq(out)
    exp = [x * y % bn.P for x, y in zip(vals_a, vals_b)]
    assert got == exp


# NOTE: a full sharded_msm EXECUTION in interpret mode (even 2 points) is
# deliberately absent: the 256-iteration Straus scan of interpret-mode
# pallas_calls takes >10 min of XLA CPU compile on a small host (measured).
# The execution tier above (sharded mont_mul) plus the trace tier covers
# the regression class; full MSM execution is validated on hardware by the
# bench pallas_validation preflight and the msm config itself.
