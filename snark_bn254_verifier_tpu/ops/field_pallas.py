"""Pallas TPU kernel for the batched Montgomery multiply.

Why: the jnp formulation of CIOS (ops/field.py) materializes its 33-column
accumulator through ~64 scatter-adds per multiply — XLA cannot keep that in
registers, so every wide multiply costs ~60x its input size in HBM traffic,
and profiling shows the whole verifier pipeline is bound by exactly that.
This kernel runs the identical algorithm with the accumulator resident in
VMEM/registers: traffic drops to inputs + outputs.

The kernel processes blocks of (16 limbs x TILE lanes); callers flatten all
batch/component axes into one lane axis. Semantics are bit-identical to
ops/field.py::mont_mul (tested against it and the oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import LIMB_BITS, LIMB_MASK, NUM_LIMBS

L = NUM_LIMBS
_MASK = np.uint32(LIMB_MASK)
_SH = np.uint32(LIMB_BITS)

# Each kernel instance processes (16 limbs, TILE_S sublanes, 128 lanes):
# per-limb ops are full (TILE_S, 128) VPU tiles, not 1D rows.
TILE_S = 32
TILE = TILE_S * 128


def _mont_kernel(mod_limbs, n0inv, a_ref, b_ref, o_ref):
    """One block: a_ref/b_ref (16, TILE_S, 128) -> o_ref same."""
    a = [a_ref[i] for i in range(L)]
    b = [b_ref[i] for i in range(L)]
    t = [jnp.zeros_like(a[0])] * (L + 2)
    for i in range(L):
        ai = a[i]
        c = None
        for j in range(L):
            s = t[j] + ai * b[j] + (c if c is not None else np.uint32(0))
            t[j] = s & _MASK
            c = s >> _SH
        s = t[L] + c
        t[L] = s & _MASK
        t[L + 1] = s >> _SH
        m = (t[0] * n0inv) & _MASK
        s = t[0] + m * mod_limbs[0]
        c = s >> _SH
        for j in range(1, L):
            s = t[j] + m * mod_limbs[j] + c
            t[j - 1] = s & _MASK
            c = s >> _SH
        s = t[L] + c
        t[L - 1] = s & _MASK
        t[L] = t[L + 1] + (s >> _SH)
    # conditional subtract: t - mod if t >= mod (incl. overflow word t[L])
    d = []
    borrow = np.uint32(0)
    for j in range(L):
        s = t[j] - mod_limbs[j] - borrow
        d.append(s & _MASK)
        borrow = s >> np.uint32(31)
    do_sub = jnp.logical_or(t[L].astype(jnp.bool_), borrow == 0)
    for j in range(L):
        o_ref[j] = jnp.where(do_sub, d[j], t[j])


def out_vma(*arrays) -> tuple:
    """Union of the inputs' varying-mesh-axes, as a sorted tuple.

    Under ``shard_map(..., check_vma=True)`` every traced value carries the
    set of mesh axes it varies over; ``pallas_call`` out_shapes must state
    theirs explicitly (a plain ShapeDtypeStruct has vma=None and the trace
    fails — the round-3 TPU bench crash). A Pallas kernel is elementwise in
    the mesh (no collectives inside), so the outputs vary over exactly the
    union of the inputs' axes. Outside shard_map every vma is empty and
    this is a no-op."""
    axes = set()
    for a in arrays:
        axes |= getattr(jax.typeof(a), "vma", frozenset())
    return tuple(sorted(axes))


@functools.lru_cache(maxsize=None)
def _mont_call(modulus_key: str, n_rows: int, interpret: bool, vma: tuple = ()):
    from . import field as F

    spec = F.FQ if modulus_key == "fq" else F.FR
    mod_limbs = tuple(spec.mod_limbs)
    n0inv = spec.n0inv
    kernel = functools.partial(_mont_kernel, mod_limbs, n0inv)
    grid = n_rows // TILE_S
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (L, n_rows, 128), jnp.uint32, vma=frozenset(vma)
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((L, TILE_S, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, TILE_S, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (L, TILE_S, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )


def mont_mul_pallas(spec, a, b, interpret: bool = False):
    """Drop-in replacement for ops/field.py::mont_mul on TPU.

    a, b: (16, *batch) uint32 (broadcast over batch like the jnp version).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    batch_shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (L,) + batch_shape)
    b = jnp.broadcast_to(b, (L,) + batch_shape)
    n = 1
    for d in batch_shape:
        n *= d
    af = a.reshape(L, n)
    bf = b.reshape(L, n)
    pad = (-n) % TILE
    if pad:
        af = jnp.pad(af, ((0, 0), (0, pad)))
        bf = jnp.pad(bf, ((0, 0), (0, pad)))
    rows = (n + pad) // 128
    out = _mont_call(spec.name, rows, interpret, out_vma(af, bf))(
        af.reshape(L, rows, 128), bf.reshape(L, rows, 128)
    )
    out = out.reshape(L, n + pad)
    if pad:
        out = out[:, :n]
    return out.reshape((L,) + batch_shape)
