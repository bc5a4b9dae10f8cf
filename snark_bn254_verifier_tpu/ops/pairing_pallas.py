"""Mega Pallas kernels: the Miller product, final exponentiation, and the
small-n MSM each as ONE kernel launch.

Why: on this TPU attachment every kernel launch carries ~0.4ms fixed
overhead and the XLA pairing executes thousands of scatter-fragmented
kernels inside its loops (profiled: 1.6s for the 3-pair Miller product at
B=1024 where raw VPU throughput predicts ~100ms). Fusing each stage into a
single kernel keeps all state in VMEM and reduces a whole batched Groth16
verification to ~6 launches.

The kernel bodies REUSE the tested ops/{field,tower,pairing,curve}.py code:
under ``field.kernel_mode()`` those modules trace in a Mosaic-lowerable
form — fori_loop CIOS with dynamic limb indexing instead of scatters,
constants built from python scalars instead of captured arrays, loop bits
of fixed integers (6x+2, p-2, final-exp digits) derived per iteration from
scalar words. One math implementation, three execution tiers.

I/O uses the standard jnp layouts with the batch axis split into
(rows, 128); the grid tiles rows by TILE_S.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import curve as C
from . import field as F
from . import pairing as PR
from . import tower as T

L = 16
TILE_S = 8  # sublane rows per block: lanes per block = TILE_S * 128


def _bspec(shape):
    ndim = len(shape)
    return pl.BlockSpec(
        shape,
        lambda i, _nd=ndim: tuple([0] * (_nd - 2)) + (i, 0),
        memory_space=pltpu.VMEM,
    )


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _miller_kernel(px_ref, py_ref, qx_ref, qy_ref, o_ref):
    """One Miller loop; the pair axis rides the GRID (keeps the kernel body
    small enough for the Mosaic compiler)."""
    with F.kernel_mode():
        xp = px_ref[0]                 # (16, S, 128)
        yp = py_ref[0]
        xq = qx_ref[0]                 # (16, 2, S, 128)
        yq = qy_ref[0]
        # infinity masks derived from the all-zero affine encoding
        p_inf = jnp.logical_and(F.is_zero(xp), F.is_zero(yp))
        q_inf = jnp.logical_and(T.fq2_is_zero(xq), T.fq2_is_zero(yq))
        f = PR.miller_loop((xp, yp, p_inf), (xq, yq, q_inf))
        o_ref[0] = f                   # (16, 12, S, 128)


def _fq12_product_kernel(n, f_ref, o_ref):
    with F.kernel_mode():
        acc = f_ref[0]
        for i in range(1, n):
            acc = T.fq12_mul(acc, f_ref[i])
        o_ref[...] = acc


def _final_exp_kernel(f_ref, o_ref):
    with F.kernel_mode():
        o_ref[...] = PR.final_exponentiation(f_ref[...])


def _msm_affine_kernel(n_points, px_ref, py_ref, pinf_ref, sc_ref,
                       ox_ref, oy_ref, oinf_ref):
    """Shared-Straus MSM over n_points per lane + in-kernel affine
    normalization. Scalars canonical Fr limbs (16, S, 128) per point."""
    with F.kernel_mode():
        ops = C.G1_OPS
        pts = [
            (px_ref[j], py_ref[j], pinf_ref[j] != 0) for j in range(n_points)
        ]
        scs = [sc_ref[j] for j in range(n_points)]  # (16, S, 128)
        like = pts[0][0]
        acc0 = (ops.one(like), ops.one(like), ops.zero(like))

        def body(i, acc):
            acc = C.jacobian_double(ops, acc)
            bit_index = np.int32(255) - i
            limb = bit_index // 16
            shift = (bit_index % 16).astype(jnp.uint32)
            for pt, s in zip(pts, scs):
                # no value-level dynamic_slice in Mosaic: select the limb row
                limb_row = s[0]
                for j in range(1, 16):
                    limb_row = jnp.where(limb == j, s[j], limb_row)
                bit = (limb_row >> shift) & np.uint32(1)
                cand = C.jacobian_add_mixed(ops, acc, pt)
                take = bit == 1
                acc = jax.tree_util.tree_map(
                    lambda a_, b_: F.select(take, b_, a_), acc, cand
                )
            return acc

        acc = jax.lax.fori_loop(0, 256, body, acc0)
        ax, ay, ainf = C.to_affine(ops, acc)
        ox_ref[...] = ax
        oy_ref[...] = ay
        oinf_ref[...] = ainf.astype(jnp.uint32)[None]


# ---------------------------------------------------------------------------
# pallas_call wrappers (cached per static shape)
# ---------------------------------------------------------------------------


def _bspec2(shape):
    """Block spec for grid (pair, row-block): leading axis indexed by the
    pair coordinate, row axis by the block coordinate."""
    ndim = len(shape)
    return pl.BlockSpec(
        shape,
        lambda pidx, i, _nd=ndim: (pidx,) + tuple([0] * (_nd - 3)) + (i, 0),
        memory_space=pltpu.VMEM,
    )


@functools.lru_cache(maxsize=None)
def _miller_call(n_pairs: int, rows: int, interpret: bool, vma: tuple = ()):
    return pl.pallas_call(
        _miller_kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_pairs, L, 12, rows, 128), jnp.uint32, vma=frozenset(vma)
        ),
        grid=(n_pairs, rows // TILE_S),
        in_specs=[
            _bspec2((1, L, TILE_S, 128)),
            _bspec2((1, L, TILE_S, 128)),
            _bspec2((1, L, 2, TILE_S, 128)),
            _bspec2((1, L, 2, TILE_S, 128)),
        ],
        out_specs=_bspec2((1, L, 12, TILE_S, 128)),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _product_call(n_pairs: int, rows: int, interpret: bool, vma: tuple = ()):
    kernel = functools.partial(_fq12_product_kernel, n_pairs)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (L, 12, rows, 128), jnp.uint32, vma=frozenset(vma)
        ),
        grid=(rows // TILE_S,),
        in_specs=[_bspec((n_pairs, L, 12, TILE_S, 128))],
        out_specs=_bspec((L, 12, TILE_S, 128)),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _final_exp_call(rows: int, interpret: bool, vma: tuple = ()):
    return pl.pallas_call(
        _final_exp_kernel,
        out_shape=jax.ShapeDtypeStruct(
            (L, 12, rows, 128), jnp.uint32, vma=frozenset(vma)
        ),
        grid=(rows // TILE_S,),
        in_specs=[_bspec((L, 12, TILE_S, 128))],
        out_specs=_bspec((L, 12, TILE_S, 128)),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _msm_call(n_points: int, rows: int, interpret: bool, vma: tuple = ()):
    kernel = functools.partial(_msm_affine_kernel, n_points)
    _vma = frozenset(vma)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((L, rows, 128), jnp.uint32, vma=_vma),
            jax.ShapeDtypeStruct((L, rows, 128), jnp.uint32, vma=_vma),
            jax.ShapeDtypeStruct((1, rows, 128), jnp.uint32, vma=_vma),
        ),
        grid=(rows // TILE_S,),
        in_specs=[
            _bspec((n_points, L, TILE_S, 128)),
            _bspec((n_points, L, TILE_S, 128)),
            _bspec((n_points, TILE_S, 128)),
            _bspec((n_points, L, TILE_S, 128)),
        ],
        out_specs=(
            _bspec((L, TILE_S, 128)),
            _bspec((L, TILE_S, 128)),
            _bspec((1, TILE_S, 128)),
        ),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Host-facing wrappers: jnp layout (..., B) <-> (..., rows, 128)
# ---------------------------------------------------------------------------


def _rows_for(batch: int) -> int:
    lanes = TILE_S * 128
    return ((batch + lanes - 1) // lanes) * lanes // 128


def _to_rows(a, batch, rows):
    pad = rows * 128 - batch
    if pad:
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
    return a.reshape(a.shape[:-1] + (rows, 128))


def _from_rows(a, batch):
    flat = a.reshape(a.shape[:-2] + (a.shape[-2] * 128,))
    return flat[..., :batch]


def _miller_product_mega_impl(pairs_p, pairs_q, interpret):
    from .field_pallas import out_vma

    px, py, _ = pairs_p
    qx, qy, _ = pairs_q
    n, _, batch = px.shape
    rows = _rows_for(batch)
    vma = out_vma(px, py, qx, qy)
    fs = _miller_call(n, rows, interpret, vma)(
        _to_rows(px, batch, rows),
        _to_rows(py, batch, rows),
        _to_rows(qx, batch, rows),
        _to_rows(qy, batch, rows),
    )
    if n == 1:
        return _from_rows(fs[0], batch)
    out = _product_call(n, rows, interpret, vma)(fs)
    return _from_rows(out, batch)


def _final_exp_mega_impl(f, interpret):
    from .field_pallas import out_vma

    batch = f.shape[-1]
    rows = _rows_for(batch)
    return _from_rows(
        _final_exp_call(rows, interpret, out_vma(f))(_to_rows(f, batch, rows)),
        batch,
    )


def _msm_affine_mega_impl(points, scalars, interpret):
    from .field_pallas import out_vma

    px, py, pinf = points
    n, _, batch = px.shape
    rows = _rows_for(batch)
    ox, oy, oinf = _msm_call(n, rows, interpret, out_vma(px, py, pinf, scalars))(
        _to_rows(px, batch, rows),
        _to_rows(py, batch, rows),
        _to_rows(pinf.astype(jnp.uint32), batch, rows),
        _to_rows(scalars, batch, rows),
    )
    return (
        _from_rows(ox, batch),
        _from_rows(oy, batch),
        _from_rows(oinf, batch)[0].astype(bool),
    )


# ---------------------------------------------------------------------------
# Public entry points: the impls wrapped in jax.jit. Raw pallas_call
# dispatch is NOT covered by JAX's persistent compilation cache, so every
# fresh process used to pay the full Mosaic compile (minutes) before the
# first proof; under jit the whole launch (reshape + pallas_call) is one
# cacheable executable. Nested use inside an outer jit simply inlines.
# ---------------------------------------------------------------------------

_miller_product_mega_jit = jax.jit(
    _miller_product_mega_impl, static_argnames=("interpret",)
)
_final_exp_mega_jit = jax.jit(_final_exp_mega_impl, static_argnames=("interpret",))
_msm_affine_mega_jit = jax.jit(_msm_affine_mega_impl, static_argnames=("interpret",))


def _clear_mega_jit_caches():
    """For tests that patch TILE_S: drop traces built with the old tile."""
    for fn in (_miller_product_mega_jit, _final_exp_mega_jit, _msm_affine_mega_jit):
        fn.clear_cache()


def miller_product_mega(pairs_p, pairs_q, interpret=None):
    """pairs_p: (x:(n,16,B), y, inf); pairs_q: Fq2 arrays (n,16,2,B).
    Infinity handling happens in-kernel from the zero encoding. Returns
    (16, 12, B)."""
    if interpret is None:
        interpret = F.pallas_interpret()
    return _miller_product_mega_jit(pairs_p, pairs_q, interpret=interpret)


def final_exp_mega(f, interpret=None):
    """f: (16, 12, B) -> (16, 12, B)."""
    if interpret is None:
        interpret = F.pallas_interpret()
    return _final_exp_mega_jit(f, interpret=interpret)


def msm_affine_mega(points, scalars, interpret=None):
    """points: (x:(n,16,B), y:(n,16,B), inf:(n,B)); scalars (n,16,B)
    canonical. Returns affine (x:(16,B), y:(16,B), inf:(B,) bool)."""
    if interpret is None:
        interpret = F.pallas_interpret()
    return _msm_affine_mega_jit(points, scalars, interpret=interpret)
