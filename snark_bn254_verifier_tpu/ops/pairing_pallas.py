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
from . import lines as LN_mod
from . import pairing as PR
from . import tower as T

L = 16
TILE_S = 8  # sublane rows per block: lanes per block = TILE_S * 128

# Every public Pallas kernel entry point a production pipeline may
# dispatch. bench.py's preflight asserts its validation stages cover this
# set exactly, so a NEW kernel cannot ship unvalidated (the r04 regression:
# miller_mixed_mega — the only kernel the batch verifiers call — shipped
# with a passing preflight that never compiled it).
KERNEL_ENTRY_POINTS = (
    "miller_product_mega",
    "miller_mixed_mega",
    "final_exp_mega",
    "msm_affine_mega",
)


def _vmem_params(interpret: bool):
    """Raised scoped-VMEM limit for the mega kernels. Mosaic's scoped
    allocation is NOT deterministic run-to-run (measured r05: fe_easy_expx
    16.61 MB on one compile vs under 16 on two earlier ones; fe_combine
    29.3 MB vs under 28 previously), so kernels sitting near the 16 MB
    default limit fail intermittently. v5e has 128 MB VMEM/core and the
    block working set is ~4 MB, so a uniform 64 MB scoped limit leaves
    2x headroom over the worst allocation ever observed while keeping an
    aggregate cap well under the physical budget."""
    if interpret:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=64 * 1024 * 1024
    )}


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


def _miller_mixed_kernel(nf, has_var, *refs):
    """Shared-chain mixed Miller product (ops/pairing.py
    ::miller_product_mixed) as ONE launch: the optional variable pair plus
    nf fixed-Q pairs whose precomputed line tables (ops/lines.py) ride in
    as tiny batch-independent VMEM inputs. Replaces the per-pair
    _miller_kernel grid + _fq12_product_kernel combine for the protocol
    pipelines: one f-squaring chain for the whole product and zero G2
    step arithmetic for the fixed pairs."""
    if has_var:
        (px_ref, py_ref, qx_ref, qy_ref, fpx_ref, fpy_ref,
         lines_ref, tails_ref, o_ref) = refs
    else:
        fpx_ref, fpy_ref, lines_ref, tails_ref, o_ref = refs
    with F.kernel_mode():
        if has_var:
            xp, yp = px_ref[...], py_ref[...]
            xq, yq = qx_ref[...], qy_ref[...]
            p_inf = jnp.logical_and(F.is_zero(xp), F.is_zero(yp))
            q_inf = jnp.logical_and(T.fq2_is_zero(xq), T.fq2_is_zero(yq))
            var_p, var_q = (xp, yp, p_inf), (xq, yq, q_inf)
        else:
            var_p = var_q = None
        fixed_ps = []
        for j in range(nf):
            fx, fy = fpx_ref[j], fpy_ref[j]
            fixed_ps.append(
                (fx, fy, jnp.logical_and(F.is_zero(fx), F.is_zero(fy)))
            )
        batch = fpx_ref.shape[2:]

        # The line coefficients are lane-invariant per-iteration SCALARS, so
        # they ride in SMEM (flat (rows,128) uint32) and are broadcast to
        # (16, 2, *batch) vector planes in-kernel — the standard TPU
        # scalar-parameter pattern. Loading them as (16, 2) VMEM tiles
        # cannot work: the value-level dynamic index is un-lowerable
        # (r04 crash) and the (16,2)->(16,2,1,1) batch reshape is a
        # tiled->untiled relayout Mosaic also refuses (both reproduced on
        # v5e this round).
        def _load_fq2_smem(ref, base):
            planes = [
                jnp.full(batch, ref[(base + o) // 128, (base + o) % 128],
                         jnp.uint32)
                for o in range(32)
            ]
            return jnp.stack(planes, 0).reshape((L, 2) + batch)

        steps = LN_mod.STEPS

        def row_fn(i):
            rows = []
            for j in range(nf):
                rows.append(tuple(
                    _load_fq2_smem(
                        lines_ref, ((j * 4 + d) * steps + i) * np.int32(32)
                    )
                    for d in range(4)
                ))
            return rows

        def tail_fn(j, k):
            # layout per table j: (coeff c1/c3, tail step, limb, comp)
            return (
                _load_fq2_smem(tails_ref, j * 128 + k * 32),
                _load_fq2_smem(tails_ref, j * 128 + 64 + k * 32),
            )

        o_ref[...] = PR.miller_product_mixed(
            var_p, var_q, tuple(fixed_ps), None,
            row_fn=row_fn, tail_fn=tail_fn,
        )


def _fq12_product_kernel(n, f_ref, o_ref):
    with F.kernel_mode():
        acc = f_ref[0]
        for i in range(1, n):
            acc = T.fq12_mul(acc, f_ref[i])
        o_ref[...] = acc


def _fe_easy_expx_kernel(f_ref, m_ref, a_ref, b_ref, c_ref):
    """Final exp part 1: easy part + the three exponentiations by x.
    Split in two launches because the fused kernel's peak VMEM liveness
    measured 20.1 MB against the v5e ~16 MB scoped budget."""
    with F.kernel_mode():
        m, a, b, c = PR._fe_easy_and_expx(f_ref[...])
        m_ref[...] = m
        a_ref[...] = a
        b_ref[...] = b
        c_ref[...] = c


def _fe_combine_kernel(m_ref, a_ref, b_ref, c_ref, o_ref):
    """Final exp part 2: the digit combine (sequential low-liveness form)."""
    with F.kernel_mode():
        o_ref[...] = PR._fe_combine(
            m_ref[...], a_ref[...], b_ref[...], c_ref[...]
        )


MSM_WINDOW_W = 4       # digit width; must divide 16 (limb bits)
MSM_CHUNK_POINTS = 3   # points per kernel launch — VMEM budget: the 2^w
                       # per-point Jacobian tables are ~3 MB/point at
                       # TILE_S=8 (16 entries x 3 coords x 16 limb planes
                       # x 4 KB), and v5e VMEM is ~16 MB/core


def _msm_windowed_kernel(n_points, w, px_ref, py_ref, pinf_ref, sc_ref,
                         jx_ref, jy_ref, jz_ref):
    """Windowed shared-doubling MSM over one chunk of points: per-point
    2^w-entry Jacobian tables (built once, resident in VMEM), then a
    fori_loop over the 256/w windows — w doublings shared by all points +
    one FULL Jacobian add per point per window (a select tree picks the
    table entry; the zero digit hits the infinity entry, which
    jacobian_add absorbs branch-free). ~2.3x fewer Montgomery multiplies
    than the previous bit-serial kernel (conditional add per point per
    BIT). Emits the chunk's JACOBIAN partial; combination across chunks
    and the single affine normalization happen in
    _jacobian_combine_kernel, so the 254-bit Fermat inversion is paid once
    per MSM, not once per chunk."""
    with F.kernel_mode():
        ops = C.G1_OPS
        nent = 1 << w
        tables = []
        for j in range(n_points):
            aff = (px_ref[j], py_ref[j], pinf_ref[j] != 0)
            base = C.to_jacobian(ops, aff)
            like = base[0]
            zero = (ops.one(like), ops.one(like), ops.zero(like))
            tbl = [zero, base]
            for d in range(2, nent):
                tbl.append(
                    C.jacobian_double(ops, tbl[d // 2])
                    if d % 2 == 0
                    else C.jacobian_add_mixed(ops, tbl[d - 1], aff)
                )
            tables.append(tbl)
        scs = [sc_ref[j] for j in range(n_points)]
        like = tables[0][1][0]
        acc0 = (ops.one(like), ops.one(like), ops.zero(like))
        nwin = 256 // w

        def body(i, acc):
            bitpos = (np.int32(nwin - 1) - i) * np.int32(w)
            limb = bitpos // 16
            shift = (bitpos % 16).astype(jnp.uint32)
            for _ in range(w):
                acc = C.jacobian_double(ops, acc)
            for j in range(n_points):
                s = scs[j]
                # no value-level dynamic_slice in Mosaic: select the limb row
                limb_row = s[0]
                for t in range(1, 16):
                    limb_row = jnp.where(limb == t, s[t], limb_row)
                dig = (limb_row >> shift) & np.uint32(nent - 1)
                ent = tables[j][0]
                for d in range(1, nent):
                    take = dig == np.uint32(d)
                    ent = jax.tree_util.tree_map(
                        lambda a_, b_, _t=take: F.select(_t, b_, a_),
                        ent,
                        tables[j][d],
                    )
                acc = C.jacobian_add(ops, acc, ent)
            return acc

        acc = jax.lax.fori_loop(0, nwin, body, acc0)
        jx_ref[...] = acc[0]
        jy_ref[...] = acc[1]
        jz_ref[...] = acc[2]


def _jacobian_combine_kernel(n_chunks, jx_ref, jy_ref, jz_ref,
                             ox_ref, oy_ref, oinf_ref):
    """Add n_chunks Jacobian partials (leading chunk axis) and normalize to
    affine — ONE in-kernel Fermat inversion for the whole MSM."""
    with F.kernel_mode():
        ops = C.G1_OPS
        acc = (jx_ref[0], jy_ref[0], jz_ref[0])
        for i in range(1, n_chunks):
            acc = C.jacobian_add(ops, acc, (jx_ref[i], jy_ref[i], jz_ref[i]))
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
def _miller_call(n_pairs: int, rows: int, interpret: bool, vma: tuple = (),
                 tile: int = TILE_S):
    return pl.pallas_call(
        _miller_kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_pairs, L, 12, rows, 128), jnp.uint32, vma=frozenset(vma)
        ),
        grid=(n_pairs, rows // tile),
        in_specs=[
            _bspec2((1, L, tile, 128)),
            _bspec2((1, L, tile, 128)),
            _bspec2((1, L, 2, tile, 128)),
            _bspec2((1, L, 2, tile, 128)),
        ],
        out_specs=_bspec2((1, L, 12, tile, 128)),
        interpret=interpret,
        **_vmem_params(interpret),
    )


def _bspec_smem(shape):
    """Full-block SMEM spec independent of the grid coordinate — for the
    tiny batch-independent line tables (lane-invariant scalars, loaded and
    broadcast on the scalar core)."""
    ndim = len(shape)
    return pl.BlockSpec(
        shape, lambda i, _nd=ndim: (0,) * _nd, memory_space=pltpu.SMEM
    )


@functools.lru_cache(maxsize=None)
def _miller_mixed_call(nf: int, has_var: bool, rows: int, interpret: bool,
                       vma: tuple = (), tile: int = TILE_S):
    kernel = functools.partial(_miller_mixed_kernel, nf, has_var)
    steps = LN_mod.STEPS
    var_specs = [
        _bspec((L, tile, 128)),
        _bspec((L, tile, 128)),
        _bspec((L, 2, tile, 128)),
        _bspec((L, 2, tile, 128)),
    ] if has_var else []
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (L, 12, rows, 128), jnp.uint32, vma=frozenset(vma)
        ),
        grid=(rows // tile,),
        in_specs=var_specs + [
            _bspec((nf, L, tile, 128)),      # fixed P x
            _bspec((nf, L, tile, 128)),      # fixed P y
            _bspec_smem((nf * 4 * steps * 32 // 128, 128)),  # line scalars
            _bspec_smem((nf, 128)),                          # tail scalars
        ],
        out_specs=_bspec((L, 12, tile, 128)),
        interpret=interpret,
        **_vmem_params(interpret),
    )


@functools.lru_cache(maxsize=None)
def _product_call(n_pairs: int, rows: int, interpret: bool, vma: tuple = (),
                  tile: int = TILE_S):
    kernel = functools.partial(_fq12_product_kernel, n_pairs)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (L, 12, rows, 128), jnp.uint32, vma=frozenset(vma)
        ),
        grid=(rows // tile,),
        in_specs=[_bspec((n_pairs, L, 12, tile, 128))],
        out_specs=_bspec((L, 12, tile, 128)),
        interpret=interpret,
        **_vmem_params(interpret),
    )


@functools.lru_cache(maxsize=None)
def _fe_easy_expx_call(rows: int, interpret: bool, vma: tuple = (),
                       tile: int = TILE_S):
    fq12_shape = jax.ShapeDtypeStruct(
        (L, 12, rows, 128), jnp.uint32, vma=frozenset(vma)
    )
    return pl.pallas_call(
        _fe_easy_expx_kernel,
        out_shape=(fq12_shape,) * 4,
        grid=(rows // tile,),
        in_specs=[_bspec((L, 12, tile, 128))],
        out_specs=(_bspec((L, 12, tile, 128)),) * 4,
        interpret=interpret,
        **_vmem_params(interpret),
    )


@functools.lru_cache(maxsize=None)
def _fe_combine_call(rows: int, interpret: bool, vma: tuple = (),
                     tile: int = TILE_S):
    return pl.pallas_call(
        _fe_combine_kernel,
        out_shape=jax.ShapeDtypeStruct(
            (L, 12, rows, 128), jnp.uint32, vma=frozenset(vma)
        ),
        grid=(rows // tile,),
        in_specs=[_bspec((L, 12, tile, 128))] * 4,
        out_specs=_bspec((L, 12, tile, 128)),
        interpret=interpret,
        **_vmem_params(interpret),
    )


@functools.lru_cache(maxsize=None)
def _msm_chunk_call(n_points: int, w: int, rows: int, interpret: bool,
                    vma: tuple = (), tile: int = TILE_S):
    kernel = functools.partial(_msm_windowed_kernel, n_points, w)
    _vma = frozenset(vma)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((L, rows, 128), jnp.uint32, vma=_vma),
            jax.ShapeDtypeStruct((L, rows, 128), jnp.uint32, vma=_vma),
            jax.ShapeDtypeStruct((L, rows, 128), jnp.uint32, vma=_vma),
        ),
        grid=(rows // tile,),
        in_specs=[
            _bspec((n_points, L, tile, 128)),
            _bspec((n_points, L, tile, 128)),
            _bspec((n_points, tile, 128)),
            _bspec((n_points, L, tile, 128)),
        ],
        out_specs=(
            _bspec((L, tile, 128)),
            _bspec((L, tile, 128)),
            _bspec((L, tile, 128)),
        ),
        interpret=interpret,
        **_vmem_params(interpret),
    )


@functools.lru_cache(maxsize=None)
def _jacobian_combine_call(n_chunks: int, rows: int, interpret: bool,
                           vma: tuple = (), tile: int = TILE_S):
    kernel = functools.partial(_jacobian_combine_kernel, n_chunks)
    _vma = frozenset(vma)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((L, rows, 128), jnp.uint32, vma=_vma),
            jax.ShapeDtypeStruct((L, rows, 128), jnp.uint32, vma=_vma),
            jax.ShapeDtypeStruct((1, rows, 128), jnp.uint32, vma=_vma),
        ),
        grid=(rows // tile,),
        in_specs=[
            _bspec((n_chunks, L, tile, 128)),
            _bspec((n_chunks, L, tile, 128)),
            _bspec((n_chunks, L, tile, 128)),
        ],
        out_specs=(
            _bspec((L, tile, 128)),
            _bspec((L, tile, 128)),
            _bspec((1, tile, 128)),
        ),
        interpret=interpret,
        **_vmem_params(interpret),
    )


# ---------------------------------------------------------------------------
# Host-facing wrappers: jnp layout (..., B) <-> (..., rows, 128)
# ---------------------------------------------------------------------------


CANONICAL_BATCH = TILE_S * 128 * 8  # 1024 lanes: one shared Mosaic compile


def _tile_for(batch: int) -> int:
    """Block tile (sublane rows): full TILE_S for compiled (Mosaic)
    batches — which are always padded to CANONICAL_BATCH — and a single
    128-lane row for the small batches interpret-mode tests run."""
    return TILE_S if batch > 128 else 1


def _rows_for(batch: int, tile: int) -> int:
    lanes = tile * 128
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
    tile = _tile_for(batch)
    rows = _rows_for(batch, tile)
    vma = out_vma(px, py, qx, qy)
    fs = _miller_call(n, rows, interpret, vma, tile)(
        _to_rows(px, batch, rows),
        _to_rows(py, batch, rows),
        _to_rows(qx, batch, rows),
        _to_rows(qy, batch, rows),
    )
    if n == 1:
        return _from_rows(fs[0], batch)
    out = _product_call(n, rows, interpret, vma, tile)(fs)
    return _from_rows(out, batch)


def _miller_mixed_mega_impl(var_pxy, var_qxy, fixed, lines_arr, tails_arr,
                            interpret):
    """var_pxy/var_qxy: ((x, y, inf)) tuples or None; fixed: nf-stacked
    (x:(nf,L,B), y:(nf,L,B), inf:(nf,B)). Infinity lanes are zeroed so the
    kernel's all-zero convention applies."""
    from .field_pallas import out_vma

    fpx, fpy, finf = fixed
    zmask = finf[:, None, :]
    fpx = jnp.where(zmask, 0, fpx)
    fpy = jnp.where(zmask, 0, fpy)
    batch = fpx.shape[-1]
    tile = _tile_for(batch)
    rows = _rows_for(batch, tile)
    nf = fpx.shape[0]
    has_var = var_pxy is not None
    args = []
    if has_var:
        vpx, vpy, vpinf = var_pxy
        vqx, vqy, vqinf = var_qxy
        skip = jnp.logical_or(vpinf, vqinf)
        vpx = jnp.where(skip[None], 0, vpx)
        vpy = jnp.where(skip[None], 0, vpy)
        vqx = jnp.where(skip[None, None], 0, vqx)
        vqy = jnp.where(skip[None, None], 0, vqy)
        vma = out_vma(vpx, vpy, vqx, vqy, fpx, fpy)
        args += [
            _to_rows(vpx, batch, rows),
            _to_rows(vpy, batch, rows),
            _to_rows(vqx, batch, rows),
            _to_rows(vqy, batch, rows),
        ]
    else:
        vma = out_vma(fpx, fpy)
    args += [
        _to_rows(fpx, batch, rows),
        _to_rows(fpy, batch, rows),
        jnp.asarray(lines_arr).reshape(-1, 128),  # SMEM flat scalar layout
        jnp.asarray(tails_arr).reshape(-1, 128),
    ]
    out = _miller_mixed_call(nf, has_var, rows, interpret, vma, tile)(*args)
    return _from_rows(out, batch)


def _final_exp_mega_impl(f, interpret):
    from .field_pallas import out_vma

    batch = f.shape[-1]
    tile = _tile_for(batch)
    rows = _rows_for(batch, tile)
    vma = out_vma(f)
    m, a, b, c = _fe_easy_expx_call(rows, interpret, vma, tile)(
        _to_rows(f, batch, rows)
    )
    return _from_rows(
        _fe_combine_call(rows, interpret, vma, tile)(m, a, b, c), batch
    )


def _msm_affine_mega_impl(points, scalars, interpret):
    from .field_pallas import out_vma

    px, py, pinf = points
    n, _, batch = px.shape
    tile = _tile_for(batch)
    rows = _rows_for(batch, tile)
    vma = out_vma(px, py, pinf, scalars)
    pxr = _to_rows(px, batch, rows)
    pyr = _to_rows(py, batch, rows)
    pinfr = _to_rows(pinf.astype(jnp.uint32), batch, rows)
    scr = _to_rows(scalars, batch, rows)
    partials = []
    for lo in range(0, n, MSM_CHUNK_POINTS):
        hi = min(lo + MSM_CHUNK_POINTS, n)
        jx, jy, jz = _msm_chunk_call(
            hi - lo, MSM_WINDOW_W, rows, interpret, vma, tile
        )(pxr[lo:hi], pyr[lo:hi], pinfr[lo:hi], scr[lo:hi])
        partials.append((jx, jy, jz))
    jxs = jnp.stack([p[0] for p in partials], 0)
    jys = jnp.stack([p[1] for p in partials], 0)
    jzs = jnp.stack([p[2] for p in partials], 0)
    ox, oy, oinf = _jacobian_combine_call(
        len(partials), rows, interpret, vma, tile
    )(jxs, jys, jzs)
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
_miller_mixed_mega_jit = jax.jit(
    _miller_mixed_mega_impl, static_argnames=("interpret",)
)
_msm_affine_mega_jit = jax.jit(_msm_affine_mega_impl, static_argnames=("interpret",))


def _clear_mega_jit_caches():
    """For tests that patch TILE_S: drop traces built with the old tile."""
    for fn in (_miller_product_mega_jit, _final_exp_mega_jit,
               _msm_affine_mega_jit, _miller_mixed_mega_jit):
        fn.clear_cache()


def _pad_batch(tree, batch: int, interpret: bool = False):
    """Zero-pad every leaf's trailing batch axis BEFORE the jitted impl so
    batch sizes collapse onto shared compiled executables (a fresh Mosaic
    compile costs ~10+ minutes per kernel on the attached TPU, and the
    impls would otherwise key the jit cache on the exact batch):

      * Compiled (Mosaic) mode: everything pads to CANONICAL_BATCH
        multiples — batch 1, the preflight's batch 3, and batch 1024 all
        run THE SAME executables, so the preflight validates the exact
        binaries production uses and single-proof calls never trigger a
        fresh compile. A padded-1024 launch costs ~0.1 s of device time —
        noise next to one avoided compile.
      * Interpret mode (CPU tests): pads only to the 128-lane grid — the
        interpreter executes every lane on the host, so canonical padding
        would inflate tiny tests 256x.

    Zero lanes are infinity points / zero scalars — masked or absorbed by
    every kernel."""
    if interpret:
        padded = _rows_for(batch, _tile_for(batch)) * 128
    else:
        cb = CANONICAL_BATCH
        padded = ((batch + cb - 1) // cb) * cb
    if padded == batch:
        return tree, batch
    def pad(a):
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, padded - a.shape[-1])])
    return jax.tree_util.tree_map(pad, tree), padded


def miller_product_mega(pairs_p, pairs_q, interpret=None):
    """pairs_p: (x:(n,16,B), y, inf); pairs_q: Fq2 arrays (n,16,2,B).
    Infinity handling happens in-kernel from the zero encoding. Returns
    (16, 12, B)."""
    if interpret is None:
        interpret = F.pallas_interpret()
    batch = pairs_p[0].shape[-1]
    (pairs_p, pairs_q), _ = _pad_batch(
        (tuple(jnp.asarray(x) for x in pairs_p),
         tuple(jnp.asarray(x) for x in pairs_q)), batch, interpret)
    out = _miller_product_mega_jit(pairs_p, pairs_q, interpret=interpret)
    return out[..., :batch]


def pack_line_tables(tables):
    """Tuple of ops/lines.py::G2LineTable -> (lines_arr, tails_arr) numpy
    stacks: (nf, 4, STEPS, 16, 2) and (nf, 2, 2, 16, 2)."""
    lines_arr = np.stack(
        [
            np.stack(
                [
                    np.asarray(tb.dbl_c1),
                    np.asarray(tb.dbl_c3),
                    np.asarray(tb.add_c1),
                    np.asarray(tb.add_c3),
                ]
            )
            for tb in tables
        ]
    )
    tails_arr = np.stack(
        [
            np.stack([np.asarray(tb.tail_c1), np.asarray(tb.tail_c3)])
            for tb in tables
        ]
    )
    return lines_arr, tails_arr


def miller_mixed_mega(var_p, var_q, fixed_ps, tables, interpret=None):
    """Mixed Miller product mega kernel (see _miller_mixed_kernel).

    var_p/var_q: one (x, y, inf) pair or None; fixed_ps: tuple of (x, y,
    inf) affine G1 tuples; tables: matching ops/lines.py::G2LineTable.
    """
    if interpret is None:
        interpret = F.pallas_interpret()
    lines_arr, tails_arr = pack_line_tables(tables)
    fixed = tuple(
        jnp.stack([jnp.asarray(p[i]) for p in fixed_ps]) for i in range(3)
    )
    batch = fixed[0].shape[-1]
    if var_p is not None:
        var_p = tuple(jnp.asarray(x) for x in var_p)
        var_q = tuple(jnp.asarray(x) for x in var_q)
    (var_p, var_q, fixed), _ = _pad_batch((var_p, var_q, fixed), batch,
                                           interpret)
    out = _miller_mixed_mega_jit(
        var_p, var_q, fixed, lines_arr, tails_arr, interpret=interpret
    )
    return out[..., :batch]


def final_exp_mega(f, interpret=None):
    """f: (16, 12, B) -> (16, 12, B)."""
    if interpret is None:
        interpret = F.pallas_interpret()
    batch = f.shape[-1]
    f, _ = _pad_batch(jnp.asarray(f), batch, interpret)
    # zero lanes are not valid Fq12 values but every op on them is still
    # well-defined uint32 arithmetic; the lanes are sliced away below
    return _final_exp_mega_jit(f, interpret=interpret)[..., :batch]


def msm_affine_mega(points, scalars, interpret=None):
    """points: (x:(n,16,B), y:(n,16,B), inf:(n,B)); scalars (n,16,B)
    canonical. Returns affine (x:(16,B), y:(16,B), inf:(B,) bool)."""
    if interpret is None:
        interpret = F.pallas_interpret()
    batch = points[0].shape[-1]
    (points, scalars), _ = _pad_batch(
        (tuple(jnp.asarray(x) for x in points), jnp.asarray(scalars)), batch,
        interpret)
    out = _msm_affine_mega_jit(points, scalars, interpret=interpret)
    return tuple(a[..., :batch] for a in out)
