"""Precomputed Miller-loop line tables for VK-fixed G2 points.

Every pairing the protocols evaluate has at most ONE G2 point that varies
per proof:

  * Groth16 (verify.rs:66-75): e(A,B) varies in B; e(L, gamma) and
    e(C, -delta) have VK-constant G2 points (and e(alpha, beta) is fully
    constant — already folded as a cached Gt, parallel/batch.py; the check
    is e(A,B) e(L,gamma) e(C,-delta) == e(alpha,beta)).
  * PlonK/KZG (kzg.rs:180-186): BOTH G2 points ([1]_2 and [x]_2) are
    VK-constant.

For a fixed Q the Miller loop's G2 work (the doubling/addition steps that
produce each line's coefficients) depends only on Q — so it is done ONCE
per VK on the host with exact integer arithmetic, and the device loop for
that pair degenerates to sparse line multiplications: per iteration one
(and on add-bits two) multiply of the running f by the precomputed line
evaluated at the proof's G1 point. Combined with a shared f-squaring chain
across all pairs of the product (see ops/pairing.py::miller_product_mixed)
this removes ~45%% of the Montgomery multiplies of a Groth16 verification
and ~40%% of a KZG check versus running full Miller loops per pair.

Line normalization: the host computes affine (chord/tangent) lines
    l(P) = yP - lambda*xP * w + (lambda*x_t - y_t) * w^3
i.e. the (c0, c1, c3) triple of ops/pairing.py with c0 = 1 — the device
then uses (yP, 0) directly as the first sparse coefficient, saving the
c0 multiply. Mixing this normalization with the device's Jacobian-scaled
lines for the variable pair is sound: the scale factors lie in Fq2, whose
elements are annihilated by the final exponentiation's easy part.

The tables are tiny (6 arrays, ~34 KB per fixed point) and batch
independent; they broadcast against the proof batch on device.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..oracle import bn254 as bn
from . import field as F

# Static Miller schedule shared with ops/pairing.py: bits of 6x+2 after the
# leading one. STEPS doubling steps; adds where the bit is set, plus the two
# Frobenius correction adds at the end.
MILLER_BITS = [int(c) for c in bin(bn.ATE_LOOP_COUNT)[2:]][1:]
STEPS = len(MILLER_BITS)


class G2LineTable(NamedTuple):
    """Montgomery-limb line coefficient tables for one fixed G2 point.

    dbl_*: (STEPS, 16, 2) — tangent line of iteration i.
    add_*: (STEPS, 16, 2) — chord line of iteration i (zeros where
           MILLER_BITS[i] == 0; those rows are multiplied then discarded by
           the same select the variable pair already pays).
    tail_*: (2, 16, 2) — the q1/q2 Frobenius correction lines.
    """

    dbl_c1: np.ndarray
    dbl_c3: np.ndarray
    add_c1: np.ndarray
    add_c3: np.ndarray
    tail_c1: np.ndarray
    tail_c3: np.ndarray


def _pack_fq2(v) -> np.ndarray:
    """Oracle Fq2 tuple -> (16, 2) Montgomery limb array."""
    return np.stack([F.FQ.pack_scalar(v[0]), F.FQ.pack_scalar(v[1])], axis=1)


def _tangent_coeffs(t):
    """(c1, c3) of the tangent line at t, affine-normalized (c0 == 1)."""
    xt, yt = t
    lam = bn.fq2_mul(
        bn.fq2_mul_scalar(bn.fq2_sq(xt), 3),
        bn.fq2_inv(bn.fq2_mul_scalar(yt, 2)),
    )
    return bn.fq2_neg(lam), bn.fq2_sub(bn.fq2_mul(lam, xt), yt)


def _chord_coeffs(t, q):
    """(c1, c3) of the chord line through t and q (t != +-q, asserted)."""
    xt, yt = t
    xq, yq = q
    assert xt != xq, "vertical line for a VK G2 point (t == +-q): invalid VK"
    lam = bn.fq2_mul(bn.fq2_sub(yq, yt), bn.fq2_inv(bn.fq2_sub(xq, xt)))
    return bn.fq2_neg(lam), bn.fq2_sub(bn.fq2_mul(lam, xt), yt)


def g2_line_table(q) -> G2LineTable:
    """Walk the optimal-ate schedule for fixed Q, emitting every line's
    (c1, c3).

    Mirrors the step order of ops/pairing.py::miller_loop (and the oracle's
    miller_loop): per iteration tangent-then-conditional-chord, then the
    q1 = pi(Q), q2 = -pi^2(Q) correction adds. The loop point multiples
    [k]Q for k < 6x+2 < r never coincide with +-Q for a prime-order Q, so
    no vertical line can occur (asserted anyway).
    """
    assert q is not None and bn.g2_is_on_curve(q), "fixed G2 point off-curve"
    zero2 = np.zeros((16, 2), dtype=np.uint32)
    dbl_c1, dbl_c3, add_c1, add_c3 = [], [], [], []
    t = q
    for bit in MILLER_BITS:
        c1, c3 = _tangent_coeffs(t)
        dbl_c1.append(_pack_fq2(c1))
        dbl_c3.append(_pack_fq2(c3))
        t = bn.g2_add(t, t)
        if bit:
            c1, c3 = _chord_coeffs(t, q)
            add_c1.append(_pack_fq2(c1))
            add_c3.append(_pack_fq2(c3))
            t = bn.g2_add(t, q)
        else:
            add_c1.append(zero2)
            add_c3.append(zero2)
    q1 = bn.g2_frobenius(q)
    q2 = bn.g2_neg(bn.g2_frobenius(bn.g2_frobenius(q)))
    tail_c1, tail_c3 = [], []
    for qq in (q1, q2):
        c1, c3 = _chord_coeffs(t, qq)
        tail_c1.append(_pack_fq2(c1))
        tail_c3.append(_pack_fq2(c3))
        t = bn.g2_add(t, qq)
    return G2LineTable(
        dbl_c1=np.stack(dbl_c1),
        dbl_c3=np.stack(dbl_c3),
        add_c1=np.stack(add_c1),
        add_c3=np.stack(add_c3),
        tail_c1=np.stack(tail_c1),
        tail_c3=np.stack(tail_c3),
    )
