"""On-TPU validation of miller_mixed_mega (both protocol shapes) vs oracle.

The r04 regression shipped because the mixed kernel — the ONLY pairing
kernel the production batch pipelines dispatch — was never compiled on
hardware before the round ended. This is the standalone repro/validator:
run it on the attached TPU; it compiles the kernel for the Groth16 shape
(nf=2 + variable pair) and the PlonK/KZG shape (nf=2 fixed-only) and
checks bit-exactness against the oracle pairing.

Usage: python tools/validate_mixed_tpu.py
"""

import random
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from snark_bn254_verifier_tpu.models.jax_backend import (  # noqa: E402
    pack_g1,
    pack_g2,
    unpack_fq12,
)
from snark_bn254_verifier_tpu.oracle import bn254 as bn  # noqa: E402
from snark_bn254_verifier_tpu.ops import lines as LN  # noqa: E402
from snark_bn254_verifier_tpu.ops import pairing_pallas as PP  # noqa: E402
from snark_bn254_verifier_tpu.utils.config import (  # noqa: E402
    enable_compilation_cache,
)


def _stack_pts(cols):
    return tuple(np.stack([c[i] for c in cols], axis=0) for i in range(3))


def main(interpret: bool = False) -> bool:
    enable_compilation_cache()
    rng = random.Random(23)
    nlanes = 3
    ok_all = True

    # fixed G2 points (VK-style) + their line tables
    q_fixed = [bn.g2_mul(bn.G2_GEN, rng.randrange(1, bn.R)) for _ in range(2)]
    tables = tuple(LN.g2_line_table(q) for q in q_fixed)

    # per-lane G1 points for the fixed pairs (one infinity lane) and the
    # variable pair
    fixed_lanes = [
        [bn.g1_mul(bn.G1_GEN, rng.randrange(1, bn.R)) for _ in range(nlanes)]
        for _ in range(2)
    ]
    fixed_lanes[0][1] = None  # infinity lane
    var_p_lanes = [bn.g1_mul(bn.G1_GEN, rng.randrange(1, bn.R)) for _ in range(nlanes)]
    var_q_lanes = [bn.g2_mul(bn.G2_GEN, rng.randrange(1, bn.R)) for _ in range(nlanes)]

    fixed_ps = tuple(pack_g1(lane) for lane in fixed_lanes)
    var_p = pack_g1(var_p_lanes)
    var_q = pack_g2(var_q_lanes)

    for name, vp, vq in (("groth16_shape", var_p, var_q),
                         ("plonk_shape", None, None)):
        t0 = time.time()
        f = PP.miller_mixed_mega(vp, vq, fixed_ps, tables, interpret=interpret)
        gt = unpack_fq12(np.asarray(PP.final_exp_mega(f, interpret=interpret)))
        dt = time.time() - t0
        ok = True
        for lane in range(nlanes):
            pairs = [
                (fixed_lanes[j][lane], q_fixed[j])
                for j in range(2)
                if fixed_lanes[j][lane] is not None
            ]
            if vp is not None:
                pairs.append((var_p_lanes[lane], var_q_lanes[lane]))
            ok &= gt[lane] == bn.pairing_batch(pairs)
        print(f"{name}: ok={ok} ({dt:.1f}s)", flush=True)
        ok_all &= ok
    return ok_all


if __name__ == "__main__":
    interp = "--interpret" in sys.argv
    sys.exit(0 if main(interpret=interp) else 1)
