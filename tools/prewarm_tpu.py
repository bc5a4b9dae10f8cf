"""Pre-warm the persistent compilation cache for every production shape.

Cold Mosaic compiles cost minutes per (kernel, shape) over the attached
TPU; the persistent cache (.jax_cache) makes them one-time. Run this once
after kernel changes so bench.py (and the driver's end-of-round run) hits
a warm cache and its per-config wall-clock budgets bind only on real
hangs.

Shapes warmed: the batched Groth16/PlonK pipelines at --batch (default
1024: tile-8 kernels), the singles path (batch-1 -> 128-lane bucket), and
the 2^--msm-log2n sharded MSM.

Usage: python tools/prewarm_tpu.py [--batch 1024] [--msm-log2n 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _log(msg):
    print(f"[prewarm +{time.monotonic() - T0:7.1f}s] {msg}", flush=True)


T0 = time.monotonic()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--msm-log2n", type=int, default=16)
    ap.add_argument("--skip", default="", help="comma list of stages to skip")
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    from snark_bn254_verifier_tpu.utils.config import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np

    if "groth16" not in skip:
        from snark_bn254_verifier_tpu.fixtures.gen import gen_groth16_vector
        from snark_bn254_verifier_tpu.parallel.batch import Groth16BatchVerifier

        vec = gen_groth16_vector(0, num_inputs=2)
        v = Groth16BatchVerifier(vec.vk)
        _log(f"groth16 batch={args.batch} ...")
        ok = v.verify_batch([vec.proof] * args.batch,
                            [vec.public_inputs] * args.batch)
        assert bool(np.asarray(ok).all())
        _log("groth16 batch OK")
        _log("groth16 single ...")
        ok = v.verify_batch([vec.proof], [vec.public_inputs])
        assert bool(np.asarray(ok).all())
        _log("groth16 single OK")

    if "plonk" not in skip:
        from snark_bn254_verifier_tpu.parallel.batch import PlonkBatchVerifier

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "bench", os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "bench.py"))
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)
        vk, proof, inputs, source = bench._plonk_vectors()
        pv = PlonkBatchVerifier(vk)
        _log(f"plonk batch={args.batch} ({source}) ...")
        ok = pv.verify_batch([proof] * args.batch, [inputs] * args.batch)
        assert bool(np.asarray(ok).all())
        _log("plonk batch OK")
        _log("plonk single ...")
        ok = pv.verify_batch([proof], [inputs])
        assert bool(np.asarray(ok).all())
        _log("plonk single OK")

    if "msm" not in skip:
        import jax

        from snark_bn254_verifier_tpu.oracle import bn254 as bn
        from snark_bn254_verifier_tpu.ops import field as F
        from snark_bn254_verifier_tpu.parallel.sharded import (
            make_mesh,
            sharded_msm,
        )

        n = 1 << args.msm_log2n
        _log(f"msm 2^{args.msm_log2n} point gen ...")
        rng = np.random.default_rng(11)
        pts, acc = [], bn.g1_mul(bn.G1_GEN, 5)
        for _ in range(n):
            pts.append(acc)
            acc = bn.g1_add(acc, bn.G1_GEN)
        scs = [int.from_bytes(rng.bytes(31), "big") % bn.R for _ in range(n)]
        x = np.stack([F.FQ.pack_scalar(p[0]) for p in pts])[..., None]
        y = np.stack([F.FQ.pack_scalar(p[1]) for p in pts])[..., None]
        inf = np.zeros((n, 1), bool)
        sc = np.stack([F.FR.pack_scalar(s, mont=False) for s in scs])[..., None]
        n_chips = max(1, len(jax.devices()))
        mesh = make_mesh(n_chips, model_parallelism=n_chips)
        _log("msm compile+run ...")
        out = sharded_msm(mesh, (x, y, inf), sc, c=8)
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
        _log("msm OK")

    _log("prewarm complete")


if __name__ == "__main__":
    main()
