"""Benchmark driver: batched proof verification throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no wall-clock numbers (BASELINE.md — only zkVM cycle
counts), so vs_baseline is measured against the BASELINE.json north-star
target of 10,000 proofs/sec on a 16-chip v5e (= 625 proofs/sec/chip):
vs_baseline = (proofs/sec/chip) / 625.

Usage: python bench.py [--smoke] [--batch N] [--iters K]
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny shapes, quick")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--plonk", action="store_true", help="also bench PlonK")
    args = ap.parse_args()

    from snark_bn254_verifier_tpu.utils.config import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import numpy as np

    from snark_bn254_verifier_tpu.fixtures.gen import gen_groth16_vector
    from snark_bn254_verifier_tpu.parallel.batch import Groth16BatchVerifier

    batch = args.batch or (32 if args.smoke else 1024)
    iters = args.iters or (2 if args.smoke else 8)

    vec = gen_groth16_vector(0, num_inputs=2)
    verifier = Groth16BatchVerifier(vec.vk)
    proofs = [vec.proof] * batch
    inputs = [vec.public_inputs] * batch

    # warm-up / compile
    t0 = time.time()
    ok = verifier.verify_batch(proofs, inputs)
    compile_time = time.time() - t0
    assert bool(np.asarray(ok).all()), "bench verification returned False"

    t0 = time.time()
    for _ in range(iters):
        ok = verifier.verify_batch(proofs, inputs)
    elapsed = time.time() - t0
    total = batch * iters
    pps = total / elapsed

    n_chips = max(1, len(jax.devices()))
    pps_chip = pps / n_chips
    result = {
        "metric": "groth16_batched_verify_throughput",
        "value": round(pps_chip, 2),
        "unit": "proofs/sec/chip",
        "vs_baseline": round(pps_chip / 625.0, 4),
        "batch": batch,
        "iters": iters,
        "chips": n_chips,
        "compile_s": round(compile_time, 1),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
