"""Weak-scaling measurement child: one (device_count, batch) data point.

Spawned by bench.py's `scaling` config with
``XLA_FLAGS=--xla_force_host_platform_device_count=N``; forces the CPU
platform (same technique as tests/conftest.py — flip the live config in
case sitecustomize already imported JAX against an accelerator), runs the
staged data-parallel batched Groth16 pipeline over an N-device mesh, and
prints ONE JSON line (last line of stdout; the staged pipeline's progress
lines precede it).

Usage: python tools/weak_scaling_child.py N_DEVICES BATCH ITERS
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    n_dev = int(sys.argv[1])
    batch = int(sys.argv[2])
    iters = int(sys.argv[3])

    from __graft_entry__ import (  # noqa: E402
        _packed_groth16_example,
        _setup_cache,
        _staged_groth16,
    )
    from snark_bn254_verifier_tpu.parallel import sharded as S  # noqa: E402

    _setup_cache()
    devs = jax.devices()
    assert len(devs) >= n_dev and devs[0].platform == "cpu", (
        f"expected >= {n_dev} CPU devices, got {devs!r}"
    )
    mesh = S.make_mesh(n_dev, model_parallelism=1)
    n_inputs, args, _vk = _packed_groth16_example(batch=batch)
    sharded = S.shard_batch(args, mesh)

    t0 = time.time()
    with mesh:
        ok = jax.block_until_ready(_staged_groth16(n_inputs, sharded))
    compile_s = time.time() - t0
    assert bool(np.asarray(ok).all())

    t0 = time.time()
    for _ in range(iters):
        with mesh:
            jax.block_until_ready(_staged_groth16(n_inputs, sharded))
    elapsed = time.time() - t0
    print(
        json.dumps(
            {
                "devices": n_dev,
                "batch": batch,
                "iters": iters,
                "proofs_per_sec": round(batch * iters / elapsed, 2),
                "compile_s": round(compile_s, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
