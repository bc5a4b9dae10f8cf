"""Multi-process (DCN-analogue) worker: one JAX process of a 2-process x
4-device CPU cluster running a sharded MSM over the GLOBAL 8-device mesh.

Launched by tests/test_multihost.py with
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4
in the environment (set there because sitecustomize may import jax before
this module runs). Exits 0 iff the globally-sharded MSM bit-equals the
trapdoor oracle on this process.

This is the standard way to exercise jax.distributed/multi-host jit without
a multi-host TPU slice: process boundaries are real (separate runtimes,
cross-process collectives), only the transport differs.
"""

import sys

import numpy as np


def main() -> int:
    process_id, num_processes, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    from snark_bn254_verifier_tpu.parallel.sharded import (
        init_distributed,
        make_mesh,
        sharded_msm,
    )

    init_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()
    assert len(jax.local_devices()) == 4, jax.local_devices()
    assert len(jax.devices()) == 4 * num_processes, jax.devices()

    from jax.sharding import NamedSharding, PartitionSpec as P

    from snark_bn254_verifier_tpu.models.jax_backend import unpack_g1_jacobian
    from snark_bn254_verifier_tpu.oracle import bn254 as bn
    from snark_bn254_verifier_tpu.ops import field as F

    # identical deterministic data on every process (the multi-host
    # contract: each process feeds its addressable shards of one global
    # array, built here via make_array_from_callback)
    n = 128
    rng = np.random.default_rng(23)
    k0 = int(rng.integers(1, 1 << 62))
    pts, acc = [], bn.g1_mul(bn.G1_GEN, k0)
    for _ in range(n):
        pts.append(acc)
        acc = bn.g1_add(acc, bn.G1_GEN)
    scs = [int.from_bytes(rng.bytes(31), "big") % bn.R for _ in range(n)]
    expected = bn.g1_mul(
        bn.G1_GEN, sum(s * (k0 + i) for i, s in enumerate(scs)) % bn.R
    )

    x = np.stack([F.FQ.pack_scalar(p[0]) for p in pts])[..., None]
    y = np.stack([F.FQ.pack_scalar(p[1]) for p in pts])[..., None]
    inf = np.zeros((n, 1), bool)
    sc = np.stack([F.FR.pack_scalar(s, mont=False) for s in scs])[..., None]

    mesh = make_mesh(len(jax.devices()), model_parallelism=len(jax.devices()))

    def garr(a, spec):
        return jax.make_array_from_callback(
            a.shape, NamedSharding(mesh, spec), lambda idx: a[idx]
        )

    points = (garr(x, P("model")), garr(y, P("model")), garr(inf, P("model")))
    scalars = garr(sc, P("model"))
    out = sharded_msm(mesh, points, scalars)
    got = unpack_g1_jacobian(out)[0]
    assert got == expected, f"process {process_id}: MSM mismatch"
    print(f"process {process_id}: OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
