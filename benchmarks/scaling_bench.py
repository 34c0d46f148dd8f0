"""Multi-chip keyswitch scaling benchmark (BASELINE.md north star).

Measures hybrid-keyswitch throughput at mesh sizes 1, 2, 4, ... devices
with the ciphertext batch sharded over `batch` and RNS limbs over `limb`
(tpu_fhe.parallel.sharding), and reports scaling efficiency vs the
1-device rate.  The target from BASELINE.json: >= 80% efficiency from
1 chip to N hosts.

On this machine only one TPU chip is reachable, so by default the bench
runs on a virtual CPU mesh (--cpu, n devices via jax_num_cpu_devices) —
that validates the SPMD program and the collective layout end-to-end and
gives the communication-to-compute structure, but CPU rates are not TPU
rates: re-run unchanged on a real pod slice for the headline number.

Usage:
  python benchmarks/scaling_bench.py --cpu --devices 8 --batch-per-dev 1
  python benchmarks/scaling_bench.py            # on a real multi-chip host
"""

import os as _os
import sys

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--logn", type=int, default=12)
    ap.add_argument("--limbs", type=int, default=16, help="data limbs")
    ap.add_argument("--special", type=int, default=4)
    ap.add_argument("--batch-per-dev", type=int, default=1)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu_fhe.core.modulus import CoeffModulus
    from tpu_fhe.core.params import EncryptionParameters, SchemeType
    from tpu_fhe.eval import evaluator as ev
    from tpu_fhe.ops import w64
    from tpu_fhe.ops.w64 import W64
    from tpu_fhe.parallel import sharding as sh
    from tpu_fhe.scheme.ciphertext import Ciphertext
    from tpu_fhe.scheme.context import FheContext
    from tpu_fhe.scheme.keys import SecretKey

    n = 1 << args.logn
    bits = [40] + [40] * (args.limbs - 1) + [40] * args.special
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, bits)),
        special_modulus_size=args.special,
    )
    ctx = FheContext(params)
    sk = SecretKey(ctx, key=7)
    rlk = sk.relin_key()
    level = ctx.level(1)
    qs = np.array([m.value for m in level.base.base], dtype=np.uint64)

    ndev = len(jax.devices())
    mesh_sizes = []
    d = 1
    while d <= ndev:
        mesh_sizes.append(d)
        d *= 2

    def bench_at(n_mesh):
        """Batch scales with the mesh (weak scaling over `batch`; limbs
        replicated): throughput/device should stay flat."""
        batch = args.batch_per_dev * n_mesh
        mesh = sh.make_mesh(n_mesh, 1)
        rng = np.random.default_rng(0)
        data = (
            rng.integers(0, 1 << 40, size=(batch, 3, level.size, n),
                         dtype=np.uint64) % qs[None, None, :, None]
        )
        xs = jax.device_put(
            W64.from_np(data), sh.ct_sharding(mesh, batched=True)
        )
        key = jax.device_put(rlk.data, sh.key_sharding(mesh))

        def one(cdata, kdata):
            from tpu_fhe.scheme.keys import RelinKey

            ct = Ciphertext(cdata, chain_index=1, scale=2.0**40)
            out = ev.relinearize(ctx, ct, RelinKey(kdata))
            return w64.concat([out.data, out.data[0:1]], axis=0)

        step = jax.jit(
            jax.vmap(one, in_axes=(0, None)),
            in_shardings=(sh.ct_sharding(mesh, batched=True),
                          sh.key_sharding(mesh)),
        )

        def run(reps):
            t0 = time.time()
            y = xs
            for _ in range(reps):
                y = step(y, key)
            np.asarray(y.lo[0, 0, 0, :4])
            return time.time() - t0

        with mesh:
            run(1)  # compile
            run(1)
            dt = (run(1 + args.iters) - run(1)) / args.iters
        rate = batch / dt
        return rate, rate / n_mesh

    base_per_dev = None
    print(f"{'devices':>8} {'ks/s':>10} {'ks/s/dev':>10} {'efficiency':>10}")
    for m in mesh_sizes:
        rate, per_dev = bench_at(m)
        if base_per_dev is None:
            base_per_dev = per_dev
        eff = per_dev / base_per_dev
        print(f"{m:>8} {rate:>10.2f} {per_dev:>10.2f} {eff:>9.1%}")


if __name__ == "__main__":
    main()
