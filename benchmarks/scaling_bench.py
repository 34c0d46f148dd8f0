"""Multi-chip keyswitch scaling benchmark (BASELINE.md north star).

Two axes (tpu_fhe.parallel.sharding mesh ('batch', 'limb')):

  * --mode batch: weak scaling over independent ciphertexts — batch grows
    with the mesh, limbs replicated; throughput/device should stay flat.
  * --mode limb : tensor parallelism over RNS limbs — ONE ciphertext's
    limbs and the evk's key-level limb axis are sharded over the mesh
    (parallel.sharding.key_sharding); the keyswitch basis conversions
    contract over the sharded limb axis, so the GSPMD partitioner inserts
    the digit collectives named in the BASELINE north star (for small
    digit width alpha it gathers the alpha source rows — a few hundred KB
    — rather than all-reducing the QlP-row outputs, which is the
    bandwidth-optimal choice).

    METRIC CAVEAT on the CPU mesh: XLA:CPU multithreads a SINGLE device
    across all host cores, so virtual devices share compute and classic
    strong-scaling speedup is structurally impossible (aggregate compute
    is constant).  The honest CPU-mesh metric is SHARDING OVERHEAD:
    rate(m devices) / rate(1 device), ideal 100%.  On real multi-chip
    hardware each device brings its own compute, and this same overhead
    ratio is what bounds strong-scaling efficiency.

Both modes print the collective ops the partitioner actually inserted
(counted from the compiled HLO, with element byte counts) so the
communication structure is verifiable, not asserted.

On this machine only one TPU chip is reachable, so by default the bench
runs on a virtual CPU mesh (--cpu, n devices via jax_num_cpu_devices) —
that validates the SPMD program and the collective layout end-to-end and
gives the communication-to-compute structure, but CPU rates are not TPU
rates: re-run unchanged on a real pod slice for the headline number.

Usage:
  python benchmarks/scaling_bench.py --cpu --devices 8 --mode limb
  python benchmarks/scaling_bench.py --cpu --devices 8 --mode batch
"""

import os as _os
import re
import sys

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_DTYPE_BYTES = {"u64": 8, "s64": 8, "f64": 8, "u32": 4, "s32": 4, "f32": 4,
                "u16": 2, "s16": 2, "u8": 1, "s8": 1, "pred": 1}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
                "collective-permute")


def collective_stats(hlo_text: str) -> dict:
    """Count collective ops + payload bytes in compiled HLO text."""
    stats = {}
    for line in hlo_text.splitlines():
        m = re.search(r"=\s+(\w+)\[([\d,]*)\][^ ]*\s+(%?)([a-z\-]+)", line)
        if not m:
            continue
        dtype, dims, _, op = m.group(1), m.group(2), m.group(3), m.group(4)
        op = op.rstrip(".0123456789")
        for c in _COLLECTIVES:
            if op.startswith(c):
                elems = 1
                for d in dims.split(","):
                    if d:
                        elems *= int(d)
                count, nbytes = stats.get(c, (0, 0))
                stats[c] = (count + 1,
                            nbytes + elems * _DTYPE_BYTES.get(dtype, 8))
                break
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--mode", choices=["batch", "limb", "bsgs"],
                    default="limb")
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

    from tpu_fhe.core.modulus import CoeffModulus
    from tpu_fhe.core.params import EncryptionParameters, SchemeType
    from tpu_fhe.eval import evaluator as ev
    from tpu_fhe.ops import w64
    from tpu_fhe.ops.w64 import W64
    from tpu_fhe.parallel import sharding as sh
    from tpu_fhe.scheme.ciphertext import Ciphertext
    from tpu_fhe.scheme.context import FheContext
    from tpu_fhe.scheme.keys import RelinKey, SecretKey

    if args.mode == "bsgs":
        bench_bsgs(args)
        return

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

    def one_factory(batched):
        def one(cdata, kdata, kshoup):
            ct = Ciphertext(cdata, chain_index=1, scale=2.0**40)
            out = ev.relinearize(ctx, ct, RelinKey(kdata, kshoup))
            return w64.concat([out.data, out.data[0:1]], axis=0)

        return jax.vmap(one, in_axes=(0, None, None)) if batched else one

    def bench_at(n_mesh, show_hlo=False):
        if args.mode == "batch":
            batch = args.batch_per_dev * n_mesh
            mesh = sh.make_mesh(n_mesh, 1)
            cs = sh.ct_sharding(mesh, batched=True)
            fn = one_factory(batched=True)
        else:
            batch = 1
            mesh = sh.make_mesh(1, n_mesh)
            cs = sh.ct_sharding(mesh, batched=False)
            fn = one_factory(batched=False)

        rng = np.random.default_rng(0)
        shape = ((batch, 3, level.size, n) if args.mode == "batch"
                 else (3, level.size, n))
        data = (
            rng.integers(0, 1 << 40, size=shape, dtype=np.uint64)
            % (qs[None, :, None] if args.mode == "limb"
               else qs[None, None, :, None])
        )
        xs = jax.device_put(W64.from_np(data), cs)
        key_s = sh.shard_relin_key(rlk, mesh)

        step = jax.jit(fn, in_shardings=(cs, sh.key_sharding(mesh),
                                         None if key_s.shoup is None
                                         else sh.key_sharding(mesh)))

        with mesh:
            lowered = step.lower(xs, key_s.data, key_s.shoup)
            compiled = lowered.compile()
            if show_hlo:
                stats = collective_stats(compiled.as_text())
                if stats:
                    for c, (cnt, nb) in sorted(stats.items()):
                        log(f"  [{n_mesh}d] {c}: {cnt} ops, "
                            f"{nb / 1e6:.2f} MB/step")
                else:
                    log(f"  [{n_mesh}d] no collectives (fully local)")

            def run(reps):
                t0 = time.time()
                y = xs
                for _ in range(reps):
                    y = compiled(y, key_s.data, key_s.shoup)
                np.asarray(y.lo[(0,) * (y.lo.ndim - 1) + (slice(0, 4),)])
                return time.time() - t0

            run(1)
            run(1)
            from common import marginal_pairs
            dt = marginal_pairs(run, args.iters, log=log)
        rate = batch / dt
        return rate

    base_rate = None
    log(f"mode={args.mode} logN={args.logn} limbs={args.limbs}+{args.special}")
    if args.mode == "batch":
        print(f"{'devices':>8} {'ks/s':>10} {'ks/s/dev':>10} {'efficiency':>10}")
    else:
        print(f"{'devices':>8} {'ks/s':>10} {'overhead-eff':>12}")
    for m in mesh_sizes:
        rate = bench_at(m, show_hlo=True)
        if base_rate is None:
            base_rate = rate
        if args.mode == "batch":
            eff = (rate / m) / base_rate
            print(f"{m:>8} {rate:>10.2f} {rate / m:>10.2f} {eff:>9.1%}")
        else:
            # CPU mesh: devices share host cores; ideal sharded rate == the
            # 1-device rate, and rate(m)/rate(1) is the sharding overhead
            # efficiency (see module docstring).
            eff = rate / base_rate
            print(f"{m:>8} {rate:>10.2f} {eff:>11.1%}")


def bench_bsgs(args):
    """Limb-sharded bootstrap BSGS level scaling (the flagship workload's
    hot structure under the mesh; VERDICT r03 item 5).  Same CPU-mesh
    caveat as --mode limb: the honest metric is sharding-overhead
    efficiency rate(m)/rate(1)."""
    import jax

    from tpu_fhe.boot.bootstrap import CkksBootstrapper
    from tpu_fhe.core.modulus import CoeffModulus
    from tpu_fhe.core.params import EncryptionParameters, SchemeType
    from tpu_fhe.eval import auto
    from tpu_fhe.parallel import boot_sharded as bs
    from tpu_fhe.parallel import sharding as sh
    from tpu_fhe.scheme.ckks_encoder import CkksEncoder
    from tpu_fhe.scheme.context import FheContext
    from tpu_fhe.scheme.keys import SecretKey

    n = 1 << args.logn
    slots = min(64, n // 4)
    # the C2S input sits one level down (L = limbs - 1); round the data
    # limb count so L divides every mesh size up to 8 (GSPMD device_put
    # needs the sharded limb axis divisible by the mesh)
    limbs = 8 * ((args.limbs - 1 + 7) // 8) + 1
    bits = [60] + [59] * (limbs - 1) + [60] * args.special
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, bits)),
        special_modulus_size=args.special,
    )
    ctx = FheContext(params)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=7)
    boot = CkksBootstrapper(ctx, enc)
    boot.set_sine_params(28, 3, 44)
    boot.setup(level_budget=(2, 2), slots=slots)
    boot.keygen(sk, slots=slots)
    pt = enc.encode(np.linspace(-0.8, 0.8, slots), 2.0 ** 59,
                    chain_index=1, slots=slots)
    ct = auto.mod_switch_level(ctx, sk.encrypt_symmetric(pt), 1)

    si, rot_in, rot_out, b, g, num_rot, _ = boot.c2s_stage_plans(slots)[0]
    A = boot.precom[slots].a_c2s[si]
    keys = boot._keys_for(rot_in, rot_out)
    log(f"mode=bsgs logN={args.logn} limbs={limbs}+{args.special} "
        f"slots={slots} b={b} g={g}")

    ndev = len(jax.devices())
    base_rate = None
    print(f"{'devices':>8} {'level/s':>10} {'overhead-eff':>12}")
    m = 1
    while m <= ndev:
        mesh = sh.make_mesh(1, m)
        data_s = jax.device_put(ct.data, sh.ct_sharding(mesh))
        keys_s = bs._shard_keys(keys, mesh)

        def level_fn(c_data, ks):
            return boot._bsgs_level(
                ct.with_data(c_data), A, ks, rot_in, rot_out, b, g, num_rot
            ).data

        step = jax.jit(level_fn)
        with mesh:
            compiled = step.lower(data_s, keys_s).compile()
            stats = bs.collective_stats(compiled.as_text())
            log(f"  [{m}d] collectives: {stats or 'none (fully local)'}")

            def run(reps):
                t0 = time.time()
                for _ in range(reps):
                    y = compiled(data_s, keys_s)
                np.asarray(y.lo[0, 0, :4])
                return time.time() - t0

            run(1)
            run(1)
            from common import marginal_pairs
            dt = marginal_pairs(run, args.iters, log=log)
        rate = 1.0 / dt
        if base_rate is None:
            base_rate = rate
        print(f"{m:>8} {rate:>10.2f} {rate / base_rate:>11.1%}")
        m *= 2


if __name__ == "__main__":
    main()
