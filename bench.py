"""Headline benchmark: hybrid keyswitch throughput (the FHE hot path).

Prints ONE JSON line:
  {"metric": "keyswitch/s", "value": N, "unit": "ops/s", "vs_baseline": R}

Config mirrors the reference's keyswitch bench harness
(/root/reference/benchmark/keyswitch_bench.cu: N=2^15, 60-bit limbs); the
reference repo publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against the first recorded TPU result (pinned below) — >1.0 means
faster than the round-1 jnp/uint64 path.

Measurement chains K keyswitches inside one jitted fori_loop so tunnel
dispatch latency does not pollute the number.  Secondary metrics (NTT
throughput) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# First recorded TPU v5e result (2026-08-17, XLA-emulated uint64 path, no
# Pallas NTT): keyswitch 53.89 ms/op at N=2^15, 30 data + 15 special limbs.
PINNED_BASELINE_KEYSWITCH_PER_S = 18.556


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _marginal_ms(timed, iters, name, pairs=5):
    """Median-of-pairs marginal timing with a positivity guard.

    The r03 headline went negative because a single (t_long - t_short)
    difference is exposed to one slow sample (tunnel hiccup / background
    recompile).  Mirror the reference harness's stable-sampling approach
    (/root/reference/benchmark/keyswitch_bench.cu:10-13, nvbench): take
    several independent pairs, keep only positive marginals, report the
    median, and print the spread so drift is visible.
    """
    samples = []
    for _ in range(pairs):
        t_short = timed(2)
        t_long = timed(2 + iters)
        dt = (t_long - t_short) / iters
        if dt > 0:
            samples.append(dt)
    if not samples:
        # pathological timing environment: fall back to direct per-op
        # time (upper bound — includes dispatch, but always positive)
        samples = [timed(iters) / iters for _ in range(3)]
    samples.sort()
    med = samples[len(samples) // 2]
    spread = (samples[-1] - samples[0]) / med if med else float("inf")
    log(f"{name} {med*1e3:.2f} ms/op (median of {len(samples)} marginal "
        f"pairs, spread {spread*100:.0f}%)")
    return med


def bench_keyswitch(n, data_bits, num_data, size_p, iters=50):
    import jax
    from tpu_fhe.core.modulus import CoeffModulus
    from tpu_fhe.core.params import EncryptionParameters, SchemeType
    from tpu_fhe.eval import evaluator as ev
    from tpu_fhe.ops import w64
    from tpu_fhe.ops.w64 import W64
    from tpu_fhe.scheme.ciphertext import Ciphertext
    from tpu_fhe.scheme.context import FheContext
    from tpu_fhe.scheme.keys import SecretKey

    # all-limbs-under-2^30 configs engage the q32 single-word kernels
    kb = 60 if data_bits > 30 else data_bits
    bits = [kb] + [data_bits] * (num_data - 1) + [kb] * size_p
    t0 = time.time()
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, bits)),
        special_modulus_size=size_p,
    )
    ctx = FheContext(params)
    log(f"context N={n} limbs={len(bits)} ({time.time()-t0:.1f}s)")

    t0 = time.time()
    sk = SecretKey(ctx, key=5)
    rlk = sk.relin_key()
    jax.block_until_ready(rlk.data)
    log(f"keygen ({time.time()-t0:.1f}s)")

    # size-3 ct stand-in at the top level (random residues are fine for perf)
    level = ctx.level(1)
    rng = np.random.default_rng(0)
    qs = np.array([m.value for m in level.base.base], dtype=np.uint64)
    data = (
        rng.integers(0, 1 << 60, size=(3, level.size, n), dtype=np.uint64)
        % qs[None, :, None]
    )
    ct = Ciphertext(W64.from_np(data), chain_index=1, scale=2.0**40)

    def chain(a, reps):
        def body(i, acc):
            # rlk is closed over: switching keys are long-lived resident
            # device buffers (the reference holds evks device-side too),
            # so the bench measures op throughput, not key streaming
            out = ev.relinearize(ctx, acc, rlk)  # size-3 -> size-2
            # re-expand to size 3 so the loop carries a fixed shape
            return acc.with_data(w64.concat([out.data, out.data[0:1]], axis=0))
        return jax.lax.fori_loop(0, reps, body, a)

    # dynamic trip count: one executable serves all rep counts, and the
    # marginal time between two counts is pure device compute (a fixed
    # D2H fetch pins completion; dispatch/tunnel overhead cancels out)
    step = jax.jit(chain)
    t0 = time.time()
    out = step(ct, 1)
    np.asarray(out.data.lo[0, 0, :4])
    log(f"keyswitch compile+first ({time.time()-t0:.1f}s)")

    def timed(reps):
        t0 = time.time()
        out = step(ct, reps)
        np.asarray(out.data.lo[0, 0, :4])
        return time.time() - t0

    timed(2)
    dt = _marginal_ms(timed, iters, "keyswitch")
    return 1.0 / dt


def bench_ntt(n, limbs, iters=2000):
    # iters sizes the marginal window: at ~0.2 ms/op the old 50-iter
    # window was ~10 ms against ~100 ms tunnel jitter (the r04 342%
    # spread); 2000 iters puts ~0.4 s of pure device compute between the
    # two timing points, the same discipline that got keyswitch to 2%
    import jax
    from tpu_fhe.core import numth
    from tpu_fhe.core.ntt_tables import make_ntt_tables
    from tpu_fhe.ops.ntt import build_device_ntt_tables, forward_ntt
    from tpu_fhe.ops.w64 import W64

    host = [make_ntt_tables(n.bit_length() - 1, q)
            for q in numth.get_primes(n, 59, limbs)]
    dev = build_device_ntt_tables(host).to_device()
    rng = np.random.default_rng(0)
    x = W64.from_np(rng.integers(0, 1 << 58, size=(limbs, n), dtype=np.uint64))

    @jax.jit
    def chain(v, reps):
        return jax.lax.fori_loop(0, reps, lambda i, a: forward_ntt(a, dev), v)

    def timed(reps):
        t0 = time.time()
        y = chain(x, reps)
        np.asarray(y.lo[0, :4])
        return time.time() - t0

    timed(2)  # compile + warm
    dt = _marginal_ms(timed, iters, f"NTT logN={n.bit_length()-1} x{limbs}",
                      pairs=5)
    log(f"NTT logN={n.bit_length()-1} x{limbs} limbs: {dt*1e3:.3f} ms "
        f"({limbs/dt:.0f} limb-NTT/s)")
    return limbs / dt


def _ensure_backend():
    """The ambient env may pin JAX_PLATFORMS to an experimental plugin
    (axon tunnel); if that backend fails to register, fall back to
    automatic choice instead of failing the whole bench."""
    import os

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        jax.devices()
    except RuntimeError as e:
        log(f"backend {os.environ.get('JAX_PLATFORMS')!r} failed ({e}); "
            "falling back to automatic platform selection")
        jax.config.update("jax_platforms", "")
        jax.devices()
    log(f"backend: {jax.default_backend()} {jax.devices()}")


def main():
    _ensure_backend()
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

    # secondary: the q32 (composite-scaling) regime at identical total
    # logQ/logP — 2x 30-bit limbs, single-word butterflies (stderr only;
    # the primary metric stays on the reference harness parameterization)
    if rate is not None:
        try:
            r32 = bench_keyswitch(1 << 15, 30, 60, 30)
            log(f"keyswitch q32 config (30-bit x 60+30): {r32:.2f} ops/s "
                f"({r32 / rate:.2f}x the 60-bit config)")
        except Exception as e:  # noqa: BLE001
            log(f"q32 keyswitch bench failed: {e!r}")
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
