"""Micro-bench of the bconv Pallas kernel variants on the live backend:
sweeps N_ACC (independent accumulators) and MAX_ROW_BLOCK at the keyswitch
bench shapes (15->30, b=1 and b=2)."""

import os as _os
import sys

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(n=1 << 15, iters=30):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from tpu_fhe.core import numth
    from tpu_fhe.core.modulus import Modulus
    from tpu_fhe.core.rns import BaseConverter, RNSBase
    from tpu_fhe.ops import bconv_pallas
    from tpu_fhe.ops import w64
    from tpu_fhe.ops.bconv_pallas import bconv_matmul_pallas

    ib_primes = numth.get_primes(n, 50, 15)
    ob_primes = numth.get_primes(n, 59, 30)
    ib = RNSBase(tuple(Modulus(p) for p in ib_primes))
    ob = RNSBase(tuple(Modulus(p) for p in ob_primes))
    conv = BaseConverter(ib, ob)
    table = np.asarray(conv.q_hat_mod_p, dtype=np.uint64)
    p = np.asarray([[m.value] for m in ob.base], dtype=np.uint64)
    rlo = np.asarray([[m.const_ratio[0]] for m in ob.base], dtype=np.uint64)
    rhi = np.asarray([[m.const_ratio[1]] for m in ob.base], dtype=np.uint64)

    rng = np.random.default_rng(0)
    qs = np.asarray(ib_primes, dtype=np.uint64)

    def make(b):
        return w64.W64.from_np(
            rng.integers(0, 1 << 49, size=(b, 15, n), dtype=np.uint64)
            % qs[None, :, None]
        )

    def bench(name, x):
        def fn(a):
            y = bconv_matmul_pallas(a, table, p, rlo, rhi)
            s = jnp.sum(y.lo, dtype=jnp.uint32) + jnp.sum(y.hi, dtype=jnp.uint32)
            return w64.W64(a.lo + s, a.hi)

        step = jax.jit(lambda v, r: jax.lax.fori_loop(0, r, lambda i, a: fn(a), v))
        t0 = time.time()
        out = step(x, 1)
        np.asarray(out.lo[0, 0, :4])  # D2H fetch: the only reliable
        c = time.time() - t0          # completion barrier over the tunnel

        def timed(reps):
            t0 = time.time()
            out = step(x, reps)
            np.asarray(out.lo[0, 0, :4])
            return time.time() - t0

        timed(2)
        dt = (timed(2 + iters) - timed(2)) / iters
        log(f"{name}: {dt*1e3:.3f} ms (compile {c:.0f}s)")

    for nacc in (1, 2, 4):
        for rb in (32, 64):
            bconv_pallas.N_ACC = nacc
            bconv_pallas.MAX_ROW_BLOCK = rb
            bench(f"b=1 nacc={nacc} rb={rb}", make(1))
    bconv_pallas.N_ACC = 2
    bconv_pallas.MAX_ROW_BLOCK = 32
    bench("b=2 nacc=2 rb=32", make(2))
    bconv_pallas.N_ACC = 1
    bench("b=2 nacc=1 rb=32", make(2))


if __name__ == "__main__":
    main()
