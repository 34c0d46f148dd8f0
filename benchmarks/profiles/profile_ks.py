"""Stage-split timing of the hybrid keyswitch on the live backend.

Times modup / inner-product / moddown / full relinearize separately with
the same marginal-cost methodology as bench.py (chained fori_loop, dynamic
trip count) so dispatch overhead cancels.
"""

import os as _os
import sys

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(n=1 << 15, data_bits=50, num_data=30, size_p=15, iters=30):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from tpu_fhe.core.modulus import CoeffModulus
    from tpu_fhe.core.params import EncryptionParameters, SchemeType
    from tpu_fhe.eval import evaluator as ev
    from tpu_fhe.ops import w64
    from tpu_fhe.scheme.ciphertext import Ciphertext
    from tpu_fhe.scheme.context import FheContext
    from tpu_fhe.scheme.keys import SecretKey

    # q32 regime (all primes < 2^30): every limb takes data_bits
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
    level = ctx.level(1)
    log(f"context N={n} limbs={len(bits)} ({time.time()-t0:.1f}s)")

    t0 = time.time()
    sk = SecretKey(ctx, key=5)
    rlk = sk.relin_key()
    jax.block_until_ready(rlk.data)
    log(f"keygen ({time.time()-t0:.1f}s)")

    rng = np.random.default_rng(0)
    qs = np.array([m.value for m in level.base.base], dtype=np.uint64)
    c2 = (
        rng.integers(0, 1 << 60, size=(level.size, n), dtype=np.uint64)
        % qs[:, None]
    )
    c2w = w64.W64.from_np(c2)

    size_qlp = level.size + size_p
    qlp = np.concatenate([qs, np.array(
        [m.value for m in ctx.key_modulus[-size_p:]], dtype=np.uint64)])
    tmu = (
        rng.integers(0, 1 << 62, size=(level.ks.beta, size_qlp, n), dtype=np.uint64)
        % qlp[None, :, None]
    )
    tmu_w = w64.W64.from_np(tmu)
    cx = (rng.integers(0, 1 << 62, size=(2, size_qlp, n), dtype=np.uint64)
          % qlp[None, :, None])
    cx_w = w64.W64.from_np(cx)

    def chain(fn, x, reps):
        def body(i, a):
            out = fn(a)
            return out

        return jax.lax.fori_loop(0, reps, body, x)

    def bench(name, fn, x):
        # fn must be shape-preserving for the chain; measure marginal time
        step = jax.jit(lambda v, r: chain(fn, v, r))

        def fetch(o):
            # D2H fetch: block_until_ready does not reliably block over
            # the axon tunnel; a tiny fetch is the completion barrier
            leaf = jax.tree_util.tree_leaves(o)[0]
            np.asarray(leaf.reshape(-1)[:4])

        t0 = time.time()
        fetch(step(x, 1))
        log(f"{name}: compile {time.time()-t0:.1f}s")

        def timed(reps):
            t0 = time.time()
            fetch(step(x, reps))
            return time.time() - t0

        timed(2)
        dt = (timed(2 + iters) - timed(2)) / iters
        log(f"{name}: {dt*1e3:.3f} ms")
        return dt

    import jax.numpy as jnp

    def fold(x, y):
        """Shape-preserving carry of x that data-depends on ALL of y
        (prevents XLA from dead-code-eliminating any part of y)."""
        s = (jnp.sum(y.lo, dtype=jnp.uint32) + jnp.sum(y.hi, dtype=jnp.uint32))
        return w64.W64(x.lo + s, x.hi)

    # modup: (L, N) -> (beta, QlP, N)
    def modup_sp(x):
        return fold(x, ev.modup(ctx, level, x, is_ntt=True))

    # inner product: (beta, QlP, N) -> (2, QlP, N)
    def inner_sp(x):
        return fold(x, ev.key_inner_product(ctx, level, x, rlk))

    # moddown: (2, QlP, N) -> (2, Ql, N)
    def moddown_sp(x):
        return fold(x, ev.moddown_from_ntt(ctx, level, x, output_ntt=True))

    bench("modup   ", modup_sp, c2w)
    bench("inner   ", inner_sp, tmu_w)
    bench("moddown ", moddown_sp, cx_w)

    # full relinearize for reference
    data = rng.integers(0, 1 << 59, size=(3, level.size, n), dtype=np.uint64) % qs[None, :, None]
    ct = Ciphertext(w64.W64.from_np(data), chain_index=1, scale=2.0**40)

    def relin_sp(a):
        out = ev.relinearize(ctx, a, rlk)
        return a.with_data(w64.concat([out.data, out.data[0:1]], axis=0))

    bench("relin   ", relin_sp, ct)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=15)
    ap.add_argument("--bits", type=int, default=50)
    ap.add_argument("--data", type=int, default=30)
    ap.add_argument("--special", type=int, default=15)
    a = ap.parse_args()
    main(1 << a.logn, a.bits, a.data, a.special)
