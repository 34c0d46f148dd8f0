"""MXU (int8 dot) vs Pallas (VPU) base-conversion matmul on the live backend.

Marginal-cost methodology (chained fori_loop, D2H fetch barrier), shapes
from the keyswitch bench config: N=2^15, modup digit 15 -> 30 and moddown
15 -> 30 with a (2,) component batch.
"""

import os as _os
import sys

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(n=1 << 15, iters=30):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from tpu_fhe.core.modulus import CoeffModulus
    from tpu_fhe.ops import w64
    from tpu_fhe.ops.bconv_mxu import bconv_matmul_mxu
    from tpu_fhe.ops.bconv_pallas import bconv_matmul_pallas
    from tpu_fhe.ops.bconv_mxu_pallas import bconv_matmul_mxu_pallas

    log(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)

    def bench(name, fn, x):
        def fetch(o):
            leaf = jax.tree_util.tree_leaves(o)[0]
            np.asarray(leaf.reshape(-1)[:4])

        def chain(v, reps):
            def body(i, a):
                out = fn(a)
                s = (jnp.sum(out.lo, dtype=jnp.uint32)
                     + jnp.sum(out.hi, dtype=jnp.uint32))
                return w64.W64(a.lo + s, a.hi)
            return jax.lax.fori_loop(0, reps, body, v)

        step = jax.jit(chain)
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

    for (k_in, k_out, lead, tag) in [
        (15, 30, (), "modup digit (15->30)"),
        (15, 30, (2,), "moddown (15->30, batch 2)"),
        (30, 15, (2,), "wide (30->15, batch 2)"),
    ]:
        ps = CoeffModulus.create(1 << 13, [59] * k_out)
        p = np.array([[m.value] for m in ps], dtype=np.uint64)
        rlo = np.array([[m.const_ratio[0]] for m in ps], dtype=np.uint64)
        rhi = np.array([[m.const_ratio[1]] for m in ps], dtype=np.uint64)
        M = rng.integers(0, 1 << 59, size=(k_out, k_in), dtype=np.uint64)
        x = rng.integers(0, 1 << 59, size=lead + (k_in, n), dtype=np.uint64)
        xw = w64.W64.from_np(x)
        log(f"--- {tag}, N={n}")
        a = bench("pallas", lambda v: bconv_matmul_pallas(v, M, p, rlo, rhi), xw)
        b = bench("mxu   ", lambda v: bconv_matmul_mxu(v, M, p, rlo, rhi), xw)
        c = bench("mxu-pl", lambda v: bconv_matmul_mxu_pallas(v, M, p, rlo, rhi), xw)
        log(f"speedup: xla-mxu {a/b:.2f}x, fused {a/c:.2f}x")

    # bit-exactness on the live backend
    got_a = bconv_matmul_pallas(xw, M, p, rlo, rhi).to_np()
    got_b = bconv_matmul_mxu(xw, M, p, rlo, rhi).to_np()
    got_c = bconv_matmul_mxu_pallas(xw, M, p, rlo, rhi).to_np()
    ok = np.array_equal(got_a, got_b) and np.array_equal(got_a, got_c)
    log("exact match" if ok else "MISMATCH!")


if __name__ == "__main__":
    main()
