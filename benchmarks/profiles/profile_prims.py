"""Primitive-level timing at the bench shape (N=2^15, 30+15 limbs):
NTT/iNTT per limb batch, bconv matmuls at modup/moddown shapes, and the
elementwise scale ops, so keyswitch stage costs decompose exactly.
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
    import jax.numpy as jnp
    from tpu_fhe.core.modulus import CoeffModulus
    from tpu_fhe.core.params import EncryptionParameters, SchemeType
    from tpu_fhe.ops import w64
    from tpu_fhe.ops.bconv import bconv_matmul
    from tpu_fhe.ops.ntt import forward_ntt, inverse_ntt
    from tpu_fhe.scheme.context import FheContext

    bits = [60] + [data_bits] * (num_data - 1) + [60] * size_p
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
    ks = level.ks
    log(f"context N={n} limbs={len(bits)} ({time.time()-t0:.1f}s)")

    rng = np.random.default_rng(0)

    def rand(shape_limbs, qs):
        qs = np.asarray(qs, dtype=np.uint64).reshape(-1)
        return w64.W64.from_np(
            rng.integers(0, 1 << 59, size=shape_limbs + (n,), dtype=np.uint64)
            % qs[(None,) * (len(shape_limbs) - 1) + (slice(None), None)]
        )

    def fold(x, y):
        s = jnp.sum(y.lo, dtype=jnp.uint32) + jnp.sum(y.hi, dtype=jnp.uint32)
        return w64.W64(x.lo + s, x.hi)

    def bench(name, fn, x):
        step = jax.jit(lambda v, r: jax.lax.fori_loop(0, r, lambda i, a: fn(a), v))

        def fetch(o):
            leaf = jax.tree_util.tree_leaves(o)[0]
            np.asarray(leaf.reshape(-1)[:4])

        t0 = time.time()
        fetch(step(x, 1))
        c = time.time() - t0

        def timed(reps):
            t0 = time.time()
            fetch(step(x, reps))
            return time.time() - t0

        timed(2)
        dt = (timed(2 + iters) - timed(2)) / iters
        log(f"{name}: {dt*1e3:.3f} ms  (compile {c:.0f}s)")
        return dt

    # --- NTT at the three batch shapes the keyswitch uses -----------------
    x30 = rand((30,), level.mod.q)
    bench("fwd_ntt 30L ", lambda a: forward_ntt(a, level.ntt), x30)
    bench("inv_ntt 30L ", lambda a: inverse_ntt(a, level.ntt), x30)

    x2_30 = rand((2, 30), level.mod.q)
    bench("fwd_ntt 2x30", lambda a: forward_ntt(a, level.ntt), x2_30)

    x2_15 = rand((2, 15), ks.p_mod.q)
    bench("inv_ntt 2x15", lambda a: inverse_ntt(a, ks.p_ntt), x2_15)

    # --- bconv shapes ------------------------------------------------------
    # modup digit: 15 -> 30 (complement), x2 digits
    dt0 = ks.digits[0]
    xd = rand((15,), level.mod.q[dt0.start:dt0.end])
    bench(
        "bconv 15->30",
        lambda a: fold(a, bconv_matmul(
            a, dt0.qhat_mod_p, dt0.comp_mod.q, dt0.comp_mod.ratio_lo,
            dt0.comp_mod.ratio_hi)),
        xd,
    )

    # moddown: P(15) -> Ql(30) for 2 components
    xp = rand((2, 15), ks.p_mod.q)
    bench(
        "bconv 2x15->30",
        lambda a: fold(a, bconv_matmul(
            a, ks.p_hat_mod_q, level.mod.q, level.mod.ratio_lo,
            level.mod.ratio_hi)),
        xp,
    )

    # --- elementwise -------------------------------------------------------
    from tpu_fhe.ops import w64 as mm

    bench(
        "shoup 30L    ",
        lambda a: mm.mul_mod_shoup(
            a, ks.part_qhatinv, ks.part_qhatinv_shoup, level.mod.q),
        x30,
    )

    # --- Galois automorphism gather (the hoisted-rotation tail) -------------
    from tpu_fhe.ops.galois import apply_galois_ntt, galois_elt_from_step

    elt = galois_elt_from_step(3, n)
    x2_45 = rand((2, 45), np.concatenate([level.mod.q, ks.p_mod.q]))
    bench("galois 2x45  ", lambda a: apply_galois_ntt(a, elt, n), x2_45)


if __name__ == "__main__":
    main()
