"""Spot-check: q32 single-word multiply (w64.mul_mod_q32) vs the W64
Barrett path at the logN=16 bootstrap shapes (same config as boot_micro's
mult_ext / square rows)."""

import os as _os
import sys

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from tpu_fhe.core.modulus import CoeffModulus
    from tpu_fhe.core.params import EncryptionParameters, SchemeType
    from tpu_fhe.eval import evaluator as ev, hoisting as hst
    from tpu_fhe.ops import w64
    from tpu_fhe.scheme.ciphertext import Ciphertext, Plaintext
    from tpu_fhe.scheme.context import FheContext

    n = 1 << 16
    depth = 22
    size_p = depth + 1
    mods = CoeffModulus.create_composite(
        n, 58, depth, degree=2, anchor_bits=30,
        special_bits=30, special_count=size_p,
    )
    params = EncryptionParameters(
        scheme=SchemeType.ckks, poly_modulus_degree=n, allow_insecure=True,
        coeff_modulus=tuple(mods), special_modulus_size=size_p,
        composite_degree=2,
    )
    t0 = time.time()
    ctx = FheContext(params)
    ci = 5
    level = ctx.level(ci)
    L = level.size
    qlp_sz = L + ctx.params.size_P
    print(f"context ci={ci} L={L} QlP={qlp_sz} ({time.time()-t0:.1f}s)",
          flush=True)

    rng = np.random.default_rng(0)
    qs = np.array([m.value for m in level.base.base], dtype=np.uint64)
    qlp = np.concatenate([qs, np.array(
        [m.value for m in ctx.key_modulus[-ctx.params.size_P:]],
        dtype=np.uint64)])
    cx = w64.W64.from_np(
        rng.integers(0, 1 << 62, size=(2, qlp_sz, n), dtype=np.uint64)
        % qlp[None, :, None])
    pt = w64.W64.from_np(
        rng.integers(0, 1 << 62, size=(qlp_sz, n), dtype=np.uint64)
        % qlp[:, None])
    ct2 = w64.W64.from_np(
        rng.integers(0, 1 << 62, size=(2, L, n), dtype=np.uint64)
        % qs[None, :, None])
    ct_ext = Ciphertext(cx, chain_index=ci, scale=2.0**58, is_ntt_form=True)
    ptx = Plaintext(data=pt, chain_index=ci, scale=2.0**58, is_ntt_form=True)
    ct_q = Ciphertext(ct2, chain_index=ci, scale=2.0**58, is_ntt_form=True)

    def fold(x, y):
        import jax.numpy as jnp

        leaf = jax.tree_util.tree_leaves(y)[0]
        s = jnp.sum(leaf.reshape(-1)[:8], dtype=leaf.dtype)
        return jax.tree_util.tree_map(lambda v: v + s.astype(v.dtype), x)

    def measure(name, fn, x, iters=10):
        def chain(v, r):
            return jax.lax.fori_loop(0, r, lambda i, a: fn(a), v)

        step = jax.jit(chain, static_argnums=1)

        def fetch(o):
            np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[:4])

        t0 = time.time()
        fetch(step(x, 1))
        print(f"  [{name}] compile {time.time()-t0:.1f}s", flush=True)
        fetch(step(x, 2))

        def timed(reps):
            t0 = time.time()
            fetch(step(x, reps))
            return time.time() - t0

        trials = sorted((timed(2 + iters) - timed(2)) / iters
                        for _ in range(3))
        print(f"{name:<14} {trials[1]*1e3:>9.3f} ms", flush=True)

    measure("mult_ext", lambda x: fold(x, hst.eval_mult_ext(
        ctx, ct_ext.with_data(x), ptx).data), cx)
    # tensor product alone (no relin): isolates the multiply change
    measure("square_tp", lambda x: fold(x, ev.square(
        ctx, ct_q.with_data(x)).data[:2]), ct2)


if __name__ == "__main__":
    main()
