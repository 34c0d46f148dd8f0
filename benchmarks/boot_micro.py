"""Constituent-kernel micro-bench at the bootstrap's own shapes.

The warm logN=16 bootstrap (10.5 s q32 / 34.8 s 60-bit, r03) is far above
the sum of its roofline kernels — this bench times each constituent AT THE
BOOTSTRAP SHAPE so the gap can be attributed instead of guessed:

    ip          hoisted inner product (ks_pallas)         x ~g*levels
    modup       digit decomposition                       x ~levels
    moddown     KeySwitchDown (both components)           x ~b*levels
    galois      apply_galois_ntt gather on an ext ct      x ~g*levels
    mult_ext    plaintext multiply at QlP                 x ~g*b*levels
    add_ext     ext add                                   x ~g*b*levels
    square      EvalSquare+relin (sine PS workhorse)      x ~deg
    rescale     divide_and_round_q_last                   x ~deg

Usage:
    python benchmarks/boot_micro.py --logn 16 --q32        # TPU
    python benchmarks/boot_micro.py --cpu --logn 10 --q32  # structure check
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
    ap.add_argument("--logn", type=int, default=16)
    ap.add_argument("--q32", action="store_true")
    ap.add_argument("--levels", type=int, default=11,
                    help="logical levels remaining at the measured point "
                         "(bootstrap C2S runs near the top of the chain)")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from tpu_fhe.core.modulus import CoeffModulus
    from tpu_fhe.core.params import EncryptionParameters, SchemeType
    from tpu_fhe.eval import auto, evaluator as ev, hoisting as hst
    from tpu_fhe.ops import w64
    from tpu_fhe.ops.galois import apply_galois_ntt, galois_elt_from_step
    from tpu_fhe.scheme.ciphertext import Ciphertext, Plaintext
    from tpu_fhe.scheme.context import FheContext
    from tpu_fhe.scheme.keys import SecretKey

    n = 1 << args.logn
    t0 = time.time()
    if args.q32:
        depth = 22  # the ResNet/bootstrap chain depth at the q32 config
        size_p = depth + 1
        mods = CoeffModulus.create_composite(
            n, 58, depth, degree=2, anchor_bits=30,
            special_bits=30, special_count=size_p,
        )
        params = EncryptionParameters(
            scheme=SchemeType.ckks,
            poly_modulus_degree=n,
            allow_insecure=True,
            coeff_modulus=tuple(mods),
            special_modulus_size=size_p,
            composite_degree=2,
        )
    else:
        depth = 22
        bits = [60] + [59] * depth + [60] * 10
        params = EncryptionParameters(
            scheme=SchemeType.ckks,
            poly_modulus_degree=n,
            allow_insecure=True,
            coeff_modulus=tuple(CoeffModulus.create(n, bits)),
            special_modulus_size=10,
        )
    ctx = FheContext(params)
    # C2S runs near the chain top: drop only a couple of logical levels
    d = auto.composite_degree(ctx)
    ci = 1 + 2 * d  # a high level, like the first C2S stage
    level = ctx.level(ci)
    L = level.size
    size_p = ctx.params.size_P
    qlp_sz = L + size_p
    beta = level.ks.beta
    log(f"context N={n} ci={ci} L={L} P={size_p} beta={beta} QlP={qlp_sz} "
        f"({time.time()-t0:.1f}s)")

    t0 = time.time()
    sk = SecretKey(ctx, key=5)
    rlk = sk.relin_key()
    gk = sk.galois_key([3])
    rot_key = gk.key_for_elt(galois_elt_from_step(3, n))
    jax.block_until_ready(rlk.data)
    log(f"keygen ({time.time()-t0:.1f}s)")

    rng = np.random.default_rng(0)
    qs = np.array([m.value for m in level.base.base], dtype=np.uint64)
    qlp = np.concatenate([qs, np.array(
        [m.value for m in ctx.key_modulus[-size_p:]], dtype=np.uint64)])

    def rnd(shape, mod):
        return w64.W64.from_np(
            rng.integers(0, 1 << 62, size=shape, dtype=np.uint64) % mod
        )

    c2 = rnd((L, n), qs[:, None])
    tmu = rnd((beta, qlp_sz, n), qlp[None, :, None])
    cx = rnd((2, qlp_sz, n), qlp[None, :, None])
    ct2 = rnd((2, L, n), qs[None, :, None])
    pt_ext = rnd((qlp_sz, n), qlp[:, None])

    ct_ext = Ciphertext(cx, chain_index=ci, scale=2.0**58, is_ntt_form=True)
    sf, _ = auto.scaling_factors(ctx)
    ct_q = Ciphertext(ct2, chain_index=ci, scale=sf[0], is_ntt_form=True)
    pt = Plaintext(data=pt_ext, chain_index=ci, scale=2.0**58,
                   is_ntt_form=True)
    elt = galois_elt_from_step(3, n)

    def fold(x, y):
        leaf = jax.tree_util.tree_leaves(y)[0]
        import jax.numpy as jnp

        s = jnp.sum(leaf.reshape(-1)[:8], dtype=leaf.dtype)
        return jax.tree_util.tree_map(lambda v: v + s.astype(v.dtype), x)


    def measure(name, fn, x):
        import jax.numpy as jnp

        def chain(v, r):
            return jax.lax.fori_loop(0, r, lambda i, a: fn(a), v)

        step = jax.jit(chain, static_argnums=1)

        def fetch(o):
            np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[:4])

        t0 = time.time()
        fetch(step(x, 1))
        log(f"  [{name}] compile {time.time()-t0:.1f}s")
        fetch(step(x, 2))

        def timed(reps):
            t0 = time.time()
            fetch(step(x, reps))
            return time.time() - t0

        trials = sorted(
            (timed(2 + args.iters) - timed(2)) / args.iters
            for _ in range(3)
        )
        dt = trials[1]
        print(f"{name:<12} {dt*1e3:>9.3f} ms", flush=True)
        return dt

    # each fn: W64 -> W64 (data-chained through fold so XLA can't elide)
    measure("ip", lambda x: fold(x, ev.key_inner_product(
        ctx, level, x, rlk)), tmu)
    measure("modup", lambda x: fold(x, ev.modup(
        ctx, level, x[0, :L], is_ntt=True)), tmu)
    measure("moddown", lambda x: fold(x, ev.moddown_from_ntt(
        ctx, level, x, output_ntt=True)), cx)
    for impl in ("gather", "decomp", "decomp_mm"):
        _os.environ["TPU_FHE_GALOIS_IMPL"] = impl
        measure(f"galois[{impl}]",
                (lambda imp: lambda x: fold(x, apply_galois_ntt(x, elt, n)))(impl),
                cx)
    _os.environ.pop("TPU_FHE_GALOIS_IMPL", None)
    measure("mult_ext", lambda x: fold(x, hst.eval_mult_ext(
        ctx, ct_ext.with_data(x), pt).data), cx)
    measure("add_ext", lambda x: fold(x, hst.eval_add_ext(
        ctx, ct_ext.with_data(x), ct_ext).data), cx)
    measure("fastrot", lambda x: fold(x, hst.fast_rotation_ext(
        ctx, ct_q, x, elt, rot_key, True).data), tmu)
    measure("square", lambda x: fold(x, ev.relinearize(
        ctx, ev.square(ctx, ct_q.with_data(x)), rlk).data), ct2)
    measure("rescale", lambda x: fold(x, (
        ev.rescale_composite(ctx, ct_q.with_data(x), d)
        if d > 1 else ev.rescale_to_next(ctx, ct_q.with_data(x))).data), ct2)


if __name__ == "__main__":
    main()
