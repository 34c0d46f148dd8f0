"""Per-kernel roofline table: bytes moved vs achieved bandwidth.

For each hot kernel (forward NTT, modup, keyswitch inner product, moddown,
full relinearize) this prints:

    kernel | ms | bytes moved (analytic HBM traffic) | GB/s | % of peak

Peak defaults to 819 GB/s (TPU v5e HBM).  "Bytes moved" counts mandatory
HBM traffic only — inputs read once + outputs written once + key/twiddle
streams — i.e. the memory-bound floor.  A kernel far below peak at these
byte counts is compute-bound (the u32-pair emulation arithmetic), not
bandwidth-bound; that gap is the roofline headroom the VERDICT asks to
publish.

Usage:
    python benchmarks/roofline.py                 # TPU, 60-bit config
    python benchmarks/roofline.py --data-bits 29  # q32 regime
    python benchmarks/roofline.py --cpu           # structure check only
"""

import os as _os
import sys

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np

PEAK_GBS = 819.0  # TPU v5e HBM


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--logn", type=int, default=15)
    ap.add_argument("--data-bits", type=int, default=50)
    ap.add_argument("--num-data", type=int, default=30)
    ap.add_argument("--size-p", type=int, default=15)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--peak", type=float, default=PEAK_GBS)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from tpu_fhe.core.modulus import CoeffModulus
    from tpu_fhe.core.params import EncryptionParameters, SchemeType
    from tpu_fhe.eval import evaluator as ev
    from tpu_fhe.ops import w64
    from tpu_fhe.ops.ntt import forward_ntt
    from tpu_fhe.scheme.context import FheContext
    from tpu_fhe.scheme.keys import SecretKey

    n = 1 << args.logn
    kb = 60 if args.data_bits > 30 else args.data_bits
    bits = [kb] + [args.data_bits] * (args.num_data - 1) + [kb] * args.size_p
    t0 = time.time()
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, bits)),
        special_modulus_size=args.size_p,
    )
    ctx = FheContext(params)
    level = ctx.level(1)
    L = level.size
    beta = level.ks.beta
    size_p = args.size_p
    qlp_sz = L + size_p
    log(f"context N={n} L={L} P={size_p} beta={beta} ({time.time()-t0:.1f}s)")

    t0 = time.time()
    sk = SecretKey(ctx, key=5)
    rlk = sk.relin_key()
    jax.block_until_ready(rlk.data)
    log(f"keygen ({time.time()-t0:.1f}s)")

    rng = np.random.default_rng(0)
    qs = np.array([m.value for m in level.base.base], dtype=np.uint64)
    qlp = np.concatenate([qs, np.array(
        [m.value for m in ctx.key_modulus[-size_p:]], dtype=np.uint64)])

    c2 = (rng.integers(0, 1 << 62, size=(L, n), dtype=np.uint64)
          % qs[:, None])
    c2w = w64.W64.from_np(c2)
    tmu = (rng.integers(0, 1 << 62, size=(beta, qlp_sz, n), dtype=np.uint64)
           % qlp[None, :, None])
    tmu_w = w64.W64.from_np(tmu)
    cx = (rng.integers(0, 1 << 62, size=(2, qlp_sz, n), dtype=np.uint64)
          % qlp[None, :, None])
    cx_w = w64.W64.from_np(cx)
    ct3 = (rng.integers(0, 1 << 62, size=(3, L, n), dtype=np.uint64)
           % qs[None, :, None])
    from tpu_fhe.scheme.ciphertext import Ciphertext

    ct3w = w64.W64.from_np(ct3)

    def fold(x, y):
        s = (jnp.sum(y.lo, dtype=jnp.uint32) + jnp.sum(y.hi, dtype=jnp.uint32))
        return w64.W64(x.lo + s, x.hi)

    def chain(fn, x, reps):
        return jax.lax.fori_loop(0, reps, lambda i, a: fn(a), x)

    def measure(fn, x):
        step = jax.jit(lambda v, r: chain(fn, v, r))

        def fetch(o):
            leaf = jax.tree_util.tree_leaves(o)[0]
            np.asarray(leaf.reshape(-1)[:4])

        t0 = time.time()
        fetch(step(x, 1))
        log(f"  compile {time.time()-t0:.1f}s")
        fetch(step(x, 2))

        def timed(reps):
            t0 = time.time()
            fetch(step(x, reps))
            return time.time() - t0

        # marginal cost, median of 3 trials (single pairs go negative in
        # the noise when per-call transport overhead ~ kernel time)
        trials = sorted(
            (timed(2 + args.iters) - timed(2)) / args.iters
            for _ in range(3)
        )
        return trials[1]

    # bytes per residue word: q32 residues live in one compact u32 plane
    # end-to-end since r05 (ops return W64(lo, None)); the 60-bit regime
    # moves (lo, hi) pairs.  r03/r04 counted 8 B for q32 too — divide
    # their % figures by 2 when comparing.
    B = 4 if args.data_bits <= 30 else 8
    kernels = []

    # forward NTT over all L limbs: in + out
    kernels.append((
        "ntt fwd (L limbs)",
        lambda x: fold(x, forward_ntt(x, level.ntt)),
        c2w,
        2 * L * n * B,
    ))
    # modup: read (L,N), write (beta, QlP, N)
    kernels.append((
        "modup",
        lambda x: fold(x, ev.modup(ctx, level, x, is_ntt=True)),
        c2w,
        (L + beta * qlp_sz) * n * B + L * n * B,   # + iNTT intermediate
    ))
    # inner product: digits + evk (both polys) + out
    kernels.append((
        "ks inner product",
        lambda x: fold(x, ev.key_inner_product(ctx, level, x, rlk)),
        tmu_w,
        (beta * qlp_sz + beta * 2 * qlp_sz + 2 * qlp_sz) * n * B,
    ))
    # moddown both components: in + out (+ P-part iNTT intermediates)
    kernels.append((
        "moddown (2 comps)",
        lambda x: fold(x, ev.moddown_from_ntt(ctx, level, x, output_ntt=True)),
        cx_w,
        (2 * qlp_sz + 2 * L) * n * B + 2 * size_p * n * B,
    ))
    # full relinearize: ct in/out + evk stream
    proto = Ciphertext(ct3w, chain_index=1, scale=2.0**40)

    def relin_sp(x):
        out = ev.relinearize(ctx, proto.with_data(x), rlk)
        return fold(x, out.data)

    kernels.append((
        "relinearize e2e",
        relin_sp,
        ct3w,
        (3 * L + 2 * L + beta * 2 * qlp_sz) * n * B
        + (L + 2 * beta * qlp_sz + 2 * qlp_sz) * n * B,  # modup/ip/moddown streams
    ))

    print(f"{'kernel':<18} {'ms':>8} {'MB moved':>9} {'GB/s':>8} {'% peak':>7}")
    for name, fn, x, nbytes in kernels:
        log(f"[{name}]")
        dt = measure(fn, x)
        gbs = nbytes / dt / 1e9
        print(f"{name:<18} {dt*1e3:>8.3f} {nbytes/1e6:>9.1f} {gbs:>8.1f} "
              f"{gbs/args.peak:>6.1%}")


if __name__ == "__main__":
    main()
