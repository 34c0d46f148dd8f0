"""Modular u64 matmul (RNS base conversion) benchmark.

Counterpart of the reference's matmul_bench
(/root/reference/benchmark/matmul_bench.cu: uint64 modular GEMM variants) —
our equivalent kernel is the bconv accumulation y[m,N] = sum_k s[k,N] *
table[m,k] mod p (ops/bconv.py), the keyswitch/basis-conversion inner loop.

Run:  python benchmarks/modmatmul_bench.py [--cpu] [--n 65536] [--k 15 30]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from common import base_parser, init_backend


def main():
    ap = base_parser("modular base-conversion matmul")
    ap.add_argument("--n", type=int, default=1 << 14)
    ap.add_argument("--k", type=int, nargs="+", default=[8, 15, 30])
    ap.add_argument("--m", type=int, default=0, help="output limbs (default=k)")
    args = ap.parse_args()
    jax = init_backend(args)

    import numpy as np

    from tpu_fhe.core.modulus import CoeffModulus
    from tpu_fhe.ops.bconv import bconv_matmul
    from tpu_fhe.ops.w64 import W64
    from tpu_fhe.utils.timer import ChronoTimer

    rng = np.random.default_rng(0)
    n = args.n
    if args.csv:
        print("k,m,n," + ChronoTimer.header())
    for k in args.k:
        m = args.m or k
        mods = CoeffModulus.create(max(n, 4096), [55] * (k + m))
        in_q = np.array([[mm.value] for mm in mods[:k]], dtype=np.uint64)
        out_mods = mods[k:k + m]
        p = np.array([[mm.value] for mm in out_mods], dtype=np.uint64)
        rlo = np.array([[mm.const_ratio[0]] for mm in out_mods], dtype=np.uint64)
        rhi = np.array([[mm.const_ratio[1]] for mm in out_mods], dtype=np.uint64)
        table = rng.integers(0, p, (m, k), dtype=np.uint64)
        x = W64.from_np(rng.integers(0, in_q, (k, n), dtype=np.uint64))
        fn = jax.jit(lambda v: bconv_matmul(v, table, p, rlo, rhi))
        jax.block_until_ready(fn(x))
        t = ChronoTimer(f"bconv_{k}x{m}").bench(lambda: fn(x), args.iters, args.warmup)
        mulmods = k * m * n / (t.median_ms * 1e-3)
        if args.csv:
            print(f"{k},{m},{n},{t.row()}")
        else:
            print(f"  k={k:3d} m={m:3d} N={n}: {t.median_ms:8.3f} ms "
                  f"({mulmods / 1e9:6.2f} G mulmod-acc/s)")


if __name__ == "__main__":
    main()
