"""NTT benchmark: fwd/inv latency over logN x limb-count grid.

Mirror of the reference's nvbench ntt_bench
(/root/reference/benchmark/ntt_bench.cu:8-149: 1D/2D fwd/inv, logN 8-17,
batch <= 20 limbs).  Prints median latency and effective throughput
(limb-transforms/s) per configuration.

Run:  python benchmarks/ntt_bench.py [--cpu] [--logn 12 16] [--limbs 1 8 20]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from common import base_parser, init_backend


def main():
    ap = base_parser("NTT fwd/inv latency/throughput")
    ap.add_argument("--logn", type=int, nargs="+", default=[12, 14, 16])
    ap.add_argument("--limbs", type=int, nargs="+", default=[1, 8, 20])
    args = ap.parse_args()
    jax = init_backend(args)

    import numpy as np

    from tpu_fhe.core.modulus import CoeffModulus
    from tpu_fhe.core.ntt_tables import make_ntt_tables
    from tpu_fhe.ops.ntt import build_device_ntt_tables, forward_ntt, inverse_ntt
    from tpu_fhe.ops.w64 import W64
    from tpu_fhe.utils.timer import ChronoTimer

    rng = np.random.default_rng(0)
    if args.csv:
        print("op,logn,limbs," + ChronoTimer.header())
    for log_n in args.logn:
        n = 1 << log_n
        max_l = max(args.limbs)
        mods = CoeffModulus.create(n, [50] * max_l)
        tables = build_device_ntt_tables(
            [make_ntt_tables(log_n, m.value) for m in mods]
        ).to_device()
        for limbs in args.limbs:
            t = tables.slice_limbs(list(range(limbs)))
            qs = np.array([[m.value] for m in mods[:limbs]], dtype=np.uint64)
            x = W64.from_np(
                rng.integers(0, 1 << 62, (limbs, n), dtype=np.uint64) % qs
            )
            fwd = jax.jit(lambda v: forward_ntt(v, t))
            inv = jax.jit(lambda v: inverse_ntt(v, t))
            y = jax.block_until_ready(fwd(x))
            for name, fn, arg in (("fwd", fwd, x), ("inv", inv, y)):
                ct = ChronoTimer(f"ntt_{name}").bench(
                    lambda: fn(arg), args.iters, args.warmup
                )
                thr = limbs / (ct.median_ms * 1e-3)
                if args.csv:
                    print(f"{name},{log_n},{limbs},{ct.row()}")
                else:
                    print(
                        f"logN={log_n:2d} limbs={limbs:3d} {name}: "
                        f"{ct.median_ms:8.3f} ms median "
                        f"({thr:10.0f} limb-NTT/s)"
                    )


if __name__ == "__main__":
    main()
