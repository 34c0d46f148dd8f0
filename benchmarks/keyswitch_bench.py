"""Hybrid keyswitch benchmark: modup / full keyswitch vs dropped levels.

Mirror of the reference's keyswitch_bench
(/root/reference/benchmark/keyswitch_bench.cu:10-111+: N=2^15, 30 data +
15 special 60-bit limbs, latency as levels drop).

Run:  python benchmarks/keyswitch_bench.py [--cpu] [--n 32768]
      [--num-data 30] [--size-p 15] [--drops 0 10 20]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from common import base_parser, init_backend, make_ckks


def main():
    ap = base_parser("hybrid keyswitch latency vs dropped levels")
    ap.add_argument("--n", type=int, default=1 << 15)
    ap.add_argument("--data-bits", type=int, default=59)
    ap.add_argument("--num-data", type=int, default=30)
    ap.add_argument("--size-p", type=int, default=15)
    ap.add_argument("--drops", type=int, nargs="+", default=[0, 10, 20])
    args = ap.parse_args()
    jax = init_backend(args)

    import numpy as np

    from tpu_fhe.eval import evaluator as ev
    from tpu_fhe.scheme.ciphertext import Ciphertext
    from tpu_fhe.utils.timer import ChronoTimer

    ctx, enc, sk = make_ckks(
        args.n, args.data_bits, args.num_data, args.size_p
    )
    rlk = sk.relin_key()
    rng = np.random.default_rng(0)
    x = rng.standard_normal(ctx.n // 2)
    ct0 = sk.encrypt_symmetric(enc.encode(x, 2.0 ** args.data_bits))

    if args.csv:
        print("op,levels_dropped,limbs," + ChronoTimer.header())
    for drop in args.drops:
        if drop >= args.num_data - 1:
            continue
        ct = ct0
        for _ in range(drop):
            ct = ev.mod_drop_to_next(ctx, ct)
        level = ctx.level(ct.chain_index)

        modup = jax.jit(lambda c2: ev.modup(ctx, level, c2))
        ks = jax.jit(lambda c2: ev.keyswitch_core(ctx, level, c2, rlk))
        c2 = ct.data[1]
        jax.block_until_ready(modup(c2))
        jax.block_until_ready(ks(c2))

        t_mu = ChronoTimer("modup").bench(lambda: modup(c2), args.iters, args.warmup)
        t_ks = ChronoTimer("keyswitch").bench(lambda: ks(c2), args.iters, args.warmup)
        if args.csv:
            print(f"modup,{drop},{level.size},{t_mu.row()}")
            print(f"keyswitch,{drop},{level.size},{t_ks.row()}")
        else:
            print(
                f"drop={drop:3d} (limbs={level.size:3d}): "
                f"modup {t_mu.median_ms:8.2f} ms | "
                f"keyswitch {t_ks.median_ms:8.2f} ms "
                f"({1e3 / t_ks.median_ms:7.1f} ks/s)"
            )


if __name__ == "__main__":
    main()
