"""CKKS op sweep: encode/encrypt/add/mult/relin/rescale/rotate medians.

Mirror of the reference's ckks_bench (/root/reference/benchmark/ckks_bench.cu,
ChronoTimer CSV stats per op).

Run:  python benchmarks/ckks_bench.py [--cpu] [--n 16384] [--num-data 8]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from common import base_parser, init_backend, make_ckks


def main():
    ap = base_parser("CKKS operation sweep")
    ap.add_argument("--n", type=int, default=1 << 14)
    ap.add_argument("--data-bits", type=int, default=40)
    ap.add_argument("--num-data", type=int, default=8)
    ap.add_argument("--size-p", type=int, default=1)
    args = ap.parse_args()
    jax = init_backend(args)

    import numpy as np

    from tpu_fhe.eval.jit import Evaluator
    from tpu_fhe.scheme.keys import encrypt_asymmetric
    from tpu_fhe.utils.timer import ChronoTimer

    ctx, enc, sk = make_ckks(args.n, args.data_bits, args.num_data, args.size_p)
    ev = Evaluator(ctx)
    pk = sk.public_key()
    rlk = sk.relin_key()
    gk = sk.galois_key([1], include_conj=True)
    rng = np.random.default_rng(0)
    scale = 2.0 ** args.data_bits
    x = rng.standard_normal(ctx.n // 2)
    pt = enc.encode(x, scale)
    ct = sk.encrypt_symmetric(pt)
    key = jax.random.key(7)

    prod3 = ev.multiply(ct, ct)
    lin = ev.relinearize(prod3, rlk)

    ops = {
        "encode": lambda: enc.encode(x, scale),
        "decode": lambda: enc.decode(sk.decrypt(ct)),
        "encrypt_sym": lambda: sk.encrypt_symmetric(pt),
        "encrypt_asym": lambda: encrypt_asymmetric(ctx, pk, pt, key),
        "add": lambda: ev.add(ct, ct),
        "multiply": lambda: ev.multiply(ct, ct),
        "relinearize": lambda: ev.relinearize(prod3, rlk),
        "mult_relin": lambda: ev.multiply_relin(ct, ct, rlk),
        "rescale": lambda: ev.rescale(lin),
        "rotate": lambda: ev.rotate(ct, 1, gk),
        "conjugate": lambda: ev.conjugate(ct, gk),
    }
    if args.csv:
        print(ChronoTimer.header())
    for name, fn in ops.items():
        t = ChronoTimer(name).bench(
            lambda: jax.tree.leaves(fn()), args.iters, args.warmup
        )
        print(t.row() if args.csv else
              f"  {name:14s} {t.median_ms:9.3f} ms median "
              f"(+-{t.stdev_ms:.3f})")


if __name__ == "__main__":
    main()
