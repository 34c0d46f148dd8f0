"""BFV op sweep: encode/encrypt/add/BEHZ-multiply/relin/rotate medians.

Mirror of the reference's bfv_bench (/root/reference/benchmark/bfv_bench.cu).

Run:  python benchmarks/bfv_bench.py [--cpu] [--n 8192]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from common import base_parser, init_backend


def main():
    ap = base_parser("BFV operation sweep")
    ap.add_argument("--n", type=int, default=1 << 13)
    ap.add_argument("--data-bits", type=int, default=54)
    ap.add_argument("--num-data", type=int, default=3)
    ap.add_argument("--t-bits", type=int, default=20)
    args = ap.parse_args()
    jax = init_backend(args)

    import numpy as np

    from tpu_fhe.core.modulus import CoeffModulus, PlainModulus
    from tpu_fhe.core.params import EncryptionParameters, SchemeType
    from tpu_fhe.eval import bfv_eval as bv
    from tpu_fhe.scheme.batch_encoder import BatchEncoder
    from tpu_fhe.scheme.bfv import BfvTools
    from tpu_fhe.scheme.context import FheContext
    from tpu_fhe.scheme.keys import SecretKey
    from tpu_fhe.utils.timer import ChronoTimer

    n = args.n
    bits = [60] + [args.data_bits] * (args.num_data - 1) + [60]
    params = EncryptionParameters(
        scheme=SchemeType.bfv,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, bits)),
        special_modulus_size=1,
        plain_modulus=PlainModulus.batching(n, args.t_bits),
    )
    ctx = FheContext(params)
    enc = BatchEncoder(ctx)
    sk = SecretKey(ctx, key=1)
    tools = BfvTools(ctx)
    rlk = sk.relin_key()
    gk = sk.galois_key([1], include_conj=True)

    rng = np.random.default_rng(0)
    vals = rng.integers(0, tools.t.value, n, dtype=np.uint64)
    pt = enc.encode(vals)
    ct = tools.encrypt_symmetric(sk, pt)
    prod3 = bv.multiply(tools, ct, ct)

    ops = {
        "encode": lambda: enc.encode(vals),
        "encrypt_sym": lambda: tools.encrypt_symmetric(sk, pt),
        "decrypt": lambda: tools.decrypt(sk, ct),
        "add": lambda: bv.add(ctx, ct, ct),
        "multiply_behz": lambda: bv.multiply(tools, ct, ct),
        "relinearize": lambda: bv.relinearize(tools, prod3, rlk),
        "multiply_plain": lambda: bv.multiply_plain(tools, ct, pt),
        "rotate_rows": lambda: bv.rotate_rows(tools, ct, 1, gk),
        "mod_switch": lambda: bv.mod_switch_to_next(tools, ct),
    }
    if args.csv:
        print(ChronoTimer.header())
    for name, fn in ops.items():
        t = ChronoTimer(name).bench(
            lambda: jax.tree.leaves(fn()), args.iters, args.warmup
        )
        print(t.row() if args.csv else
              f"  {name:16s} {t.median_ms:9.3f} ms median "
              f"(+-{t.stdev_ms:.3f})")


if __name__ == "__main__":
    main()
