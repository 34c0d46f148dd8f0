"""CKKS basics: encrypted arithmetic end-to-end through the public API.

TPU-native analog of the reference's examples/3_ckks.cu walkthrough:
context, keys, encode/encrypt, add, multiply+relinearize+rescale, rotate,
conjugate, decrypt/decode — printing max error at each step.

Run:  python examples/ckks_basics.py [--n 4096]
"""

import os as _os
import sys as _sys

# make the repo importable when run as `python examples/<name>.py`
# without touching PYTHONPATH (the env's own PYTHONPATH must survive:
# it loads the TPU-plugin sitecustomize)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048, help="ring degree")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--bits", default="60,40,40,40,60",
                    help="comma-separated coeff-modulus bit sizes (last one "
                         "is the special modulus); all < 31 engages the q32 "
                         "single-word kernel regime")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tpu_fhe.core.modulus import CoeffModulus
    from tpu_fhe.core.params import EncryptionParameters, SchemeType
    from tpu_fhe.eval import evaluator as ev
    from tpu_fhe.scheme.ckks_encoder import CkksEncoder
    from tpu_fhe.scheme.context import FheContext
    from tpu_fhe.scheme.keys import SecretKey, encrypt_asymmetric

    import jax

    n = args.n
    t0 = time.time()
    bits = [int(b) for b in args.bits.split(",")]
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, bits)),
        special_modulus_size=1,
    )
    ctx = FheContext(params)
    print(f"[context] N={n}, logQP={sum(m.bit_count for m in params.coeff_modulus)} "
          f"bits, levels={params.size_Q}  ({time.time()-t0:.2f}s)")

    t0 = time.time()
    sk = SecretKey(ctx, key=2024)
    pk = sk.public_key()
    rlk = sk.relin_key()
    gk = sk.galois_key([1, 2, 4], include_conj=True)
    print(f"[keygen] secret/public/relin/galois ({time.time()-t0:.2f}s)")

    enc = CkksEncoder(ctx)
    slots = n // 2
    rng = np.random.default_rng(0)
    x = rng.standard_normal(slots)
    y = rng.standard_normal(slots)
    scale = 2.0 ** bits[1]  # rescale-friendly: matches the data primes

    ct_x = encrypt_asymmetric(ctx, pk, enc.encode(x, scale), jax.random.key(1))
    ct_y = sk.encrypt_symmetric(enc.encode(y, scale))

    def err(ct, expect):
        got = enc.decode(sk.decrypt(ct)).real
        return np.max(np.abs(got - expect))

    print(f"[encrypt] roundtrip err: x={err(ct_x, x):.2e} y={err(ct_y, y):.2e}")

    t0 = time.time()
    ct_sum = ev.add(ctx, ct_x, ct_y)
    print(f"[add] err={err(ct_sum, x+y):.2e} ({time.time()-t0:.2f}s)")

    t0 = time.time()
    ct_prod = ev.rescale_to_next(
        ctx, ev.relinearize(ctx, ev.multiply(ctx, ct_x, ct_y), rlk)
    )
    print(f"[mul+relin+rescale] err={err(ct_prod, x*y):.2e} "
          f"chain_index={ct_prod.chain_index} ({time.time()-t0:.2f}s)")

    t0 = time.time()
    ct_rot = ev.rotate(ctx, ct_x, 2, gk)
    print(f"[rotate 2] err={err(ct_rot, np.roll(x, -2)):.2e} ({time.time()-t0:.2f}s)")

    z = x + 1j * y
    ct_z = sk.encrypt_symmetric(enc.encode(z, scale))
    ct_conj = ev.conjugate(ctx, ct_z, gk)
    got = enc.decode(sk.decrypt(ct_conj))
    print(f"[conjugate] err={np.max(np.abs(got - z.conj())):.2e}")

    # depth-3 chain: ((x*y)*x)*y
    ct_d2 = ev.rescale_to_next(
        ctx,
        ev.relinearize(
            ctx, ev.multiply(ctx, ct_prod, _drop_to(ctx, ev, ct_x, ct_prod)), rlk
        ),
    )
    print(f"[depth2] err={err(ct_d2, x*x*y):.2e} chain_index={ct_d2.chain_index}")
    print("OK")


def _drop_to(ctx, ev, ct, ref):
    while ct.chain_index < ref.chain_index:
        ct = ev.mod_drop_to_next(ctx, ct)
    return ct


if __name__ == "__main__":
    main()
