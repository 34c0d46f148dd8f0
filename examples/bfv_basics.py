"""BFV basics: exact encrypted integer arithmetic through the public API.

TPU-native analog of the reference's examples/1_bfv.cu walkthrough:
context, batching encoder, encrypt (sym+asym), add, BEHZ multiply +
relinearize, rotations, modulus switching, noise budgets — checking exact
equality at each step.

Run:  python examples/bfv_basics.py [--n 4096] [--cpu]
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
    ap.add_argument("--n", type=int, default=4096, help="ring degree")
    ap.add_argument("--t-bits", type=int, default=20, help="plain modulus bits")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from tpu_fhe.core.modulus import CoeffModulus, PlainModulus
    from tpu_fhe.core.params import EncryptionParameters, SchemeType
    from tpu_fhe.eval import bfv_eval as bv
    from tpu_fhe.scheme.batch_encoder import BatchEncoder
    from tpu_fhe.scheme.bfv import BfvTools
    from tpu_fhe.scheme.context import FheContext
    from tpu_fhe.scheme.keys import SecretKey

    n = args.n
    t0 = time.time()
    # mirror of the reference BFV example recipe: 60-bit data primes + one
    # 60-bit special prime (examples/1_bfv.cu)
    bits = [60, 60, 60] if n >= 4096 else [50, 50, 60]
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
    pk = sk.public_key()
    rlk = sk.relin_key()
    gk = sk.galois_key([1, -3], include_conj=True)
    tools = BfvTools(ctx)
    t = tools.t.value
    print(f"setup: n={n} t={t} ({time.time() - t0:.1f}s)")

    rng = np.random.default_rng(7)
    a = rng.integers(0, t, size=n, dtype=np.uint64)
    b = rng.integers(0, t, size=n, dtype=np.uint64)

    def check(name, ct, expected):
        got = enc.decode(tools.decrypt(sk, ct))
        ok = np.array_equal(got, np.asarray(expected, dtype=np.uint64))
        print(f"  {name:28s} exact={ok} budget={tools.invariant_noise_budget(sk, ct)}")
        if not ok:
            raise SystemExit(f"FAILED: {name}")

    ca = tools.encrypt_symmetric(sk, enc.encode(a))
    cb = tools.encrypt_asymmetric(pk, enc.encode(b), jax.random.key(3))
    check("encrypt sym", ca, a)
    check("encrypt asym", cb, b)
    check("add", bv.add(ctx, ca, cb), (a + b) % t)

    prod = bv.multiply(tools, ca, cb)
    expected = (a.astype(object) * b.astype(object)) % t
    check("multiply (BEHZ)", prod, expected)
    lin = bv.relinearize(tools, prod, rlk)
    check("relinearize", lin, expected)

    half = n // 2
    rows = a.reshape(2, half)
    check("rotate rows +1", bv.rotate_rows(tools, ca, 1, gk),
          np.roll(rows, -1, axis=1).ravel())
    check("rotate rows -3", bv.rotate_rows(tools, ca, -3, gk),
          np.roll(rows, 3, axis=1).ravel())
    check("rotate columns", bv.rotate_columns(tools, ca, gk), rows[::-1].ravel())

    ms = bv.mod_switch_to_next(tools, lin)
    check("mod switch", ms, expected)

    sq = bv.relinearize(tools, bv.multiply(tools, lin, lin), rlk)
    check("depth-2 square", sq, (expected * expected) % t)

    # HPS multiplication variants (reference examples/1_bfv.cu HPS
    # correctness sections; mul_tech picked at context build)
    from tpu_fhe.core.params import MulTech

    for tech in (MulTech.hps, MulTech.hps_overq, MulTech.hps_overq_leveled):
        hps_params = EncryptionParameters(
            scheme=SchemeType.bfv,
            poly_modulus_degree=n,
            allow_insecure=True,
            coeff_modulus=params.coeff_modulus,
            special_modulus_size=1,
            plain_modulus=params.plain_modulus,
            mul_tech=tech,
        )
        hps_ctx = FheContext(hps_params)
        hps_enc = BatchEncoder(hps_ctx)
        hps_sk = SecretKey(hps_ctx, key=1)
        hps_tools = BfvTools(hps_ctx)
        hca = hps_tools.encrypt_symmetric(hps_sk, hps_enc.encode(a))
        hcb = hps_tools.encrypt_symmetric(hps_sk, hps_enc.encode(b))
        got = hps_enc.decode(
            hps_tools.decrypt(hps_sk, bv.multiply(hps_tools, hca, hcb))
        )
        ok = np.array_equal(got, np.asarray(expected, dtype=np.uint64))
        print(f"  multiply ({tech.name:18s}) exact={ok}")
        if not ok:
            raise SystemExit(f"FAILED: multiply {tech.name}")

    print(f"OK ({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    main()
