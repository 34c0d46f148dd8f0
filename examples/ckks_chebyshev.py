"""Encrypted function evaluation via Chebyshev series (FLEXIBLEAUTO).

TPU-native analog of the reference's examples/5_aux_bootstrap.cu Chebyshev
sections: evaluates exp(x) (direct) and a composite sine (Paterson-
Stockmeyer) on encrypted data.

Run:  python examples/ckks_chebyshev.py [--cpu]
"""

import os as _os
import sys as _sys

# make the repo importable when run as `python examples/<name>.py`
# without touching PYTHONPATH (the env's own PYTHONPATH must survive:
# it loads the TPU-plugin sitecustomize)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import math
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=512)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tpu_fhe.core.modulus import CoeffModulus
    from tpu_fhe.core.params import EncryptionParameters, SchemeType
    from tpu_fhe.eval import auto, chebyshev as cheb
    from tpu_fhe.scheme.ckks_encoder import CkksEncoder
    from tpu_fhe.scheme.context import FheContext
    from tpu_fhe.scheme.keys import SecretKey

    n = args.n
    bits = [45] + [40] * 10 + [50]
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, bits)),
        special_modulus_size=1,
    )
    ctx = FheContext(params)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=42)
    rlk = sk.relin_key()
    sf, _ = auto.scaling_factors(ctx)

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, n // 2)
    ct = sk.encrypt_symmetric(enc.encode(x, sf[0]))

    t0 = time.time()
    coeffs = cheb.eval_chebyshev_coefficients(math.exp, -1.0, 1.0, 4)
    out = cheb.eval_chebyshev_series(ctx, ct, rlk, coeffs, -1.0, 1.0)
    got = enc.decode(sk.decrypt(out)).real
    err = np.max(np.abs(got - np.exp(x)))
    print(f"[chebyshev deg-4 exp] err={err:.2e} levels used="
          f"{out.chain_index - 1} ({time.time()-t0:.1f}s)")
    assert err < 5e-2

    t0 = time.time()
    f = lambda t: math.sin(math.pi * t)
    coeffs = cheb.eval_chebyshev_coefficients(f, -1.0, 1.0, 27)
    out = cheb.eval_chebyshev_series(ctx, ct, rlk, coeffs, -1.0, 1.0)
    got = enc.decode(sk.decrypt(out)).real
    expect = np.sin(np.pi * x)
    err = np.max(np.abs(got - expect))
    print(f"[chebyshev deg-27 PS sin] err={err:.2e} levels used="
          f"{out.chain_index - 1} ({time.time()-t0:.1f}s)")
    assert err < 5e-2
    print("OK")


if __name__ == "__main__":
    main()
