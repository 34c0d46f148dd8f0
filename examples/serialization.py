"""Serialization walkthrough: save/load ciphertexts (incl. seed-compressed
symmetric form) and every key type, then keep computing with loaded objects.

TPU-native analog of the reference's examples/serialization.cu.

Run:  python examples/serialization.py [--cpu]
"""

import os as _os
import sys as _sys

# make the repo importable when run as `python examples/<name>.py`
# without touching PYTHONPATH (the env's own PYTHONPATH must survive:
# it loads the TPU-plugin sitecustomize)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import io
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tpu_fhe.core.modulus import CoeffModulus
    from tpu_fhe.core.params import EncryptionParameters, SchemeType
    from tpu_fhe.eval import evaluator as ev
    from tpu_fhe.scheme.ckks_encoder import CkksEncoder
    from tpu_fhe.scheme.context import FheContext
    from tpu_fhe.scheme.keys import SecretKey
    from tpu_fhe.utils import serialize as ser

    t0 = time.time()
    n = args.n
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, [60, 40, 40, 60])),
        special_modulus_size=1,
    )
    ctx = FheContext(params)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=5)
    print(f"setup ({time.time() - t0:.1f}s)")

    rng = np.random.default_rng(1)
    x = rng.standard_normal(n // 2)
    scale = 2.0 ** 40

    def size_of(save, obj):
        buf = io.BytesIO()
        save(obj, buf)
        return buf.tell(), buf

    # full ciphertext round trip
    ct = sk.encrypt_symmetric(enc.encode(x, scale))
    nbytes, buf = size_of(ser.save_ciphertext, ct)
    buf.seek(0)
    ct2 = ser.load_ciphertext(buf)
    err = np.max(np.abs(enc.decode(sk.decrypt(ct2)).real - x))
    print(f"ciphertext: {nbytes} bytes, roundtrip err={err:.2e}")

    # seed-compressed symmetric form
    ct_seeded, seed = sk.encrypt_symmetric_seeded(enc.encode(x, scale))
    buf2 = io.BytesIO()
    ser.save_ciphertext_symmetric(ct_seeded, seed, buf2)
    print(f"seed-compressed: {buf2.tell()} bytes "
          f"({buf2.tell() / nbytes:.2f}x of full)")
    buf2.seek(0)
    ct3 = ser.load_ciphertext_symmetric(ctx, buf2)
    err = np.max(np.abs(enc.decode(sk.decrypt(ct3)).real - x))
    print(f"seed-compressed roundtrip err={err:.2e}")

    # keys
    for name, save, load, obj in (
        ("secret key", ser.save_secret_key,
         lambda b: ser.load_secret_key(ctx, b), sk),
        ("public key", ser.save_public_key, ser.load_public_key,
         sk.public_key()),
        ("relin key", ser.save_relin_key, ser.load_relin_key, sk.relin_key()),
        ("galois key", ser.save_galois_key, ser.load_galois_key,
         sk.galois_key([1, -1], include_conj=True)),
    ):
        nbytes, buf = size_of(save, obj)
        buf.seek(0)
        loaded = load(buf)
        print(f"{name}: {nbytes} bytes")
        if name == "relin key":
            prod = ev.rescale_to_next(
                ctx, ev.relinearize(ctx, ev.multiply(ctx, ct, ct), loaded)
            )
            err = np.max(np.abs(enc.decode(sk.decrypt(prod)).real - x * x))
            print(f"  loaded relin key works: err={err:.2e}")
        if name == "galois key":
            rot = ev.rotate(ctx, ct, 1, loaded)
            err = np.max(np.abs(
                enc.decode(sk.decrypt(rot)).real - np.roll(x, -1)
            ))
            print(f"  loaded galois key works: err={err:.2e}")
    print("OK")


if __name__ == "__main__":
    main()
