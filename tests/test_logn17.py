"""Ring-degree 2^17 support (reference caps at N=2^17, include/ntt.cuh:131-153).

The vectorized NTT, encoder, and a full encrypt->rotate->decrypt round
trip must work at logN=17; the reference's own sparse-bootstrap example
targets this ring and is broken there (bootstrapping_example.cu:200-202),
so working N=2^17 arithmetic is already ahead of it.  Kept to a few limbs
so the CPU suite stays fast.
"""

import numpy as np
import pytest

from tpu_fhe.core import numth
from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.ntt_tables import make_ntt_tables
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.eval import evaluator as ev
from tpu_fhe.ops.ntt import build_device_ntt_tables, forward_ntt, inverse_ntt
from tpu_fhe.ops.w64 import W64
from tpu_fhe.scheme.ckks_encoder import CkksEncoder
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey

N17 = 1 << 17


def test_ntt_roundtrip_logn17():
    qs = numth.get_primes(N17, 59, 2)
    host = [make_ntt_tables(17, q) for q in qs]
    dev = build_device_ntt_tables(host).to_device()
    rng = np.random.default_rng(9)
    x = rng.integers(0, qs[0], size=(2, N17), dtype=np.uint64)
    w = W64.from_np(x)
    back = inverse_ntt(forward_ntt(w, dev), dev).to_np()
    np.testing.assert_array_equal(back, x)


def test_ckks_roundtrip_logn17():
    bits = [60, 50, 50, 60]
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=N17,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(N17, bits)),
        special_modulus_size=1,
    )
    ctx = FheContext(params)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=3)
    rng = np.random.default_rng(4)
    # sparse packing keeps the host embedding fast
    slots = 4096
    vals = rng.uniform(-1, 1, slots)
    ct = sk.encrypt_symmetric(enc.encode(vals, 2.0 ** 50, slots=slots))
    gk = sk.galois_key([1])
    rot = ev.rotate(ctx, ct, 1, gk)
    got = enc.decode(sk.decrypt(rot), slots=slots).real
    np.testing.assert_allclose(got, np.roll(vals, -1), atol=1e-6)
