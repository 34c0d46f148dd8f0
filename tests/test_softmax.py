"""Gumbel softmax (exp Chebyshev + squaring + Goldschmidt) vs its own
float shadow.

The encrypted pipeline (models/dnn.py::softmax, reference SoftMax
src/dnn.cu:349-395) is compared against the identical arithmetic in
float64: Chebyshev-exp of x/b, (b/lambda) squarings, Goldschmidt
reciprocal of the channel sum, final per-channel multiply.  This pins the
r05 restructure (vmapped exp branch + one inv-sum program) to the
previous per-channel semantics.
"""

import math

import numpy as np
import pytest

from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.eval import chebyshev as cheb
from tpu_fhe.models.dnn import DNN
from tpu_fhe.scheme.ckks_encoder import CkksEncoder
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey

RNG = np.random.default_rng(31)


def shadow_softmax(vals, bound_b, bound_r, lam, d):
    # the deg-12 Chebyshev approx of exp on [-1,1] is ~1e-9 accurate, so
    # true exp is a faithful shadow of the encrypted evaluation
    log_reps = int(math.log2(bound_b)) - int(math.log2(lam))
    e = np.exp(vals / bound_b)
    for _ in range(log_reps):
        e = e * e
    s = np.sum(e, axis=0)
    inv = 2.0 - s / bound_r
    tmp = inv - 1.0
    for _ in range(d):
        tmp = tmp * tmp
        inv = inv * (tmp + 1.0)
    return e * inv


def test_softmax_matches_float_shadow():
    n = 512
    bits = [60] + [50] * 14 + [60]
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, bits)),
        special_modulus_size=1,
    )
    ctx = FheContext(params)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=5)
    dnn = DNN(ctx, enc)
    dnn.relin_keygen(sk)
    w = 4
    img = RNG.uniform(0.1, 2.0, (w, w, 3))
    t = dnn.enc_tensor(img, sk=sk)
    out = dnn.softmax(t, bound_b=8, bound_r=8, gumbel_lambda=4,
                      goldschmidt_d=2)
    got = dnn.dec_tensor(out, sk)
    want = shadow_softmax(
        img.transpose(2, 0, 1), 8, 8, 4, 2
    ).transpose(1, 2, 0)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=5e-2)
