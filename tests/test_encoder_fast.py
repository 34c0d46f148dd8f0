"""Encoder fast paths: vectorized round+decompose and batched encode_ext.

The int64 fast path of _round_decompose must agree bit-exactly with the
big-int path on either side of its 2^62 switch, and encode_ext_batch must
produce exactly the same plaintexts as per-call encode_ext.
"""

import numpy as np

from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.core.rns import RNSBase
from tpu_fhe.scheme.ckks_encoder import (
    CkksEncoder,
    _decompose_signed,
    _round_decompose,
)
from tpu_fhe.scheme.context import FheContext


def _base(k=3):
    return RNSBase(CoeffModulus.create(1 << 13, [59] * k))


def test_round_decompose_fast_matches_bigint():
    rng = np.random.default_rng(0)
    base = _base()
    coeffs = rng.uniform(-1, 1, 64) * (2.0 ** 61)  # below the 2^62 switch
    fast = _round_decompose(coeffs, base)
    rounded = np.array(
        [int(round(float(c))) for c in coeffs], dtype=object
    )
    slow = _decompose_signed(rounded, base)
    assert np.array_equal(fast, slow)


def test_round_decompose_bigint_fallback():
    base = _base()
    coeffs = np.array([2.0 ** 63, -(2.0 ** 64), 3.0, -0.49])
    out = _round_decompose(coeffs, base)
    expect = _decompose_signed(
        np.array([int(round(float(c))) for c in coeffs], dtype=object), base
    )
    assert np.array_equal(out, expect)


def test_encode_ext_batch_matches_single():
    n = 256
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, [50, 40, 40, 50])),
        special_modulus_size=1,
    )
    ctx = FheContext(params)
    enc = CkksEncoder(ctx)
    rng = np.random.default_rng(1)
    vecs = [rng.standard_normal(n // 2) + 1j * rng.standard_normal(n // 2)
            for _ in range(3)]
    singles = [enc.encode_ext(v, 2.0**40) for v in vecs]
    batched = enc.encode_ext_batch(vecs, 2.0**40)
    for s, b in zip(singles, batched):
        assert np.array_equal(s.data.to_np(), b.data.to_np())
        assert s.chain_index == b.chain_index and s.scale == b.scale
