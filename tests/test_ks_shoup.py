"""Shoup-form keyswitch inner product: bit-exact vs the Barrett path.

The relin key's Shoup companion planes (scheme/keys.py::_evk_shoup, device
words from ops/w64.shoup_of / shoup32_of) let the inner product run one
lazy Shoup multiply per digit (ops/ks_pallas.py _kernel_shoup /
_kernel32_shoup) instead of the 128-bit MAC chain + Barrett landing.
Outputs must be bit-identical in both regimes.
"""

import numpy as np
import pytest

from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.ops import w64


def test_shoup32_of_exact():
    rng = np.random.default_rng(1)
    qs = np.array(
        [m.value for m in CoeffModulus.create(1 << 12, [29, 28, 30])],
        dtype=np.uint64,
    )
    w = np.stack([
        np.concatenate([
            rng.integers(0, q, size=125, dtype=np.uint64),
            np.array([0, 1, q - 1], dtype=np.uint64),
        ])
        for q in qs
    ])
    got = np.asarray(w64.shoup32_of(
        np.asarray(w, dtype=np.uint64).astype(np.uint32), qs
    ))
    ref = ((w.astype(object) << 32) // qs.astype(object)[:, None]).astype(
        np.uint64
    ).astype(np.uint32)
    assert np.array_equal(got, ref)


def _ctx(bits, n=512, size_p=None):
    from tpu_fhe.scheme.context import FheContext

    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, bits)),
        special_modulus_size=size_p or 1,
    )
    return FheContext(params)


@pytest.mark.parametrize(
    "bits,size_p",
    [
        ([50, 40, 40, 40, 50, 50], 2),          # 64-bit regime, beta=2
        ([29, 28, 28, 28, 28, 29, 29, 29], 2),  # q32 regime, beta=3
    ],
)
def test_relin_shoup_matches_barrett(monkeypatch, bits, size_p):
    monkeypatch.setenv("TPU_FHE_PALLAS", "always")
    from tpu_fhe.eval import evaluator as ev
    from tpu_fhe.scheme.ciphertext import Ciphertext
    from tpu_fhe.scheme.keys import SecretKey

    ctx = _ctx(bits, size_p=size_p)
    sk = SecretKey(ctx, key=7)
    rlk_shoup = sk.relin_key(shoup=True)
    assert rlk_shoup.shoup is not None
    assert sk.relin_key(shoup=False).shoup is None

    rng = np.random.default_rng(3)
    level = ctx.level(1)
    qs = np.array([m.value for m in level.base.base], dtype=np.uint64)
    n = ctx.n
    data = (
        rng.integers(0, 1 << 62, size=(3, level.size, n), dtype=np.uint64)
        % qs[None, :, None]
    )
    ct = Ciphertext(w64.W64.from_np(data), chain_index=1, scale=2.0**40)
    # same secret => the two keys differ only in randomness; compare the
    # kernels directly on identical key data instead
    from tpu_fhe.scheme.keys import RelinKey

    rlk_same_plain = RelinKey(rlk_shoup.data, None)
    got = ev.relinearize(ctx, ct, rlk_shoup).data.to_np()
    ref = ev.relinearize(ctx, ct, rlk_same_plain).data.to_np()
    assert np.array_equal(got, ref)

    # and decrypt-correctness end to end: multiply+relin with the shoup key
    # (64-bit regime only: the q32 parametrization here is not a valid
    # FLEXIBLEAUTO ladder — composite scaling covers that in
    # tests/test_q32_composite.py)
    if max(bits) > 30:
        from tpu_fhe.eval import auto
        from tpu_fhe.scheme.ckks_encoder import CkksEncoder

        enc = CkksEncoder(ctx)
        sf, _ = auto.scaling_factors(ctx)
        x = rng.uniform(-1, 1, n // 2)
        ct1 = sk.encrypt_symmetric(enc.encode(x, sf[0]))
        prod = ev.multiply(ctx, ct1, ct1)
        prod = ev.relinearize(ctx, prod, rlk_shoup)
        prod = ev.rescale_to_next(ctx, prod)
        got_vals = enc.decode(sk.decrypt(prod)).real
        err = np.max(np.abs(got_vals - x * x))
        assert err < 1e-3, err
