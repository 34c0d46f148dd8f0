"""On-device special FFT (ops/special_fft.py) vs the host embedding.

The host CkksEncoder._embed_inverse/_embed_forward are the golden
oracle (themselves validated by every CKKS e2e test); the device
transform must agree to double-double f32 accuracy (~2^-45 relative)
for both directions, batched inputs, and the full encoder round trip.
Reference counterpart: src/fft.cu special_fft_forward/backward.
"""

import numpy as np
import pytest

from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.ops.special_fft import DeviceEmbedding, to_dd, from_dd
from tpu_fhe.scheme.ckks_encoder import CkksEncoder
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey

RNG = np.random.default_rng(7)


def _ckks_ctx(n):
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, [40, 30, 40])),
        special_modulus_size=1,
    )
    return FheContext(params)


def test_dd_roundtrip():
    # integers under 2^45 fit the 48-bit dd mantissa exactly
    x = np.rint(RNG.uniform(-1, 1, 64) * 2.0**45)
    assert np.array_equal(from_dd(to_dd(x)), x)
    # general f64 (53-bit mantissa) round-trips to dd precision
    z = RNG.normal(size=64) + 1j * RNG.normal(size=64)
    np.testing.assert_allclose(from_dd(to_dd(z)), z, rtol=2**-44, atol=0)


@pytest.mark.parametrize("logn", [3, 6, 10])
def test_device_embedding_matches_host(logn):
    n = 1 << logn
    enc = CkksEncoder(_ckks_ctx(n))
    dev = DeviceEmbedding(n // 2)
    z = RNG.normal(size=n // 2) + 1j * RNG.normal(size=n // 2)

    coeffs_host = enc._embed_inverse(z)
    coeffs_dev = dev.embed_inverse(z)
    np.testing.assert_allclose(coeffs_dev, coeffs_host, rtol=0, atol=1e-10)

    slots_host = enc._embed_forward(coeffs_host)
    slots_dev = dev.embed_forward(coeffs_host)
    np.testing.assert_allclose(slots_dev, slots_host, rtol=0, atol=1e-9)


def test_device_embedding_roundtrip_large_scale():
    # values at CKKS-scale magnitude: dd precision must survive 2^40
    n = 512
    dev = DeviceEmbedding(n // 2)
    z = (RNG.normal(size=n // 2) + 1j * RNG.normal(size=n // 2))
    coeffs = dev.embed_inverse(z) * 2.0**40
    back = dev.embed_forward(coeffs / 2.0**40)
    np.testing.assert_allclose(back, z, rtol=0, atol=1e-9)


def test_device_embedding_batched():
    n = 128
    dev = DeviceEmbedding(n // 2)
    z = RNG.normal(size=(3, n // 2)) + 1j * RNG.normal(size=(3, n // 2))
    batched = dev.embed_inverse(z)
    single = np.stack([dev.embed_inverse(z[i]) for i in range(3)])
    np.testing.assert_allclose(batched, single, rtol=0, atol=0)


def test_encoder_device_path_end_to_end():
    n = 256
    ctx = _ckks_ctx(n)
    enc_dev = CkksEncoder(ctx, device_embed=True)
    enc_host = CkksEncoder(ctx, device_embed=False)
    assert enc_dev.device_embed
    sk = SecretKey(ctx, key=3)
    x = RNG.uniform(-1, 1, n // 2)
    scale = 2.0**40
    ct = sk.encrypt_symmetric(enc_dev.encode(x, scale))
    out = enc_host.decode(sk.decrypt(ct), slots=n // 2)
    np.testing.assert_allclose(out.real, x, atol=1e-6)
    # decode through the device path too
    out_dev = enc_dev.decode(sk.decrypt(ct), slots=n // 2)
    np.testing.assert_allclose(out_dev.real, x, atol=1e-6)


@pytest.mark.parametrize("device", [False, True])
def test_sparse_encode_fast_path_matches_tiled(device):
    """Sparse-packing fast path (small transform + stride scatter,
    reference src/ckks.cu:19-43) must equal the tile-then-full-FFT
    path exactly (host) / to dd accuracy (device)."""
    n = 512
    ctx = _ckks_ctx(n)
    enc = CkksEncoder(ctx, device_embed=device)
    for m in [2, 8, 64]:
        z = RNG.normal(size=m) + 1j * RNG.normal(size=m)
        fast = enc._embed_inverse_slots(z, m)
        host = CkksEncoder(ctx, device_embed=False)
        tiled = host._embed_inverse(np.tile(z, (n // 2) // m))
        np.testing.assert_allclose(fast, tiled, rtol=0, atol=1e-10)


def test_sparse_encode_decrypt_roundtrip():
    n = 256
    ctx = _ckks_ctx(n)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=5)
    m = 16
    x = RNG.uniform(-1, 1, m)
    ct = sk.encrypt_symmetric(enc.encode(x, 2.0**40, slots=m))
    out = enc.decode(sk.decrypt(ct), slots=m)
    np.testing.assert_allclose(out.real, x, atol=1e-6)
