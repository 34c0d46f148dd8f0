"""Encrypted DNN layers vs numpy reference (conv/bn/pool exact semantics)."""

import math

import numpy as np
import pytest

from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.eval import auto
from tpu_fhe.models.dnn import DNN, TensorCT
from tpu_fhe.scheme.ckks_encoder import CkksEncoder
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey

RNG = np.random.default_rng(77)


def ref_conv(img, weight, stride=1):
    """img (w,w,ch), weight (kh,kw,in,out), zero 'same' padding."""
    w = img.shape[0]
    kh, kw, in_ch, out_ch = weight.shape
    c = kh // 2
    out = np.zeros((w, w, out_ch))
    for h in range(out_ch):
        for i in range(kh):
            for j in range(kw):
                for k in range(in_ch):
                    shifted = np.zeros((w, w))
                    src = img[:, :, k]
                    lo_i, hi_i = max(0, c - i), min(w, w + c - i)
                    # value at (ip, jp) is src[ip+i-c, jp+j-c] when in bounds
                    for ip in range(w):
                        si = ip + i - c
                        if 0 <= si < w:
                            for jp in range(w):
                                sj = jp + j - c
                                if 0 <= sj < w:
                                    shifted[ip, jp] = src[si, sj]
                    out[:, :, h] += weight[i, j, k, h] * shifted
    return out[::stride, ::stride]


@pytest.fixture(scope="module")
def setup():
    n = 256
    bits = [60] + [59] * 7 + [60]
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, bits)),
        special_modulus_size=1,
    )
    ctx = FheContext(params)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=55)
    dnn = DNN(ctx, enc)
    dnn.relin_keygen(sk)
    w = 8
    rots = DNN.conv_rotation_indices(w, 3, 0)
    rots += DNN.conv_rotation_indices(w // 2, 3, 1)
    rots += DNN.avgpool_rotation_indices(w, 0)
    dnn.build_galois_key(sk, rots)
    return ctx, enc, sk, dnn, w


def test_enc_dec_tensor(setup):
    ctx, enc, sk, dnn, w = setup
    img = RNG.uniform(-1, 1, (w, w, 3))
    t = dnn.enc_tensor(img, sk=sk)
    out = dnn.dec_tensor(t, sk)
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_conv_stride1(setup):
    ctx, enc, sk, dnn, w = setup
    img = RNG.uniform(-1, 1, (w, w, 2))
    weight = RNG.uniform(-0.5, 0.5, (3, 3, 2, 3))
    t = dnn.enc_tensor(img, sk=sk)
    out = dnn.conv(t, weight)
    got = dnn.dec_tensor(out, sk)
    np.testing.assert_allclose(got, ref_conv(img, weight), atol=1e-4)


def test_conv_stride2_and_chain(setup):
    ctx, enc, sk, dnn, w = setup
    img = RNG.uniform(-1, 1, (w, w, 2))
    w1 = RNG.uniform(-0.5, 0.5, (3, 3, 2, 2))
    w2 = RNG.uniform(-0.5, 0.5, (3, 3, 2, 2))
    t = dnn.enc_tensor(img, sk=sk)
    out = dnn.conv(t, w1, stride=2)
    assert out.width == w // 2 and out.slotstr == 1
    expect1 = ref_conv(img, w1, stride=2)
    got1 = dnn.dec_tensor(out, sk)
    np.testing.assert_allclose(got1, expect1, atol=1e-4)
    # second conv on the strided layout
    out2 = dnn.conv(out, w2)
    got2 = dnn.dec_tensor(out2, sk)
    np.testing.assert_allclose(got2, ref_conv(expect1, w2), atol=1e-3)


def test_batch_norm_and_add(setup):
    ctx, enc, sk, dnn, w = setup
    img = RNG.uniform(-1, 1, (w, w, 3))
    gamma = RNG.uniform(0.5, 1.5, 3)
    beta = RNG.uniform(-0.5, 0.5, 3)
    mean = RNG.uniform(-0.2, 0.2, 3)
    var = RNG.uniform(0.5, 1.5, 3)
    t = dnn.enc_tensor(img, sk=sk)
    out = dnn.batch_norm(t, gamma, beta, mean, var)
    a = gamma / np.sqrt(var + 1e-5)
    expected = img * a + (beta - a * mean)
    np.testing.assert_allclose(dnn.dec_tensor(out, sk), expected, atol=1e-5)
    doubled = dnn.add(out, out)
    np.testing.assert_allclose(dnn.dec_tensor(doubled, sk), 2 * expected, atol=1e-5)


def test_avgpool_fullcon(setup):
    ctx, enc, sk, dnn, w = setup
    img = RNG.uniform(-1, 1, (w, w, 3))
    weight = RNG.uniform(-0.5, 0.5, (4, 3))
    bias = RNG.uniform(-0.5, 0.5, 4)
    t = dnn.enc_tensor(img, sk=sk)
    out = dnn.avg_pool_full_con(t, weight, bias)
    sums = img.sum(axis=(0, 1))
    expected = weight @ sums + bias
    got = dnn.dec_tensor(out, sk)[0, 0, :]  # slot 0 per output channel
    np.testing.assert_allclose(got, expected, atol=1e-3)


def test_relu_chebyshev(setup):
    ctx, enc, sk, dnn, w = setup
    img = RNG.uniform(-1, 1, (w, w, 2))
    t = dnn.enc_tensor(img, sk=sk)
    out = dnn.relu(t, -1.0, 1.0, 27)
    got = dnn.dec_tensor(out, sk)
    np.testing.assert_allclose(got, np.maximum(img, 0.0), atol=0.05)


@pytest.mark.slow
def test_relu_composite_with_bootstrap():
    """ReluComposite = x*(sign(sign(sign(0.1x)))+1)/2 with 3 interleaved
    sparse bootstraps — the ResNet-20 activation end-to-end at doll scale."""
    from tpu_fhe.boot.bootstrap import CkksBootstrapper

    n = 64
    w = 4  # 16 slots, sparse
    size_q = 21
    bits = [60] + [59] * (size_q - 1) + [60] * 3
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, bits)),
        special_modulus_size=3,
    )
    ctx = FheContext(params)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=66)
    dnn = DNN(ctx, enc)
    dnn.relin_keygen(sk)
    dnn.build_galois_key(sk, DNN.conv_rotation_indices(w, 3, 0))

    slots = w * w
    boot = CkksBootstrapper(ctx, enc)
    boot.set_sine_params(28, 3, 44)
    boot.setup(level_budget=(2, 2), slots=slots)
    boot.keygen(sk, slots=slots)
    dnn.mul_key = boot.mul_key

    img = RNG.uniform(-0.9, 0.9, (w, w, 1))
    t = dnn.enc_tensor(img, sk=sk)
    out = dnn.relu_composite(t, boot)
    got = dnn.dec_tensor(out, sk)
    err = np.max(np.abs(got - np.maximum(img, 0.0)))
    print(f"relu_composite max err: {err:.4f}")
    assert err < 0.05
