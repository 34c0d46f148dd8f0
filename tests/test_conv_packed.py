"""Packed multi-channel convolution + diagonal-BSGS FC vs numpy."""

import numpy as np
import pytest

from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.models.conv_packed import (
    PackedConv, fc_rotation_indices, fc_weight_encode, fully_connected,
)
from tpu_fhe.scheme.ckks_encoder import CkksEncoder
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey

RNG = np.random.default_rng(88)


@pytest.fixture(scope="module")
def stack():
    n = 512
    bits = [60, 40, 40, 40, 60]
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, bits)),
        special_modulus_size=1,
    )
    ctx = FheContext(params)
    return ctx, CkksEncoder(ctx), SecretKey(ctx, key=21)


def ref_conv_same(images, filt):
    """images (c_in, h, h), filt (c_out, c_in, f, f), zero 'same' pad."""
    c_out, c_in, f, _ = filt.shape
    h = images.shape[1]
    p = (f - 1) // 2
    padded = np.pad(images, ((0, 0), (p, p), (p, p)))
    out = np.zeros((c_out, h, h))
    for k in range(c_out):
        for c in range(c_in):
            for di in range(f):
                for dj in range(f):
                    out[k] += filt[k, c, di, dj] * \
                        padded[c, di:di + h, dj:dj + h]
    return out


def test_packed_conv_matches_numpy(stack):
    ctx, enc, sk = stack
    pc = PackedConv(ctx, enc, scale=2.0 ** 40)
    lay = pc.layout(in_h=6, f_h=3)
    assert lay.n_i >= 2  # actually packs channels

    c_in, c_out = 5, 3
    images = RNG.uniform(-1, 1, (c_in, 6, 6))
    filt = RNG.uniform(-0.5, 0.5, (c_out, c_in, 3, 3))
    gk = sk.galois_key(pc.rotation_indices(lay))
    din = pc.zero_pad_encode(images, lay, sk)
    assert len(din) == -(-c_in // lay.n_i)
    dout = pc.eval_convolution(filt, gk, din, lay)
    got = pc.decode_outputs(dout, lay, c_out, sk)
    np.testing.assert_allclose(got, ref_conv_same(images, filt), atol=1e-3)


def test_fully_connected_matches_numpy(stack):
    ctx, enc, sk = stack
    scale = 2.0 ** 40
    rows, cols = 4, 16
    weight = RNG.uniform(-1, 1, (rows, cols))
    x = RNG.uniform(-1, 1, cols)
    full = np.zeros(enc.slots)
    full[:cols] = x
    ct = sk.encrypt_symmetric(enc.encode(full, scale, slots=enc.slots))
    gk = sk.galois_key(fc_rotation_indices(rows, cols, enc.slots))
    diag = fc_weight_encode(enc, weight, scale)
    out = fully_connected(ctx, gk, ct, diag, cols)
    got = enc.decode(sk.decrypt(out)).real[:rows]
    np.testing.assert_allclose(got, weight @ x, atol=1e-4)
