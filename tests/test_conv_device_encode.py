"""Device-side conv mask encode vs the host-encode path.

The r05 conv path reconstructs round(emb * weight * scale) inside the
accumulate program from a fixed-point embedding and per-weight scalars
(models/dnn.py::_conv_device_encode) instead of shipping host-encoded
QlP-basis plaintexts per (in, out) pair — the identified warm-conv
bottleneck at N=2^16 over the TPU tunnel (reference builds masks on
device too, src/dnn.cu:103-114).  Both paths must agree to encoding
noise, in the 60-bit and the q32 (composite) regimes.
"""

import numpy as np
import pytest

from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.models.dnn import DNN
from tpu_fhe.scheme.ckks_encoder import CkksEncoder
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey

RNG = np.random.default_rng(123)


def _setup(q32: bool):
    n = 256
    if q32:
        mods = CoeffModulus.create_composite(
            n, 56, 3, degree=2, anchor_bits=30,
            special_bits=29, special_count=2,
        )
        params = EncryptionParameters(
            scheme=SchemeType.ckks,
            poly_modulus_degree=n,
            allow_insecure=True,
            coeff_modulus=tuple(mods),
            special_modulus_size=2,
            composite_degree=2,
        )
    else:
        bits = [60] + [59] * 4 + [60]
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
    dnn.build_galois_key(sk, DNN.conv_rotation_indices(w, 3, 0))
    return ctx, enc, sk, dnn, w


@pytest.mark.parametrize("q32", [False, True], ids=["60bit", "q32"])
def test_conv_paths_agree(q32, monkeypatch):
    ctx, enc, sk, dnn, w = _setup(q32)
    img = RNG.uniform(-1, 1, (w, w, 2))
    weight = RNG.uniform(-0.5, 0.5, (3, 3, 2, 3))
    weight[1, 0, 0, 1] = 0.0  # a dead tap must contribute exactly zero

    t = dnn.enc_tensor(img, sk=sk)
    monkeypatch.setenv("TPU_FHE_CONV_DEVICE_ENCODE", "1")
    got_dev = dnn.dec_tensor(dnn.conv(t, weight), sk)
    monkeypatch.setenv("TPU_FHE_CONV_DEVICE_ENCODE", "0")
    got_host = dnn.dec_tensor(dnn.conv(t, weight), sk)

    # both are the same linear layer up to encoding noise
    np.testing.assert_allclose(got_dev, got_host, atol=1e-4)

    ref = np.zeros((w, w, 3))
    c = 1
    for h in range(3):
        for i in range(3):
            for j in range(3):
                for k in range(2):
                    for ip in range(w):
                        for jp in range(w):
                            si, sj = ip + i - c, jp + j - c
                            if 0 <= si < w and 0 <= sj < w:
                                ref[ip, jp, h] += (
                                    weight[i, j, k, h] * img[si, sj, k]
                                )
    np.testing.assert_allclose(got_dev, ref, atol=1e-3)
