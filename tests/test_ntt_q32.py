"""q32 (moduli < 2^30) single-word Pallas NTT path, bit-exact vs the XLA
W64 reference transforms.

With every RNS prime under 2^30 a residue fits one u32 lane and the fused
kernels switch to Harvey-lazy single-word butterflies (ops/ntt_pallas.py
NTTPlan32) — the TPU-native composite-scaling parameter regime.  These
tests pin bit-exactness of forward / inverse / fused-landing kernels and
that a full hybrid keyswitch context built from 30-bit primes decrypts
correctly end-to-end.
"""

import numpy as np
import pytest

from tpu_fhe.core import numth
from tpu_fhe.core.ntt_tables import make_ntt_tables
from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.ops import w64
from tpu_fhe.ops.ntt import (
    build_device_ntt_tables,
    forward_ntt,
    forward_ntt_sub_scale,
    inverse_ntt,
    inverse_ntt_scaled,
)
from tpu_fhe.ops.ntt_pallas import NTTPlan32, build_ntt_plan32

RNG = np.random.default_rng(41)


@pytest.fixture
def force_pallas(monkeypatch):
    monkeypatch.setenv("TPU_FHE_PALLAS", "always")


def _tables(n, bits, limbs):
    primes = numth.get_primes(n, bits, limbs)
    host = [make_ntt_tables(n.bit_length() - 1, q) for q in primes]
    return primes, host


def _rand(primes, n, size=None):
    qs = np.asarray(primes, dtype=np.uint64)[:, None]
    shape = ((size,) if size else ()) + (len(primes), n)
    return w64.W64.from_np(
        RNG.integers(0, 1 << 29, size=shape, dtype=np.uint64) % qs
    )


def test_q32_plan_selected():
    _, host = _tables(2048, 28, 2)
    dev = build_device_ntt_tables(host)
    assert isinstance(dev.plan, NTTPlan32)
    _, host60 = _tables(2048, 50, 1)
    assert build_ntt_plan32(host60) is None


def test_q32_forward_inverse_roundtrip(force_pallas, monkeypatch):
    n = 2048
    primes, host = _tables(n, 29, 3)
    dev = build_device_ntt_tables(host).to_device()
    assert isinstance(dev.plan, NTTPlan32)
    x = _rand(primes, n)
    got_f = forward_ntt(x, dev).to_np()
    got_rt = inverse_ntt(forward_ntt(x, dev), dev).to_np()
    monkeypatch.setenv("TPU_FHE_PALLAS", "never")
    ref_f = forward_ntt(x, dev).to_np()
    np.testing.assert_array_equal(got_f, ref_f)
    np.testing.assert_array_equal(got_rt, x.to_np())


def test_q32_inverse_scaled_and_sub_scale(force_pallas, monkeypatch):
    n = 2048
    primes, host = _tables(n, 28, 2)
    dev = build_device_ntt_tables(host).to_device()
    qs = np.asarray(primes, dtype=np.uint64).reshape(-1, 1)
    x = _rand(primes, n)
    sub = _rand(primes, n)
    scale = (RNG.integers(1, 1 << 27, size=(len(primes), 1), dtype=np.uint64)
             % qs)
    pre = (RNG.integers(1, 1 << 27, size=(len(primes), 1), dtype=np.uint64)
           % qs)

    def shoup(v):
        return ((v.astype(object) << 64) // qs.astype(object)).astype(
            np.uint64
        )

    got_iv = inverse_ntt_scaled(x, dev, scale, shoup(scale)).to_np()
    got_fs = forward_ntt_sub_scale(x, sub, dev, scale, shoup(scale)).to_np()
    got_fp = forward_ntt_sub_scale(
        x, sub, dev, scale, shoup(scale), pre=pre, pre_shoup=shoup(pre)
    ).to_np()
    monkeypatch.setenv("TPU_FHE_PALLAS", "never")
    ref_iv = inverse_ntt_scaled(x, dev, scale, shoup(scale)).to_np()
    ref_fs = forward_ntt_sub_scale(x, sub, dev, scale, shoup(scale)).to_np()
    ref_fp = forward_ntt_sub_scale(
        x, sub, dev, scale, shoup(scale), pre=pre, pre_shoup=shoup(pre)
    ).to_np()
    np.testing.assert_array_equal(got_iv, ref_iv)
    np.testing.assert_array_equal(got_fs, ref_fs)
    np.testing.assert_array_equal(got_fp, ref_fp)


def test_q32_batched_lead_axis(force_pallas, monkeypatch):
    n = 1024
    primes, host = _tables(n, 28, 2)
    dev = build_device_ntt_tables(host).to_device()
    x = _rand(primes, n, size=3)
    got = forward_ntt(x, dev).to_np()
    monkeypatch.setenv("TPU_FHE_PALLAS", "never")
    ref = forward_ntt(x, dev).to_np()
    np.testing.assert_array_equal(got, ref)


def test_q32_bconv_mxu_matches_generic(force_pallas, monkeypatch):
    monkeypatch.setenv("TPU_FHE_MXU_BCONV", "always")
    from tpu_fhe.core.modulus import Modulus
    from tpu_fhe.ops.bconv import bconv_matmul

    n = 512
    src = numth.get_primes(2048, 29, 5)
    dst = numth.get_primes(2048, 28, 7)
    x = w64.W64.from_np(
        RNG.integers(0, 1 << 28, size=(2, len(src), n), dtype=np.uint64)
        % np.asarray(src, dtype=np.uint64)[:, None]
    )
    mat = RNG.integers(0, 1 << 28, size=(len(dst), len(src)),
                       dtype=np.uint64) % np.asarray(dst,
                                                     dtype=np.uint64)[:, None]
    p = np.asarray(dst, dtype=np.uint64).reshape(-1, 1)
    ratios = np.array([Modulus(int(v)).const_ratio for v in dst],
                      dtype=np.uint64)
    rlo = ratios[:, 0:1]
    rhi = ratios[:, 1:2]
    got = bconv_matmul(x, mat, p, rlo, rhi, src_q32=True).to_np()
    monkeypatch.setenv("TPU_FHE_MXU_BCONV", "never")
    monkeypatch.setenv("TPU_FHE_PALLAS", "never")
    ref = bconv_matmul(x, mat, p, rlo, rhi).to_np()
    np.testing.assert_array_equal(got, ref)


def test_q32_key_inner_product_matches_xla(force_pallas, monkeypatch):
    import jax

    from tpu_fhe.eval import evaluator as ev
    from tpu_fhe.scheme.context import FheContext
    from tpu_fhe.scheme.keys import SecretKey

    n = 2048
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, [29, 28, 28, 29, 29])),
        special_modulus_size=2,
    )
    ctx = FheContext(params)
    sk = SecretKey(ctx, key=4)
    rlk = sk.relin_key()
    level = ctx.level(1)
    size_qlp = level.size + 2
    tmu = w64.W64.from_np(
        RNG.integers(0, 1 << 28, size=(level.ks.beta, size_qlp, n),
                     dtype=np.uint64)
    )
    got = ev.key_inner_product(ctx, level, tmu, rlk).to_np()
    monkeypatch.setenv("TPU_FHE_PALLAS", "never")
    ref = ev.key_inner_product(ctx, level, tmu, rlk).to_np()
    np.testing.assert_array_equal(got, ref)


def test_q32_keyswitch_context_end_to_end(force_pallas):
    """30-bit-prime CKKS context: encrypt / relinearize-free multiply via
    keyswitch_core / decrypt still round-trips (the q32 NTT rides the whole
    hybrid keyswitch; bconv + inner product run their generic paths)."""
    import jax

    from tpu_fhe.eval import evaluator as ev
    from tpu_fhe.scheme.ckks_encoder import CkksEncoder
    from tpu_fhe.scheme.context import FheContext
    from tpu_fhe.scheme.keys import SecretKey

    n = 2048
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, [29, 28, 28, 29, 29])),
        special_modulus_size=2,
    )
    ctx = FheContext(params)
    assert isinstance(ctx.key_level.ntt.plan, NTTPlan32)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=3)
    rlk = sk.relin_key()
    vals = RNG.standard_normal(n // 2) * 0.5
    ct = sk.encrypt_symmetric(enc.encode(vals, 2.0**28))
    prod = ev.multiply(ctx, ct, ct)
    prod = ev.relinearize(ctx, prod, rlk)
    out = enc.decode(sk.decrypt(prod))
    np.testing.assert_allclose(np.real(out), vals * vals, atol=2e-3)
