"""Pallas TPU kernels validated in interpret mode on the CPU mesh:
bit-exactness of the fused NTT and the fused keyswitch inner product
against the XLA (W64) reference paths."""

import os

import numpy as np
import pytest

from tpu_fhe.core import numth
from tpu_fhe.core.ntt_tables import make_ntt_tables
from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.eval import evaluator as ev
from tpu_fhe.ops import w64
from tpu_fhe.ops.ntt import build_device_ntt_tables, forward_ntt, inverse_ntt
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey

RNG = np.random.default_rng(99)


@pytest.fixture
def force_pallas(monkeypatch):
    monkeypatch.setenv("TPU_FHE_PALLAS", "always")


def test_pallas_ntt_matches_xla(force_pallas, monkeypatch):
    n = 2048
    primes = numth.get_primes(n, 50, 3)
    host = [make_ntt_tables(n.bit_length() - 1, q) for q in primes]
    dev = build_device_ntt_tables(host).to_device()
    x = w64.W64.from_np(
        RNG.integers(0, 1 << 49, size=(3, n), dtype=np.uint64)
        % np.asarray(primes, dtype=np.uint64)[:, None]
    )
    got_f = forward_ntt(x, dev).to_np()
    got_rt = inverse_ntt(forward_ntt(x, dev), dev).to_np()
    monkeypatch.setenv("TPU_FHE_PALLAS", "never")
    ref_f = forward_ntt(x, dev).to_np()
    np.testing.assert_array_equal(got_f, ref_f)
    np.testing.assert_array_equal(got_rt, x.to_np())


def test_pallas_key_inner_product_matches_xla(force_pallas, monkeypatch):
    n = 2048
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, [50, 40, 40, 40, 50])),
        special_modulus_size=1,
    )
    ctx = FheContext(params)
    level = ctx.level(1)
    sk = SecretKey(ctx, key=5)
    rlk = sk.relin_key()
    qs = np.array([m.value for m in level.base.base], dtype=np.uint64)
    c2 = (
        RNG.integers(0, 1 << 49, size=(level.size, n), dtype=np.uint64)
        % qs[:, None]
    )
    t = ev.modup(ctx, level, w64.W64.from_np(c2), is_ntt=True)
    got = ev.key_inner_product(ctx, level, t, rlk).to_np()
    monkeypatch.setenv("TPU_FHE_PALLAS", "never")
    ref = ev.key_inner_product(ctx, level, t, rlk).to_np()
    np.testing.assert_array_equal(got, ref)


def test_pallas_fwd_sub_scale_matches_xla(force_pallas, monkeypatch):
    from tpu_fhe.core.ntt_tables import compute_shoup
    from tpu_fhe.ops.ntt import forward_ntt_sub_scale

    n = 2048
    primes = numth.get_primes(n, 50, 3)
    host = [make_ntt_tables(n.bit_length() - 1, q) for q in primes]
    dev = build_device_ntt_tables(host).to_device()
    qs = np.asarray(primes, dtype=np.uint64)
    x = w64.W64.from_np(
        RNG.integers(0, 1 << 49, size=(2, 3, n), dtype=np.uint64)
        % qs[:, None]
    )
    sub = w64.W64.from_np(
        RNG.integers(0, 1 << 49, size=(2, 3, n), dtype=np.uint64)
        % qs[:, None]
    )
    scale = np.array([[numth.invert_mod(12345, int(q))] for q in primes],
                     dtype=np.uint64)
    scale_sh = np.array(
        [[compute_shoup(int(s[0]), int(q))] for s, q in zip(scale, primes)],
        dtype=np.uint64,
    )
    pre = np.array([[65537 % int(q)] for q in primes], dtype=np.uint64)
    pre_sh = np.array(
        [[compute_shoup(int(p[0]), int(q))] for p, q in zip(pre, primes)],
        dtype=np.uint64,
    )
    for pr, prs in ((None, None), (pre, pre_sh)):
        got = forward_ntt_sub_scale(
            x, sub, dev, scale, scale_sh, pre=pr, pre_shoup=prs
        ).to_np()
        monkeypatch.setenv("TPU_FHE_PALLAS", "never")
        ref = forward_ntt_sub_scale(
            x, sub, dev, scale, scale_sh, pre=pr, pre_shoup=prs
        ).to_np()
        monkeypatch.setenv("TPU_FHE_PALLAS", "always")
        np.testing.assert_array_equal(got, ref)


def test_pallas_bconv_matmul_matches_xla(force_pallas, monkeypatch):
    from tpu_fhe.core.rns import RNSBase, BaseConverter
    from tpu_fhe.core.modulus import Modulus
    from tpu_fhe.ops.bconv import bconv_matmul

    n = 1024
    ib_primes = numth.get_primes(n, 50, 4)
    ob_primes = numth.get_primes(n, 40, 6)
    ib = RNSBase(tuple(Modulus(p) for p in ib_primes))
    ob = RNSBase(tuple(Modulus(p) for p in ob_primes))
    conv = BaseConverter(ib, ob)
    table = np.asarray(conv.q_hat_mod_p, dtype=np.uint64)
    p = np.asarray([[m.value] for m in ob.base], dtype=np.uint64)
    rlo = np.asarray([[m.const_ratio[0]] for m in ob.base], dtype=np.uint64)
    rhi = np.asarray([[m.const_ratio[1]] for m in ob.base], dtype=np.uint64)
    x = w64.W64.from_np(
        RNG.integers(0, 1 << 49, size=(2, 4, n), dtype=np.uint64)
        % np.asarray(ib_primes, dtype=np.uint64)[None, :, None]
    )
    got = bconv_matmul(x, table, p, rlo, rhi).to_np()
    monkeypatch.setenv("TPU_FHE_PALLAS", "never")
    ref = bconv_matmul(x, table, p, rlo, rhi).to_np()
    np.testing.assert_array_equal(got, ref)
