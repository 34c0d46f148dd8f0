"""Modulus-chain count cap scoping + wide-base conversion safety.

The reference caps chains at 64 primes (defines.h:19); we allow up to 128
only in the q32 regime (every prime < 2^30) where accumulator terms are
< 2^61 (see PARITY.md).  The generic VPU bconv fallback must stay exact for
any legal base length via chunked 128-bit accumulation (ops/bconv.py), and
the q32 MXU kernel must keep engaging above 64 input limbs.
"""

import numpy as np
import pytest

from tpu_fhe.core.modulus import CoeffModulus, Modulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.ops import bconv, w64


def test_create_rejects_wide_60bit_chain():
    with pytest.raises(ValueError, match="q32"):
        CoeffModulus.create(1 << 15, [60] * 65)


def test_create_accepts_wide_q32_chain():
    mods = CoeffModulus.create(1 << 14, [28] * 80)
    assert len(mods) == 80
    assert all(m.value < (1 << 28) for m in mods)


def test_create_rejects_mixed_wide_chain():
    # one >30-bit prime disqualifies the q32 cap
    with pytest.raises(ValueError, match="q32"):
        CoeffModulus.create(1 << 15, [31] + [28] * 70)


def test_params_enforce_scoped_cap():
    mods60 = CoeffModulus.create(1 << 15, [50] * 64)
    extra = CoeffModulus.create(1 << 15, [49])
    with pytest.raises(ValueError, match="q32"):
        EncryptionParameters(
            scheme=SchemeType.ckks,
            poly_modulus_degree=1 << 15,
            allow_insecure=True,
            coeff_modulus=tuple(mods60) + tuple(extra),
            special_modulus_size=1,
        )
    mods30 = CoeffModulus.create(1 << 14, [28] * 70)
    p = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=1 << 14,
        allow_insecure=True,
        coeff_modulus=tuple(mods30),
        special_modulus_size=2,
    )
    assert p.size_QP == 70


def _ref_bconv(x, M, p):
    xo = x.astype(object)
    Mo = M.astype(object)
    out = np.zeros((M.shape[0],) + x.shape[1:], dtype=object)
    for j in range(M.shape[0]):
        out[j] = (Mo[j][:, None] * xo).sum(axis=0) % int(p[j, 0])
    return out.astype(np.uint64)


def _out_base(k_out, bits):
    ps = CoeffModulus.create(1 << 13, [bits] * k_out)
    p = np.array([[m.value] for m in ps], dtype=np.uint64)
    rlo = np.array([[m.const_ratio[0]] for m in ps], dtype=np.uint64)
    rhi = np.array([[m.const_ratio[1]] for m in ps], dtype=np.uint64)
    return p, rlo, rhi


@pytest.mark.parametrize("k_in", [64, 100, 127])
def test_generic_bconv_chunked_accumulation_exact(monkeypatch, k_in):
    """VPU fallback with > 63 input limbs of worst-case 61-bit terms: the
    chunked accumulation must match the bigint reference (the unchunked
    round-1 loop would wrap mod 2^128 here)."""
    monkeypatch.setenv("TPU_FHE_MXU_BCONV", "never")
    monkeypatch.setenv("TPU_FHE_PALLAS", "never")
    rng = np.random.default_rng(k_in)
    p, rlo, rhi = _out_base(4, 59)
    M = np.full((4, k_in), (1 << 61) - 1, dtype=np.uint64)
    x = np.full((k_in, 128), (1 << 61) - 1, dtype=np.uint64)
    x[1:] = rng.integers(0, 1 << 61, size=(k_in - 1, 128), dtype=np.uint64)
    got = bconv.bconv_matmul(w64.W64.from_np(x), M, p, rlo, rhi).to_np()
    assert np.array_equal(got, _ref_bconv(x, M, p))


@pytest.mark.parametrize("k_in", [70, 100])
def test_q32_mxu_kernel_engages_above_64_limbs(monkeypatch, k_in):
    """q32 sources with 64-127 limbs must keep the exact pallas32 kernel
    (ADVICE round 1): force-dispatch through bconv_matmul and compare."""
    monkeypatch.setenv("TPU_FHE_MXU_BCONV", "always")
    rng = np.random.default_rng(k_in * 7)
    p, rlo, rhi = _out_base(6, 29)
    M = rng.integers(0, 1 << 29, size=(6, k_in), dtype=np.uint64)
    x = rng.integers(0, 1 << 29, size=(k_in, 256), dtype=np.uint64)
    got = bconv.bconv_matmul(
        w64.W64.from_np(x), M, p, rlo, rhi, src_q32=True
    ).to_np()
    assert np.array_equal(got, _ref_bconv(x, M, p))


@pytest.mark.parametrize("k", [16, 30, 60])
def test_frac_alpha_s2_overflow_exact(k):
    """S2 = sum x_i*frac_lo_i genuinely exceeds 2^128 for arbitrary
    fraction tables with many 61-bit residues; the chunk-folded
    accumulation must still produce floor-exact alpha (the round-1
    single-u128 accumulator lost one unit per 2^128 wrap)."""
    rng = np.random.default_rng(k)
    n = 128
    # adversarial fractions: frac_lo forced to the max word
    fh = rng.integers(0, 1 << 32, size=(k, 1), dtype=np.uint64)
    fl = np.full((k, 1), (1 << 64) - 1, dtype=np.uint64)
    x = np.full((k, n), (1 << 61) - 1, dtype=np.uint64)
    x[1:] = rng.integers(0, 1 << 61, size=(k - 1, n), dtype=np.uint64)
    got = bconv.frac_alpha(
        w64.W64.from_np(x), fh, fl
    ).to_np()[0]
    ref = np.zeros(n, dtype=np.uint64)
    xo = x.astype(object)
    for j in range(n):
        s1 = sum(int(xo[i, j]) * int(fh[i, 0]) for i in range(k))
        s2 = sum(int(xo[i, j]) * int(fl[i, 0]) for i in range(k))
        # the documented semantics: S2's sub-2^64 bits truncate before
        # the final half-up rounding (error <= k * 2^-64)
        ref[j] = (s1 + (s2 >> 64) + (1 << 63)) >> 64
    assert np.array_equal(got, ref)
    if k >= 16:
        s2 = sum(int(xo[i, 0]) * int(fl[i, 0]) for i in range(k))
        assert s2 >> 128 > 0, "test vector no longer exercises the wrap"


def test_scale_and_round_hps_wide_base(monkeypatch):
    """scale_and_round_hps' wide branch (k+m >= 64) with enough terms to
    overflow an unchunked u128 accumulator."""
    monkeypatch.setenv("TPU_FHE_MXU_BCONV", "never")
    rng = np.random.default_rng(3)
    k, m, n = 100, 3, 128
    p, rlo, rhi = _out_base(m, 59)
    cross = np.full((m, k), (1 << 61) - 1, dtype=np.uint64)
    diag = rng.integers(0, 1 << 61, size=(m, 1), dtype=np.uint64)
    x_a = np.full((k, n), (1 << 61) - 1, dtype=np.uint64)
    x_b = rng.integers(0, 1 << 59, size=(m, n), dtype=np.uint64)
    # zero fractional part: alpha = 0, isolates the accumulation path
    fh = np.zeros((k, 1), dtype=np.uint64)
    fl = np.zeros((k, 1), dtype=np.uint64)
    got = bconv.scale_and_round_hps(
        w64.W64.from_np(x_a), w64.W64.from_np(x_b), cross, diag, fh, fl,
        p, rlo, rhi,
    ).to_np()
    ref = np.zeros((m, n), dtype=np.uint64)
    for j in range(m):
        acc = (cross[j].astype(object)[:, None] * x_a.astype(object)).sum(axis=0)
        acc = acc + int(diag[j, 0]) * x_b[j].astype(object)
        ref[j] = (acc % int(p[j, 0])).astype(np.uint64)
    assert np.array_equal(got, ref)
