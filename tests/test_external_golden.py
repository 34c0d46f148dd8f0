"""Externally-derived golden vectors: break the self-consistency loop.

Every other bit-exactness claim in this suite compares the device kernels
against the repo's own golden_* NumPy reference.  These tests instead pin
values derived INDEPENDENTLY inside the test body, with no reliance on the
library's twiddle-table machinery:

  * a textbook O(n^2) negacyclic DFT with its own primitive-root search
    (pure Python pow/ints), compared element-by-element to the device NTT;
  * negacyclic polynomial products computed with numpy object-int
    convolution reduced mod (x^n + 1, q), compared to NTT-domain
    pointwise multiplication;
  * a hand-pinned 8-point NTT vector over q=257, psi=2 (2^8 = -1 mod 257)
    — the expected output is a frozen literal.
"""

import numpy as np
import pytest

from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.ntt_tables import make_ntt_tables
from tpu_fhe.ops.ntt import build_device_ntt_tables, forward_ntt, inverse_ntt
from tpu_fhe.ops.w64 import W64


def _primitive_2n_root(n: int, q: int) -> int:
    """Minimal psi with psi^n = -1 mod q — independent brute-force scan
    (the library's convention is also the minimal psi; agreeing on psi is
    itself part of the cross-check)."""
    for psi in range(2, q):
        if pow(psi, n, q) == q - 1:
            return psi
    raise AssertionError("no root found")


def _bitrev(i: int, bits: int) -> int:
    return int(format(i, f"0{bits}b")[::-1], 2)


@pytest.mark.parametrize("log_n", [3, 5])
def test_device_ntt_matches_textbook_dft(log_n):
    n = 1 << log_n
    q = int(CoeffModulus.create(n, [30])[0].value)
    t = make_ntt_tables(log_n, q)
    rng = np.random.default_rng(5)
    coeffs = rng.integers(0, q, n, dtype=np.uint64)

    dev = forward_ntt(W64.from_np(coeffs[None].copy()),
                      build_device_ntt_tables([t]))
    got = dev.to_np()[0]

    # independent evaluation: output index i holds f(psi^(2*br(i)+1))
    psi = _primitive_2n_root(n, q)
    assert psi == t.root, "root convention diverged from minimal-psi"
    expect = np.array([
        sum(int(coeffs[k]) * pow(psi, (2 * _bitrev(i, log_n) + 1) * k, q)
            for k in range(n)) % q
        for i in range(n)
    ], dtype=np.uint64)
    np.testing.assert_array_equal(got, expect)


def test_ntt_pointwise_equals_object_int_negacyclic_product():
    n, log_n, bits = 16, 4, 40
    q = int(CoeffModulus.create(n, [bits])[0].value)
    rng = np.random.default_rng(9)
    a = rng.integers(0, q, n, dtype=np.uint64)
    b = rng.integers(0, q, n, dtype=np.uint64)

    tabs = build_device_ntt_tables([make_ntt_tables(log_n, q)])
    fa = forward_ntt(W64.from_np(a[None].copy()), tabs)
    fb = forward_ntt(W64.from_np(b[None].copy()), tabs)
    prod_ntt = W64.from_np(
        (fa.to_np().astype(object) * fb.to_np().astype(object) % q
         ).astype(np.uint64)
    )
    got = inverse_ntt(prod_ntt, tabs).to_np()[0]

    # independent negacyclic product: object-int convolution mod (x^n+1, q)
    full = np.convolve(a.astype(object), b.astype(object))
    red = np.zeros(n, dtype=object)
    for i, v in enumerate(full):
        if i < n:
            red[i] += v
        else:
            red[i - n] -= v
    expect = (red % q).astype(np.uint64)
    np.testing.assert_array_equal(got, expect)


def test_hand_pinned_8point_ntt_q257():
    """n=8, q=257, psi=2 (2^8 = 256 = -1 mod 257).  The expected vector is
    a frozen literal computed outside the library."""
    n, log_n, q, psi = 8, 3, 257, 2
    assert pow(psi, n, q) == q - 1
    coeffs = np.array([1, 2, 3, 4, 5, 6, 7, 8], dtype=np.uint64)
    pinned = np.array([251, 60, 253, 17, 151, 131, 149, 24], dtype=np.uint64)

    t = make_ntt_tables(log_n, q)
    assert t.root == psi
    dev = forward_ntt(W64.from_np(coeffs[None].copy()),
                      build_device_ntt_tables([t]))
    np.testing.assert_array_equal(dev.to_np()[0], pinned)
