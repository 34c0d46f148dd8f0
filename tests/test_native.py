"""Native C++ host math: bit-exact parity with the Python fallbacks."""

import numpy as np
import pytest

from tpu_fhe import native
from tpu_fhe.core import numth
from tpu_fhe.core.modulus import Modulus
from tpu_fhe.core.rns import RNSBase

RNG = np.random.default_rng(3)


def native_available():
    return native.get_lib() is not None


pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def test_powers_bitrev_parity():
    log_n = 10
    n = 1 << log_n
    q = numth.get_primes(n, 50, 1)[0]
    psi = numth.minimal_primitive_root(2 * n, q)
    got = native.powers_bitrev(psi, q, log_n)
    rev = numth.bit_reverse_perm(log_n)
    ref = np.zeros(n, dtype=np.uint64)
    p = 1
    for i in range(n):
        ref[rev[i]] = p
        p = (p * psi) % q
    np.testing.assert_array_equal(got, ref)


def test_shoup_vec_parity():
    q = numth.get_primes(4096, 59, 1)[0]
    vals = RNG.integers(0, q, 1000, dtype=np.uint64)
    got = native.shoup_vec(vals, q)
    ref = ((vals.astype(object) << 64) // q).astype(np.uint64)
    np.testing.assert_array_equal(got, ref)


def test_find_ntt_primes_parity_and_exclusion():
    # python fallback reference: descending search
    factor = 2 * 8192
    value = (1 << 50) - factor + 1
    ref = []
    while len(ref) < 5:
        if numth.is_prime(value):
            ref.append(value)
        value -= factor
    assert native.find_ntt_primes(8192, 50, 4) == ref[:4]
    excl = native.find_ntt_primes(8192, 50, 3, exclude={ref[0], ref[2]})
    assert excl == [ref[1], ref[3], ref[4]]


def test_decompose_i128_parity():
    base = RNSBase(tuple(Modulus(v) for v in numth.get_primes(4096, 55, 4)))
    coeffs = (
        [int(v) for v in RNG.integers(-2**62, 2**62, 64)]
        + [2**125 - 1, -(2**125 - 1), 2**64, -(2**64), -1, 0, 2**63, -(2**63)]
    )
    lo = np.array([c & 0xFFFFFFFFFFFFFFFF for c in coeffs], dtype=np.uint64)
    hi = np.array([c >> 64 for c in coeffs], dtype=np.int64)
    got = native.decompose_i128(lo, hi, list(base.values))
    ref = np.array(
        [[c % q for c in coeffs] for q in base.values], dtype=np.uint64
    )
    np.testing.assert_array_equal(got, ref)


def test_is_prime_u64():
    lib = native.get_lib()
    for p in (2, 3, 1125899906826241, 0x1FFFFFFFFFE00001):
        assert lib.is_prime_u64(p) == 1
    for c in (1, 4, 1125899906826241 * 3, 2**61 - 3):
        assert lib.is_prime_u64(c) == int(numth.is_prime(c))
