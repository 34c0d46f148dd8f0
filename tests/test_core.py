"""Host core math: primes, moduli, RNS precompute, golden NTT."""

import pytest

from tpu_fhe.core import numth
from tpu_fhe.core.modulus import CoeffModulus, Modulus, PlainModulus
from tpu_fhe.core.ntt_tables import (
    golden_forward_ntt,
    golden_inverse_ntt,
    golden_negacyclic_eval,
    make_ntt_tables,
)
from tpu_fhe.core.rns import BaseConverter, KeySwitchDigits, RNSBase


def test_is_prime():
    assert numth.is_prime(2)
    assert numth.is_prime((1 << 61) - 1)
    assert not numth.is_prime(1)
    assert not numth.is_prime((1 << 61) - 3)


def test_get_primes_ntt_friendly():
    primes = numth.get_primes(4096, 36, 3)
    assert len(primes) == 3
    for p in primes:
        assert numth.is_prime(p)
        assert p % (2 * 4096) == 1
        assert p.bit_length() == 36
    # deterministic: descending
    assert primes == sorted(primes, reverse=True)


def test_modulus_barrett_ratio():
    for p in numth.get_primes(8192, 54, 2):
        m = Modulus(p)
        lo, hi, rem = m.const_ratio
        assert (hi << 64) + lo == (1 << 128) // p
        assert rem == (1 << 128) % p


def test_coeff_modulus_create():
    mods = CoeffModulus.create(8192, [36, 36, 37])
    assert len(mods) == 3
    vals = [m.value for m in mods]
    assert len(set(vals)) == 3
    assert vals[0] != vals[1]  # same-size entries distinct
    t = PlainModulus.batching(8192, 20)
    assert t.value % (2 * 8192) == 1


def test_minimal_primitive_root():
    q = numth.get_primes(64, 30, 1)[0]
    r = numth.minimal_primitive_root(128, q)
    assert numth.is_primitive_root(r, 128, q)
    # minimality: no smaller primitive root among odd powers
    cur = r
    gen_sq = (r * r) % q
    for _ in range(64):
        assert cur >= r
        cur = (cur * gen_sq) % q


@pytest.mark.parametrize("log_n", [3, 6, 8])
def test_golden_ntt_roundtrip_and_ordering(log_n):
    n = 1 << log_n
    q = numth.get_primes(n, 30, 1)[0]
    t = make_ntt_tables(log_n, q)
    import random

    rng = random.Random(42)
    coeffs = [rng.randrange(q) for _ in range(n)]
    evals = golden_forward_ntt(coeffs, t)
    # ordering: index i = evaluation at psi^(2*br(i)+1)
    assert evals == golden_negacyclic_eval(coeffs, t)
    back = golden_inverse_ntt(evals, t)
    assert back == coeffs


def test_negacyclic_property():
    # multiply by x in NTT domain == negacyclic shift in coeff domain
    log_n = 4
    n = 1 << log_n
    q = numth.get_primes(n, 30, 1)[0]
    t = make_ntt_tables(log_n, q)
    import random

    rng = random.Random(1)
    f = [rng.randrange(q) for _ in range(n)]
    x_poly = [0, 1] + [0] * (n - 2)
    ff = golden_forward_ntt(f, t)
    xx = golden_forward_ntt(x_poly, t)
    prod = [(a * b) % q for a, b in zip(ff, xx)]
    got = golden_inverse_ntt(prod, t)
    expect = [(q - f[-1]) % q] + f[:-1]  # x*f mod (x^n + 1)
    assert got == expect


def test_rns_base_compose_decompose():
    mods = tuple(Modulus(p) for p in numth.get_primes(1024, 40, 4))
    base = RNSBase(mods)
    v = 123456789012345678901234567890 % base.big_modulus
    res = base.decompose(v)
    assert base.compose(res) == v
    # q_hat_inv correctness
    for i, m in enumerate(base.base):
        assert (base.punctured_products[i] * base.q_hat_inv_mod_q[i]) % m.value == 1


def test_base_converter_behz_overshoot():
    imods = tuple(Modulus(p) for p in numth.get_primes(1024, 40, 3))
    omods = tuple(Modulus(p) for p in numth.get_primes(1024, 41, 2))
    conv = BaseConverter(RNSBase(imods), RNSBase(omods))
    import random

    rng = random.Random(7)
    Q = conv.ibase.big_modulus
    v = rng.randrange(Q)
    res = conv.ibase.decompose(v)
    got = conv.convert_behz_golden(res)
    # BEHZ result = v + alpha*Q mod p for some alpha in [0, k)
    ok = []
    for j, p in enumerate(conv.obase.values):
        ok.append(any((v + a * Q) % p == got[j] for a in range(len(imods) + 1)))
    assert all(ok)
    assert conv.convert_exact(res) == [v % p for p in conv.obase.values]


def test_keyswitch_digits():
    q_mods = tuple(Modulus(p) for p in numth.get_primes(1024, 40, 5))
    p_mods = tuple(Modulus(p) for p in numth.get_primes(1024, 41, 2))
    digits = KeySwitchDigits(RNSBase(q_mods), RNSBase(p_mods), alpha=2)
    assert digits.beta == 3
    assert [len(b) for b in digits.digit_bases] == [2, 2, 1]
    assert [len(b) for b in digits.complement_bases] == [5, 5, 6]
    # complement of digit 0 excludes q0,q1
    assert digits.complement_bases[0].values == tuple(
        m.value for m in q_mods[2:]
    ) + tuple(m.value for m in p_mods)
