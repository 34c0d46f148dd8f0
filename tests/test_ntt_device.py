"""Device NTT vs golden host NTT, bit-exact per limb."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_fhe.core import numth
from tpu_fhe.core.ntt_tables import (
    golden_forward_ntt,
    golden_inverse_ntt,
    make_ntt_tables,
)
from tpu_fhe.ops.ntt import build_device_ntt_tables, forward_ntt, inverse_ntt

RNG = np.random.default_rng(7)


def make_tables(log_n, bits, limbs):
    n = 1 << log_n
    qs = numth.get_primes(n, bits, limbs)
    return [make_ntt_tables(log_n, q) for q in qs]


@pytest.mark.parametrize("log_n,bits,limbs", [(3, 30, 1), (8, 50, 3), (10, 59, 2)])
def test_forward_matches_golden(log_n, bits, limbs):
    n = 1 << log_n
    host = make_tables(log_n, bits, limbs)
    dev = build_device_ntt_tables(host)
    x = np.stack(
        [RNG.integers(0, t.modulus.value, size=n, dtype=np.uint64) for t in host]
    )
    got = np.asarray(forward_ntt(jnp.asarray(x), dev))
    for l, t in enumerate(host):
        expect = golden_forward_ntt([int(v) for v in x[l]], t)
        np.testing.assert_array_equal(got[l], np.array(expect, dtype=np.uint64))


@pytest.mark.parametrize("log_n,bits,limbs", [(3, 30, 1), (8, 50, 3), (12, 59, 2)])
def test_roundtrip(log_n, bits, limbs):
    import jax

    n = 1 << log_n
    host = make_tables(log_n, bits, limbs)
    dev = build_device_ntt_tables(host)
    x = np.stack(
        [RNG.integers(0, t.modulus.value, size=n, dtype=np.uint64) for t in host]
    )
    xj = jnp.asarray(x)
    roundtrip = jax.jit(lambda v: inverse_ntt(forward_ntt(v, dev), dev))
    back = np.asarray(roundtrip(xj))
    np.testing.assert_array_equal(back, x)


def test_inverse_matches_golden():
    log_n, n = 6, 64
    host = make_tables(log_n, 59, 2)
    dev = build_device_ntt_tables(host)
    x = np.stack(
        [RNG.integers(0, t.modulus.value, size=n, dtype=np.uint64) for t in host]
    )
    got = np.asarray(inverse_ntt(jnp.asarray(x), dev))
    for l, t in enumerate(host):
        expect = golden_inverse_ntt([int(v) for v in x[l]], t)
        np.testing.assert_array_equal(got[l], np.array(expect, dtype=np.uint64))


def test_batched_leading_axes():
    log_n, n = 5, 32
    host = make_tables(log_n, 40, 2)
    dev = build_device_ntt_tables(host)
    x = RNG.integers(0, host[0].modulus.value, size=(3, 2, n), dtype=np.uint64)
    for l, t in enumerate(host):
        x[:, l] %= np.uint64(t.modulus.value)
    got = np.asarray(forward_ntt(jnp.asarray(x), dev))
    for b in range(3):
        single = np.asarray(forward_ntt(jnp.asarray(x[b]), dev))
        np.testing.assert_array_equal(got[b], single)
