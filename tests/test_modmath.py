"""Device modular arithmetic vs exact Python-int golden, bit-exact."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_fhe.core import numth
from tpu_fhe.core.modulus import Modulus
from tpu_fhe.core.ntt_tables import compute_shoup
from tpu_fhe.ops import modmath as mm

RNG = np.random.default_rng(2024)


def rand_u64(shape, bits=64):
    return RNG.integers(0, 1 << bits, size=shape, dtype=np.uint64)


def test_mul_u64_full():
    a = rand_u64((512,))
    b = rand_u64((512,))
    hi, lo = mm.mul_u64_full(jnp.asarray(a), jnp.asarray(b))
    prod = a.astype(object) * b.astype(object)
    np.testing.assert_array_equal(
        np.asarray(lo, dtype=np.uint64),
        np.array([p & ((1 << 64) - 1) for p in prod], dtype=np.uint64),
    )
    np.testing.assert_array_equal(
        np.asarray(hi, dtype=np.uint64),
        np.array([p >> 64 for p in prod], dtype=np.uint64),
    )


@pytest.mark.parametrize("bits", [30, 50, 59, 61])
def test_barrett_reduce_u128(bits):
    q = numth.get_primes(64, bits, 1)[0]
    m = Modulus(q)
    x = rand_u64((1024,))
    y = rand_u64((1024,))
    got = mm.barrett_reduce_u128(
        jnp.asarray(y), jnp.asarray(x),
        jnp.uint64(q), jnp.uint64(m.const_ratio[0]), jnp.uint64(m.const_ratio[1]),
    )
    expect = [( (int(yy) << 64 | int(xx)) % q) for xx, yy in zip(x, y)]
    np.testing.assert_array_equal(np.asarray(got), np.array(expect, dtype=np.uint64))


@pytest.mark.parametrize("bits", [30, 59, 61])
def test_mul_mod(bits):
    q = numth.get_primes(64, bits, 1)[0]
    m = Modulus(q)
    a = rand_u64((1024,)) % np.uint64(q)
    b = rand_u64((1024,)) % np.uint64(q)
    got = mm.mul_mod(
        jnp.asarray(a), jnp.asarray(b),
        jnp.uint64(q), jnp.uint64(m.const_ratio[0]), jnp.uint64(m.const_ratio[1]),
    )
    expect = (a.astype(object) * b.astype(object)) % q
    np.testing.assert_array_equal(np.asarray(got), expect.astype(np.uint64))


@pytest.mark.parametrize("bits", [30, 59, 61])
def test_mul_mod_shoup(bits):
    q = numth.get_primes(64, bits, 1)[0]
    w = int(rand_u64(()) % np.uint64(q))
    ws = compute_shoup(w, q)
    a = rand_u64((1024,)) % np.uint64(q)
    got = mm.mul_mod_shoup(jnp.asarray(a), jnp.uint64(w), jnp.uint64(ws), jnp.uint64(q))
    expect = (a.astype(object) * w) % q
    np.testing.assert_array_equal(np.asarray(got), expect.astype(np.uint64))
    lazy = mm.mul_mod_shoup_lazy(
        jnp.asarray(a), jnp.uint64(w), jnp.uint64(ws), jnp.uint64(q)
    )
    lazy = np.asarray(lazy).astype(object)
    assert np.all(lazy < 2 * q)
    assert np.all((lazy % q) == expect)


def test_add_sub_neg_mod():
    q = numth.get_primes(64, 61, 1)[0]
    a = rand_u64((512,)) % np.uint64(q)
    b = rand_u64((512,)) % np.uint64(q)
    qd = jnp.uint64(q)
    np.testing.assert_array_equal(
        np.asarray(mm.add_mod(jnp.asarray(a), jnp.asarray(b), qd)),
        ((a.astype(object) + b.astype(object)) % q).astype(np.uint64),
    )
    np.testing.assert_array_equal(
        np.asarray(mm.sub_mod(jnp.asarray(a), jnp.asarray(b), qd)),
        ((a.astype(object) - b.astype(object)) % q).astype(np.uint64),
    )
    np.testing.assert_array_equal(
        np.asarray(mm.neg_mod(jnp.asarray(a), qd)),
        ((-a.astype(object)) % q).astype(np.uint64),
    )
