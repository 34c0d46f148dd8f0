"""W64 u32-pair arithmetic: bit-exact vs the uint64 reference (modmath)."""

import numpy as np
import jax.numpy as jnp

from tpu_fhe.core.ntt_tables import compute_shoup
from tpu_fhe.ops import modmath as mm, w64


RNG = np.random.default_rng(7)
Q = (1 << 60) - 93


def _fixtures(shape=(3, 64)):
    q = jnp.asarray(np.full((shape[0], 1), Q, dtype=np.uint64))
    ratio = (1 << 128) // Q
    rlo = jnp.asarray(np.full((shape[0], 1), ratio & ((1 << 64) - 1), dtype=np.uint64))
    rhi = jnp.asarray(np.full((shape[0], 1), ratio >> 64, dtype=np.uint64))
    a = jnp.asarray(RNG.integers(0, Q, size=shape, dtype=np.uint64))
    b = jnp.asarray(RNG.integers(0, Q, size=shape, dtype=np.uint64))
    return q, rlo, rhi, a, b


def _eq(got: w64.W64, exp):
    assert (got.to_np() == np.asarray(exp)).all()


def test_mod_ops_match_modmath():
    q, rlo, rhi, a, b = _fixtures()
    A, B = w64.W64.from_u64(a), w64.W64.from_u64(b)
    _eq(w64.add_mod(A, B, q), mm.add_mod(a, b, q))
    _eq(w64.sub_mod(A, B, q), mm.sub_mod(a, b, q))
    _eq(w64.neg_mod(A, q), mm.neg_mod(a, q))
    _eq(w64.mul_mod(A, B, q, rlo, rhi), mm.mul_mod(a, b, q, rlo, rhi))
    _eq(w64.barrett_reduce_u64(A, q, rhi), mm.barrett_reduce_u64(a, q, rhi))


def test_shoup_and_128bit():
    q, rlo, rhi, a, b = _fixtures()
    A, B = w64.W64.from_u64(a), w64.W64.from_u64(b)
    w_int = int(RNG.integers(1, Q))
    wv = jnp.asarray(np.full((3, 1), w_int, dtype=np.uint64))
    ws = jnp.asarray(np.full((3, 1), compute_shoup(w_int, Q), dtype=np.uint64))
    _eq(w64.mul_mod_shoup(A, wv, ws, q), mm.mul_mod_shoup(a, wv, ws, q))
    hi, lo = w64.mul_u64_full(A, B)
    hi2, lo2 = mm.mul_u64_full(a, b)
    _eq(hi, hi2)
    _eq(lo, lo2)
    h3, l3 = w64.add_u128(hi, lo, hi, lo)
    h4, l4 = mm.add_u128(hi2, lo2, hi2, lo2)
    _eq(h3, h4)
    _eq(l3, l4)
    _eq(
        w64.barrett_reduce_u128(hi, lo, q, rlo, rhi),
        mm.barrett_reduce_u128(hi2, lo2, q, rlo, rhi),
    )


def test_array_helpers_and_polymorphism():
    q, _, _, a, b = _fixtures()
    A, B = w64.W64.from_u64(a), w64.W64.from_u64(b)
    # u64-array operand is split on the fly
    _eq(w64.add_mod(A, b, q), mm.add_mod(a, b, q))
    _eq(w64.where(a % 2 == 0, A, B), jnp.where(a % 2 == 0, a, b))
    _eq(w64.stack([A, B])[1], b)
    _eq(w64.concat([A, B], axis=0), jnp.concatenate([a, b], axis=0))
    _eq(A.at[0].set(B[0]), a.at[0].set(b[0]))
    _eq(A[..., ::2], a[..., ::2])
    _eq(w64.shift_right(A, 33), a >> 33)
    assert w64.zeros((2, 3)).shape == (2, 3)
    assert bool(w64.gt(w64.W64.from_u64(jnp.uint64(5)), w64.W64.from_u64(jnp.uint64(4))))
