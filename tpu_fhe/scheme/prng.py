"""On-device samplers for RLWE (counter-based JAX PRNG, u32-pair output).

The reference uses Salsa20 on device (src/prng.cu); we use JAX's
counter-based threefry keys — different generator, identical distributions:
  * uniform residues mod q_i (per-limb uniform == uniform over R_Q by CRT),
  * ternary secret in {-1, 0, 1} (src/prng.cu sample_ternary_poly),
  * centered binomial error with 21 bits per side, sigma ~= 3.24
    (src/prng.cu:222-243: popcount of 21 bits minus popcount of 21 bits).

Uniform sampling reduces 128 random bits mod q (bias < 2^-67) instead of
rejection sampling — statistically indistinguishable and branch-free.
All outputs are W64 pairs (the canonical device representation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import w64
from ..ops.w64 import W64


def _random_w64(key, shape) -> W64:
    hi = jax.random.bits(key, shape, dtype=jnp.uint32)
    key2 = jax.random.fold_in(key, 1)
    lo = jax.random.bits(key2, shape, dtype=jnp.uint32)
    return W64(lo, hi)


def sample_uniform(key, num_limbs: int, n: int, q, ratio_lo, ratio_hi) -> W64:
    """Uniform residues: (num_limbs, n) with row i uniform in [0, q_i)."""
    k1, k2 = jax.random.split(key)
    x_hi = _random_w64(k1, (num_limbs, n))
    x_lo = _random_w64(k2, (num_limbs, n))
    return w64.barrett_reduce_u128(x_hi, x_lo, q, ratio_lo, ratio_hi)


def sample_ternary(key, n: int, q) -> W64:
    """Ternary secret: one length-n vector in {-1,0,1} lifted to every limb.

    q: (L, 1) uint64. Returns (L, n) W64 with -1 represented as q_i - 1."""
    r = jax.random.randint(key, (1, n), 0, 3, dtype=jnp.int32)  # 0,1,2
    qp = w64.as_w64(q)
    shape = (qp.shape[0], n)
    # map: 0 -> q-1, 1 -> 0, 2 -> 1
    minus_one = w64.broadcast_to(w64.sub(qp, W64(jnp.uint32(1), jnp.uint32(0))), shape)
    small = W64(jnp.broadcast_to((r - 1).astype(jnp.uint32), shape),
                jnp.zeros(shape, dtype=jnp.uint32))
    return w64.where(jnp.broadcast_to(r == 0, shape), minus_one, small)


def sample_cbd_error(key, n: int, q) -> W64:
    """Centered binomial: popcount(21 bits) - popcount(21 bits), lifted to
    every limb of q: (L, 1) -> (L, n) W64."""
    k1, k2 = jax.random.split(key)
    a = jax.random.bits(k1, (1, n), dtype=jnp.uint32) & jnp.uint32((1 << 21) - 1)
    b = jax.random.bits(k2, (1, n), dtype=jnp.uint32) & jnp.uint32((1 << 21) - 1)
    pa = jax.lax.population_count(a).astype(jnp.int32)
    pb = jax.lax.population_count(b).astype(jnp.int32)
    cbd = pa - pb  # in [-21, 21]
    qp = w64.as_w64(q)
    shape = (qp.shape[0], n)
    pos = W64(jnp.broadcast_to(cbd.astype(jnp.uint32), shape),
              jnp.zeros(shape, dtype=jnp.uint32))
    mag = W64(jnp.broadcast_to((-cbd).astype(jnp.uint32), shape),
              jnp.zeros(shape, dtype=jnp.uint32))
    neg = w64.sub(w64.broadcast_to(qp, shape), mag)  # q - |cbd|
    return w64.where(jnp.broadcast_to(cbd < 0, shape), neg, pos)
