"""On-device samplers for RLWE (counter-based JAX PRNG).

The reference uses Salsa20 on device (src/prng.cu); we use JAX's
counter-based threefry keys — different generator, identical distributions:
  * uniform residues mod q_i (per-limb uniform == uniform over R_Q by CRT),
  * ternary secret in {-1, 0, 1} (src/prng.cu sample_ternary_poly),
  * centered binomial error with 21 bits per side, sigma ~= 3.24
    (src/prng.cu:222-243: popcount of 21 bits minus popcount of 21 bits).

Uniform sampling reduces 128 random bits mod q (bias < 2^-67) instead of
rejection sampling — statistically indistinguishable and branch-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import modmath as mm


def _random_u64(key, shape):
    hi = jax.random.bits(key, shape, dtype=jnp.uint32)
    key2 = jax.random.fold_in(key, 1)
    lo = jax.random.bits(key2, shape, dtype=jnp.uint32)
    return (hi.astype(jnp.uint64) << 32) | lo.astype(jnp.uint64)


def sample_uniform(key, num_limbs: int, n: int, q, ratio_lo, ratio_hi):
    """Uniform residues: (num_limbs, n) with row i uniform in [0, q_i)."""
    k1, k2 = jax.random.split(key)
    x_hi = _random_u64(k1, (num_limbs, n))
    x_lo = _random_u64(k2, (num_limbs, n))
    return mm.barrett_reduce_u128(x_hi, x_lo, q, ratio_lo, ratio_hi)


def sample_ternary(key, n: int, q):
    """Ternary secret: one length-n vector in {-1,0,1} lifted to every limb.

    q: (L, 1). Returns (L, n) with -1 represented as q_i - 1."""
    r = jax.random.randint(key, (1, n), 0, 3)  # 0,1,2 -> -1,0,1
    val = r.astype(jnp.uint64)  # 0,1,2
    # map: 0 -> q-1 (i.e. -1), 1 -> 0, 2 -> 1
    return jnp.where(val == 0, q - 1, val - 1)


def sample_cbd_error(key, n: int, q):
    """Centered binomial: popcount(21 bits) - popcount(21 bits), lifted to
    every limb of q: (L, 1) -> (L, n)."""
    k1, k2 = jax.random.split(key)
    a = jax.random.bits(k1, (1, n), dtype=jnp.uint32) & jnp.uint32((1 << 21) - 1)
    b = jax.random.bits(k2, (1, n), dtype=jnp.uint32) & jnp.uint32((1 << 21) - 1)
    pa = jax.lax.population_count(a).astype(jnp.int64)
    pb = jax.lax.population_count(b).astype(jnp.int64)
    cbd = pa - pb  # in [-21, 21]
    pos = cbd.astype(jnp.uint64)
    neg = (q + cbd.astype(jnp.uint64))  # wraps correctly for negative cbd
    return jnp.where(cbd < 0, neg, jnp.broadcast_to(pos, neg.shape))
