"""Vectorized 64-bit modular arithmetic for TPU (jnp, uint64 canonical).

TPUs have no native 64-bit integer datapath; XLA lowers uint64 ops to 32-bit
pairs.  We therefore write all widening arithmetic explicitly in terms of
32-bit halves so the lowering stays cheap and Pallas kernels can reuse the
identical formulas on uint32 pairs.  Behavioural contract mirrors the
reference device layer (include/uintmodmath.cuh): Barrett reduction of
128-bit values by a <=61-bit modulus using the two-word const_ratio, Shoup
multiplication, and the lazy [0, 2q) variants used inside NTT butterflies.

Conventions:
  * all values are jnp.uint64 arrays; moduli and precomputed constants are
    broadcastable against the data (typically shape (L, 1) against (L, N)).
  * functions ending in `_lazy` return values in [0, 2q); others in [0, q).
"""

from __future__ import annotations

import jax.numpy as jnp

MASK32 = jnp.uint64(0xFFFFFFFF)
U64_1 = jnp.uint64(1)


def mul_u64_full(a, b):
    """Full 64x64 -> 128-bit product as (hi, lo) uint64 pair."""
    a = a.astype(jnp.uint64) if hasattr(a, "astype") else jnp.uint64(a)
    b = b.astype(jnp.uint64) if hasattr(b, "astype") else jnp.uint64(b)
    a_lo = a & MASK32
    a_hi = a >> 32
    b_lo = b & MASK32
    b_hi = b >> 32
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    # carry-aware middle sum: each term < 2^32 so the sum fits in u64
    mid = (ll >> 32) + (lh & MASK32) + (hl & MASK32)
    lo = (ll & MASK32) | (mid << 32)
    hi = hh + (lh >> 32) + (hl >> 32) + (mid >> 32)
    return hi, lo


def mul_u64_hi(a, b):
    """High 64 bits of the 64x64 product."""
    hi, _ = mul_u64_full(a, b)
    return hi


def add_u128(a_hi, a_lo, b_hi, b_lo):
    """(a_hi:a_lo) + (b_hi:b_lo) mod 2^128 as (hi, lo)."""
    lo = a_lo + b_lo
    carry = (lo < a_lo).astype(jnp.uint64)
    hi = a_hi + b_hi + carry
    return hi, lo


def barrett_reduce_u128(x_hi, x_lo, q, ratio_lo, ratio_hi):
    """Reduce a 128-bit value mod q (q < 2^61) via the two-word Barrett ratio
    floor(2^128/q) = ratio_hi:ratio_lo.  Mirrors the reference's
    barrett_reduce_uint128_uint64 (include/uintmodmath.cuh:96-136)."""
    # Round 1: carry = hi64(x_lo * ratio_lo)
    carry = mul_u64_hi(x_lo, ratio_lo)
    # 128-bit tmp2 = x_lo * ratio_hi
    tmp2_hi, tmp2_lo = mul_u64_full(x_lo, ratio_hi)
    tmp1 = tmp2_lo + carry
    tmp3 = tmp2_hi + (tmp1 < carry).astype(jnp.uint64)
    # Round 2: tmp2 = x_hi * ratio_lo
    tmp2_hi, tmp2_lo = mul_u64_full(x_hi, ratio_lo)
    tmp1b = tmp1 + tmp2_lo
    carry = tmp2_hi + (tmp1b < tmp2_lo).astype(jnp.uint64)
    # quotient estimate (mod 2^64)
    tmp1c = x_hi * ratio_hi + tmp3 + carry
    # remainder estimate
    tmp3r = x_lo - tmp1c * q
    # one conditional subtraction
    return jnp.where(tmp3r >= q, tmp3r - q, tmp3r)


def barrett_reduce_u64(x, q, ratio_hi):
    """Reduce a 64-bit value mod q using ratio_hi = floor(2^128/q) >> 64.
    Mirrors barrett_reduce_uint64_uint64."""
    tmp = mul_u64_hi(x, ratio_hi)
    res = x - tmp * q
    return jnp.where(res >= q, res - q, res)


def mul_mod(a, b, q, ratio_lo, ratio_hi):
    """a*b mod q via full product + Barrett (both operands variable)."""
    hi, lo = mul_u64_full(a, b)
    return barrett_reduce_u128(hi, lo, q, ratio_lo, ratio_hi)


def mul_mod_shoup_lazy(a, w, w_shoup, q):
    """a*w mod q in [0, 2q) with Shoup-precomputed w_shoup = floor(w*2^64/q).
    Mirrors multiply_and_reduce_shoup_lazy (include/uintmodmath.cuh:207-231)."""
    hi = mul_u64_hi(a, w_shoup)
    return a * w - hi * q


def mul_mod_shoup(a, w, w_shoup, q):
    r = mul_mod_shoup_lazy(a, w, w_shoup, q)
    return jnp.where(r >= q, r - q, r)


def add_mod(a, b, q):
    s = a + b  # < 2^62, no wrap for q < 2^61
    return jnp.where(s >= q, s - q, s)


def sub_mod(a, b, q):
    d = a + q - b
    return jnp.where(d >= q, d - q, d)


def neg_mod(a, q):
    # returns q - a for a != 0, else 0
    return jnp.where(a == 0, a, q - a)


def csub(a, q):
    """Conditional subtract: reduce [0,2q) -> [0,q)."""
    return jnp.where(a >= q, a - q, a)
