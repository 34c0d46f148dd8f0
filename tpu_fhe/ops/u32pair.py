"""64-bit modular arithmetic on (lo, hi) uint32 pairs.

The TPU VPU is a 32-bit machine: inside Pallas kernels u64 does not exist,
so the kernels carry every 64-bit quantity as two uint32 planes and widen
32x32 multiplies through 16-bit halves (all products fit uint32 exactly).
Formulas mirror ops/modmath.py (which operates on XLA-emulated uint64) —
the two layers are tested bit-identical against each other.
"""

from __future__ import annotations

import jax.numpy as jnp

# plain python ints: weak-typed scalars that fold into the ops without
# becoming captured constants inside Pallas kernels
M16 = 0xFFFF
U1 = 1


def mul32(a, b):
    """32x32 -> 64 as (lo, hi) uint32 (exact, via 16-bit halves)."""
    a0 = a & M16
    a1 = a >> 16
    b0 = b & M16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = (ll >> 16) + (lh & M16) + (hl & M16)          # <= 3*(2^16-1), fits
    lo = (ll & M16) | (mid << 16)
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)     # true hi < 2^32
    return lo, hi


def add64(alo, ahi, blo, bhi):
    lo = alo + blo
    carry = (lo < alo).astype(jnp.uint32)
    hi = ahi + bhi + carry
    return lo, hi


def sub64(alo, ahi, blo, bhi):
    lo = alo - blo
    borrow = (alo < blo).astype(jnp.uint32)
    hi = ahi - bhi - borrow
    return lo, hi


def mul64_full(alo, ahi, blo, bhi):
    """64x64 -> 128 as four uint32 words (w0 = lowest)."""
    # a*b = al*bl + ((al*bh + ah*bl) << 32) + (ah*bh << 64)
    w0, c0 = mul32(alo, blo)
    m1lo, m1hi = mul32(alo, bhi)
    m2lo, m2hi = mul32(ahi, blo)
    hhlo, hhhi = mul32(ahi, bhi)
    # w1 = c0 + m1lo + m2lo (with carries into w2)
    w1 = c0 + m1lo
    c1 = (w1 < c0).astype(jnp.uint32)
    w1b = w1 + m2lo
    c2 = (w1b < w1).astype(jnp.uint32)
    # w2 = m1hi + m2hi + hhlo + c1 + c2 (carries into w3)
    w2 = m1hi + m2hi
    c3 = (w2 < m1hi).astype(jnp.uint32)
    w2b = w2 + hhlo
    c4 = (w2b < w2).astype(jnp.uint32)
    w2c = w2b + c1 + c2
    c5 = (w2c < w2b).astype(jnp.uint32)
    w3 = hhhi + c3 + c4 + c5
    return w0, w1b, w2c, w3


def mul64_lo(alo, ahi, blo, bhi):
    """Low 64 bits of the product.  Cross terms only need their low 32 bits,
    which native wrapping uint32 multiply provides in one op."""
    w0, c0 = mul32(alo, blo)
    w1 = c0 + alo * bhi + ahi * blo
    return w0, w1


def mul64_hi(alo, ahi, blo, bhi):
    """High 64 bits of the product as (lo, hi)."""
    _, _, w2, w3 = mul64_full(alo, ahi, blo, bhi)
    return w2, w3


def geq64(alo, ahi, blo, bhi):
    return (ahi > bhi) | ((ahi == bhi) & (alo >= blo))


def csub64(alo, ahi, qlo, qhi):
    """Conditional subtract q: [0, 2q) -> [0, q)."""
    ge = geq64(alo, ahi, qlo, qhi)
    slo, shi = sub64(alo, ahi, qlo, qhi)
    return jnp.where(ge, slo, alo), jnp.where(ge, shi, ahi)


def add_mod64(alo, ahi, blo, bhi, qlo, qhi):
    slo, shi = add64(alo, ahi, blo, bhi)  # < 2q < 2^63, no wrap
    return csub64(slo, shi, qlo, qhi)


def sub_mod64(alo, ahi, blo, bhi, qlo, qhi):
    tlo, thi = add64(alo, ahi, qlo, qhi)
    slo, shi = sub64(tlo, thi, blo, bhi)
    return csub64(slo, shi, qlo, qhi)


def mul_mod_shoup64(alo, ahi, wlo, whi, wslo, wshi, qlo, qhi, lazy=False):
    """a*w mod q via Shoup: hi = mulhi64(a, w_shoup); r = a*w - hi*q."""
    hlo, hhi = mul64_hi(alo, ahi, wslo, wshi)
    awlo, awhi = mul64_lo(alo, ahi, wlo, whi)
    hqlo, hqhi = mul64_lo(hlo, hhi, qlo, qhi)
    rlo, rhi = sub64(awlo, awhi, hqlo, hqhi)  # in [0, 2q)
    if lazy:
        return rlo, rhi
    return csub64(rlo, rhi, qlo, qhi)


# ---------------------------------------------------------------------------
# single-word (q < 2^30) fast path: one u32 plane carries a full residue
# ---------------------------------------------------------------------------


def mulhi32(a, b):
    """High 32 bits of a 32x32 product (exact, via 16-bit halves)."""
    a0 = a & M16
    a1 = a >> 16
    b0 = b & M16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    mid = (ll >> 16) + (lh & M16) + (hl & M16)
    return a1 * b1 + (lh >> 16) + (hl >> 16) + (mid >> 16)


def csub32(x, q):
    """Conditional subtract: [0, 2q) -> [0, q) (single u32 word)."""
    return jnp.where(x >= q, x - q, x)


def mul_mod_shoup32(a, w, ws, q, lazy=False):
    """a*w mod q via Shoup against beta = 2^32: exact r in [0, 2q) for ANY
    a < 2^32 when ws = floor(w * 2^32 / q) and 2q < 2^32.  The wrapping
    32-bit evaluation of a*w - hi*q is exact because the true remainder
    fits one word."""
    hi = mulhi32(a, ws)
    r = a * w - hi * q
    if lazy:
        return r
    return csub32(r, q)


def barrett_reduce96_32(w0, w1, w2, q, ws_one, c32, c32s, c64, c64s):
    """(w2:w1:w0) mod q for q < 2^30: fold each 32-bit word with a Shoup
    multiply by 2^(32k) mod q.

    ws_one = floor(2^32/q) (the Shoup word of w=1: folding w0 is plain
    32-bit Barrett), (c32, c32s) = 2^32 mod q + Shoup, (c64, c64s) =
    2^64 mod q + Shoup.  The first two folds are reduced to [0, q) so the
    running sum stays under 4q < 2^32."""
    s0 = csub32(w0 - mulhi32(w0, ws_one) * q, q)
    s1 = csub32(mul_mod_shoup32(w1, c32, c32s, q, lazy=True), q)
    s2 = mul_mod_shoup32(w2, c64, c64s, q, lazy=True)
    s = s0 + s1 + s2  # < 4q
    return csub32(csub32(s, q + q), q)


def barrett_reduce128(w0, w1, w2, w3, qlo, qhi, r0lo, r0hi, r1lo, r1hi):
    """128-bit (w3:w2:w1:w0) mod q via two-word Barrett ratio
    (r1:r0) = floor(2^128/q); mirrors modmath.barrett_reduce_u128."""
    # carry = mulhi64(x_lo, ratio_lo)
    clo, chi = mul64_hi(w0, w1, r0lo, r0hi)
    # tmp2 = x_lo * ratio_hi (128-bit)
    t2_0, t2_1, t2_2, t2_3 = mul64_full(w0, w1, r1lo, r1hi)
    # tmp1 = tmp2_lo + carry; tmp3 = tmp2_hi + overflow
    t1lo, t1hi = add64(t2_0, t2_1, clo, chi)
    ovf = ((t1hi < t2_1) | ((t1hi == t2_1) & (t1lo < t2_0))).astype(jnp.uint32)
    t3lo, t3hi = add64(t2_2, t2_3, ovf, jnp.zeros_like(ovf))
    # tmp2 = x_hi * ratio_lo
    s0, s1, s2, s3 = mul64_full(w2, w3, r0lo, r0hi)
    t1blo, t1bhi = add64(t1lo, t1hi, s0, s1)
    ovf2 = ((t1bhi < s1) | ((t1bhi == s1) & (t1blo < s0))).astype(jnp.uint32)
    c2lo, c2hi = add64(s2, s3, ovf2, jnp.zeros_like(ovf2))
    # quotient (mod 2^64) = x_hi*ratio_hi + tmp3 + carry2
    qtlo, qthi = mul64_lo(w2, w3, r1lo, r1hi)
    qtlo, qthi = add64(qtlo, qthi, t3lo, t3hi)
    qtlo, qthi = add64(qtlo, qthi, c2lo, c2hi)
    # remainder = x_lo - q*quot (low 64)
    pqlo, pqhi = mul64_lo(qtlo, qthi, qlo, qhi)
    rlo, rhi = sub64(w0, w1, pqlo, pqhi)
    return csub64(rlo, rhi, qlo, qhi)
