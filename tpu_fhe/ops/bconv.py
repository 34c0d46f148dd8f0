"""RNS fast basis conversion on device (jnp, exact u64/u128 arithmetic).

TPU-native equivalent of the reference's rns_bconv kernels
(src/rns_bconv.cu:22-433): the conversion is a small modular matmul
   y[j, n] = (sum_i  s[i, n] * qhat_mod_p[j, i])  mod p_j
with s[i] = [x_i * qhat_i^{-1}]_{q_i}.  The inner dimension (ibase size,
<= ~16 for modup digits) is looped statically while the coefficient axis is
fully vectorized; partial products accumulate in an explicit 128-bit
(hi, lo) pair, mirroring the reference's uint128 accumulation, and a single
Barrett reduction lands each output limb.  Sum bound: terms < 2^122, ibase
<= 64 --> < 2^128, no overflow.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import modmath as mm


def bconv_scale(x, qhatinv, qhatinv_shoup, q):
    """s[i] = x[i] * qhat_i^{-1} mod q_i  (per input limb Shoup multiply).

    x: (..., k, N); qhatinv/q: (k, 1) broadcastable."""
    return mm.mul_mod_shoup(x, qhatinv, qhatinv_shoup, q)


def bconv_matmul(scaled, qhat_mod_p, p, p_ratio_lo, p_ratio_hi):
    """Accumulate scaled residues into the output base.

    scaled:      (..., k, N) uint64, already multiplied by qhat_inv
    qhat_mod_p:  (m, k) uint64 table [p_j][q_i]
    p, ratios:   (m, 1) output moduli and Barrett ratios
    returns      (..., m, N) uint64 = BEHZ fast conversion (with alpha*Q
                 overshoot, exactly as the reference's bConv_BEHZ).
    """
    k = scaled.shape[-2]
    n = scaled.shape[-1]
    lead = scaled.shape[:-2]
    m = qhat_mod_p.shape[0]
    acc_hi = jnp.zeros(lead + (m, n), dtype=jnp.uint64)
    acc_lo = jnp.zeros(lead + (m, n), dtype=jnp.uint64)
    for i in range(k):
        xi = scaled[..., i:i + 1, :]               # (..., 1, N)
        w = qhat_mod_p[:, i:i + 1]                 # (m, 1)
        hi, lo = mm.mul_u64_full(xi, w)
        acc_hi, acc_lo = mm.add_u128(acc_hi, acc_lo, hi, lo)
    return mm.barrett_reduce_u128(acc_hi, acc_lo, p, p_ratio_lo, p_ratio_hi)


def bconv_behz(x, qhatinv, qhatinv_shoup, q, qhat_mod_p, p, p_ratio_lo, p_ratio_hi):
    """Full BEHZ fast conversion ibase -> obase."""
    s = bconv_scale(x, qhatinv, qhatinv_shoup, q)
    return bconv_matmul(s, qhat_mod_p, p, p_ratio_lo, p_ratio_hi)
