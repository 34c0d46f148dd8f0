"""RNS fast basis conversion on device (u32-pair arithmetic, exact).

TPU-native equivalent of the reference's rns_bconv kernels
(src/rns_bconv.cu:22-433): the conversion is a small modular matmul
   y[j, n] = (sum_i  s[i, n] * qhat_mod_p[j, i])  mod p_j
with s[i] = [x_i * qhat_i^{-1}]_{q_i}.  The inner dimension (ibase size,
<= ~16 for modup digits) is looped statically while the coefficient axis is
fully vectorized; partial products accumulate in an explicit 128-bit
(hi, lo) W64 pair, mirroring the reference's uint128 accumulation, and a
single Barrett reduction lands each output limb.  Sum bound: terms < 2^122,
ibase <= 64 --> < 2^128, no overflow.
"""

from __future__ import annotations

from . import w64
from .w64 import W64


def bconv_scale(x, qhatinv, qhatinv_shoup, q) -> W64:
    """s[i] = x[i] * qhat_i^{-1} mod q_i  (per input limb Shoup multiply).

    x: (..., k, N) W64; qhatinv/q: (k, 1) tables."""
    return w64.mul_mod_shoup(x, qhatinv, qhatinv_shoup, q)


def bconv_matmul(scaled: W64, qhat_mod_p, p, p_ratio_lo, p_ratio_hi) -> W64:
    """Accumulate scaled residues into the output base.

    scaled:      (..., k, N) W64, already multiplied by qhat_inv
    qhat_mod_p:  (m, k) uint64 table [p_j][q_i]
    p, ratios:   (m, 1) output moduli and Barrett ratios
    returns      (..., m, N) W64 = BEHZ fast conversion (with alpha*Q
                 overshoot, exactly as the reference's bConv_BEHZ).
    """
    k = scaled.shape[-2]
    n = scaled.shape[-1]
    lead = scaled.shape[:-2]
    m = qhat_mod_p.shape[0]
    w = w64.as_w64(qhat_mod_p)
    acc_hi = w64.zeros(lead + (m, n))
    acc_lo = w64.zeros(lead + (m, n))
    for i in range(k):
        xi = scaled[..., i:i + 1, :]               # (..., 1, N)
        hi, lo = w64.mul_u64_full(xi, w[:, i:i + 1])
        acc_hi, acc_lo = w64.add_u128(acc_hi, acc_lo, hi, lo)
    return w64.barrett_reduce_u128(acc_hi, acc_lo, p, p_ratio_lo, p_ratio_hi)


def bconv_behz(x, qhatinv, qhatinv_shoup, q, qhat_mod_p, p, p_ratio_lo, p_ratio_hi):
    """Full BEHZ fast conversion ibase -> obase."""
    s = bconv_scale(x, qhatinv, qhatinv_shoup, q)
    return bconv_matmul(s, qhat_mod_p, p, p_ratio_lo, p_ratio_hi)
