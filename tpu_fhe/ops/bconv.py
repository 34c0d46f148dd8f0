"""RNS fast basis conversion on device (u32-pair arithmetic, exact).

TPU-native equivalent of the reference's rns_bconv kernels
(src/rns_bconv.cu:22-433): the conversion is a small modular matmul
   y[j, n] = (sum_i  s[i, n] * qhat_mod_p[j, i])  mod p_j
with s[i] = [x_i * qhat_i^{-1}]_{q_i}.  The inner dimension (ibase size,
<= ~16 for modup digits) is looped statically while the coefficient axis is
fully vectorized; partial products accumulate in an explicit 128-bit
(hi, lo) W64 pair, mirroring the reference's uint128 accumulation, and a
single Barrett reduction lands each output limb.  Sum bound: terms < 2^122
(61-bit residue x 61-bit table entry), so up to 63 terms fit a 128-bit
accumulator; longer input bases (legal only in the q32 regime, whose terms
are < 2^61, but guarded here unconditionally) are accumulated in chunks of
63 with a Barrett landing per chunk and a final mod-p sum.
"""

from __future__ import annotations

import numpy as np

from . import w64
from .w64 import W64

LANES = 128
# Terms in the u128 accumulation are < 2^122, so 63 fit without overflow;
# longer sums reduce per chunk (see module docstring).
_ACC_CHUNK = 63


def _mxu_enabled() -> bool:
    """MXU (int8 dot) base conversion: default on TPU, overridable."""
    import os

    mode = os.environ.get("TPU_FHE_MXU_BCONV", "auto")
    if mode == "never":
        return False
    if mode == "always":
        return True
    import jax

    return jax.default_backend() == "tpu"


def bconv_scale(x, qhatinv, qhatinv_shoup, q) -> W64:
    """s[i] = x[i] * qhat_i^{-1} mod q_i  (per input limb Shoup multiply).

    x: (..., k, N) W64; qhatinv/q: (k, 1) tables."""
    return w64.mul_mod_shoup(x, qhatinv, qhatinv_shoup, q)


def bconv_matmul(scaled: W64, qhat_mod_p, p, p_ratio_lo, p_ratio_hi,
                 src_q32: bool = False) -> W64:
    """Accumulate scaled residues into the output base.

    scaled:      (..., k, N) W64, already multiplied by qhat_inv
    qhat_mod_p:  (m, k) uint64 table [p_j][q_i]
    p, ratios:   (m, 1) output moduli and Barrett ratios
    src_q32:     caller guarantees every residue in `scaled` is < 2^30
                 (q32 contexts); with p also < 2^30 the halved digit-plane
                 kernel engages
    returns      (..., m, N) W64 = BEHZ fast conversion (with alpha*Q
                 overshoot, exactly as the reference's bConv_BEHZ).
    """
    k = scaled.shape[-2]
    n = scaled.shape[-1]
    lead = scaled.shape[:-2]
    m = qhat_mod_p.shape[0]

    from .ntt_pallas import pallas_enabled

    # Context tables arrive as device arrays (shipped in one batched
    # device_put) but are host-known constants at trace time: normalize to
    # numpy so the fast kernels below engage (free for shipped tables).
    if not isinstance(qhat_mod_p, np.ndarray):
        from ..utils.device import host_np

        try:
            qhat_mod_p = host_np(qhat_mod_p, dtype=np.uint64)
        except Exception:  # traced (non-concrete) table: keep the XLA path
            pass

    if isinstance(scaled, W64) and isinstance(qhat_mod_p, np.ndarray) and _mxu_enabled():
        # int8 digit-plane matmul on the MXU (bit-exact).  The fused Pallas
        # form keeps the s32 diagonal tensor in VMEM; the XLA form is the
        # fallback for ragged N.  The generic digit-plane kernels size their
        # accumulators for k < 64; the q32 kernel is exact for any k here
        # (row sum < k*2^60 < 2^96), so large q32 bases keep the fast path.
        q32_kernel_ok = False
        if src_q32 and int(qhat_mod_p.max()) < (1 << 30):
            from ..utils.device import host_np

            q32_kernel_ok = int(host_np(p, dtype=np.uint64).max()) < (1 << 30)
        if n % LANES == 0:
            if q32_kernel_ok:
                from .bconv_mxu_pallas import bconv_matmul_mxu_pallas32

                return bconv_matmul_mxu_pallas32(scaled, qhat_mod_p, p)
            if k < 64:
                from .bconv_mxu_pallas import bconv_matmul_mxu_pallas

                return bconv_matmul_mxu_pallas(
                    scaled, qhat_mod_p, p, p_ratio_lo, p_ratio_hi
                )
        elif k < 64:
            from .bconv_mxu import bconv_matmul_mxu

            return bconv_matmul_mxu(scaled, qhat_mod_p, p, p_ratio_lo, p_ratio_hi)

    if (isinstance(scaled, W64) and isinstance(qhat_mod_p, np.ndarray)
            and pallas_enabled() and k < 64
            and n % 128 == 0 and (n // 128) % 8 == 0):
        from .bconv_pallas import bconv_matmul_pallas

        return bconv_matmul_pallas(scaled, qhat_mod_p, p, p_ratio_lo, p_ratio_hi)

    w = w64.as_w64(qhat_mod_p)
    out = None
    for c0 in range(0, k, _ACC_CHUNK):
        acc_hi = w64.zeros(lead + (m, n))
        acc_lo = w64.zeros(lead + (m, n))
        for i in range(c0, min(c0 + _ACC_CHUNK, k)):
            xi = scaled[..., i:i + 1, :]           # (..., 1, N)
            hi, lo = w64.mul_u64_full(xi, w[:, i:i + 1])
            acc_hi, acc_lo = w64.add_u128(acc_hi, acc_lo, hi, lo)
        part = w64.barrett_reduce_u128(acc_hi, acc_lo, p, p_ratio_lo, p_ratio_hi)
        out = part if out is None else w64.add_mod(out, part, p)
    return out


def bconv_behz(x, qhatinv, qhatinv_shoup, q, qhat_mod_p, p, p_ratio_lo, p_ratio_hi):
    """Full BEHZ fast conversion ibase -> obase."""
    s = bconv_scale(x, qhatinv, qhatinv_shoup, q)
    return bconv_matmul(s, qhat_mod_p, p, p_ratio_lo, p_ratio_hi)


# --------------------------------------------------------------------------
# HPS variants (fractional-rounding conversions, src/rns_bconv.cu:249-372 and
# the scaleAndRound_HPS kernels in src/rns.cu:1700-1810).  The reference
# computes the rounding correction with f64; TPU f64 is emulated, so the
# fraction is carried as 128-bit fixed point in two u64 words instead —
# error <= k * 2^-64 per coefficient (tighter than the reference's doubles).
# --------------------------------------------------------------------------

def frac_alpha(s: W64, frac_hi, frac_lo) -> W64:
    """alpha = round(sum_i s[i] * frac_i), as a (..., 1, N) u64.

    frac_i is given as 128-bit fixed point: frac_hi/frac_lo are (k, 1)
    uint64 words of floor(frac_i * 2^128).  Valid while the true sum is
    < 2^64 (the reference's double->uint64 cast has the same contract)."""
    k = s.shape[-2]
    lead = s.shape[:-2]
    n = s.shape[-1]
    fh = w64.as_w64(frac_hi)
    fl = w64.as_w64(frac_lo)
    zero = w64.zeros(lead + (1, n))
    # s1 = sum x_i*frac_hi_i is bounded by the contract (true fractional
    # sum < 2^64 -> s1 <= sum x_i*frac_i*2^64 < 2^128), but
    # S2 = sum x_i*frac_lo_i is NOT: frac_lo is the low word of the
    # fraction, ~uniform in [0, 2^64) for arbitrary fraction tables
    # (e.g. the t*QHatInv/q scale-and-round fractions), so S2 can exceed
    # 2^128 from ~16 limbs of 61-bit residues on.  Accumulate S2 in
    # chunks of 7 terms (7 * 2^125 < 2^128, exact) and fold each chunk's
    # words into two 128-bit accumulators: S2 = fold*2^64 + rem exactly.
    s1_hi, s1_lo = zero, zero
    fold_hi, fold_lo = zero, zero     # sum of chunk high words
    rem_hi, rem_lo = zero, zero       # sum of chunk low words
    for c0 in range(0, k, 7):
        c_hi, c_lo = zero, zero
        for i in range(c0, min(c0 + 7, k)):
            xi = s[..., i:i + 1, :]
            hi, lo = w64.mul_u64_full(xi, fh[i:i + 1])
            s1_hi, s1_lo = w64.add_u128(s1_hi, s1_lo, hi, lo)
            hi, lo = w64.mul_u64_full(xi, fl[i:i + 1])
            c_hi, c_lo = w64.add_u128(c_hi, c_lo, hi, lo)
        fold_hi, fold_lo = w64.add_u128(fold_hi, fold_lo, zero, c_hi)
        rem_hi, rem_lo = w64.add_u128(rem_hi, rem_lo, zero, c_lo)
    # floor(S2 / 2^64) = fold + floor(rem / 2^64) = fold + rem_hi (exact)
    s2_hi, s2_lo = w64.add_u128(fold_hi, fold_lo, zero, rem_hi)
    # total = s1/2^64 + S2/2^128; alpha = floor(total + 1/2)
    t_hi, t_lo = w64.add_u128(s1_hi, s1_lo, s2_hi, s2_lo)
    half = w64.full_like_scalar(t_lo.shape, 1 << 63)
    t_hi, _ = w64.add_u128(t_hi, t_lo, w64.zeros_like(t_hi), half)
    return t_hi


def _gather_rows(table: np.ndarray, idx) -> W64:
    """table (A, m) u64, idx (..., 1, N) int32 -> (..., m, N) W64 rows."""
    import jax.numpy as jnp

    t = w64.as_w64(np.asarray(table, dtype=np.uint64))
    sel_lo = jnp.take(t.lo, idx[..., 0, :], axis=0)   # (..., N, m)
    sel_hi = jnp.take(t.hi, idx[..., 0, :], axis=0)
    return W64(jnp.moveaxis(sel_lo, -1, -2), jnp.moveaxis(sel_hi, -1, -2))


def bconv_hps(x, qhatinv, qhatinv_shoup, q, qinv_hi, qinv_lo,
              qhat_mod_p, alpha_q_mod_p, p, p_ratio_lo, p_ratio_hi) -> W64:
    """Exact (centered) conversion ibase -> obase with fractional alpha
    (reference bConv_HPS, src/rns_bconv.cu:354-372).

    qinv_hi/lo: (k, 1) fixed-point words of 1/q_i;
    alpha_q_mod_p: (k+1, m) table of [v * Q]_{p_j} for v = 0..k."""
    import jax.numpy as jnp

    s = bconv_scale(x, qhatinv, qhatinv_shoup, q)
    y = bconv_matmul(s, qhat_mod_p, p, p_ratio_lo, p_ratio_hi)
    alpha = frac_alpha(s, qinv_hi, qinv_lo)        # values in [0, k]
    corr = _gather_rows(alpha_q_mod_p, alpha.lo.astype(jnp.int32))
    return w64.sub_mod(y, corr, p)


def scale_and_round_hps(x_a: W64, x_b: W64, cross, diag, frac_hi, frac_lo,
                        p, p_ratio_lo, p_ratio_hi) -> W64:
    """out_j = [sum_i x_a[i]*cross[j,i] + x_b[j]*diag[j] + alpha]_{p_j},
    alpha = round(sum_i x_a[i]*frac_i)  — the shared shape of
    scaleAndRound_HPS_{QR_R, QlRl_Ql, Q_Ql} (src/rns.cu:1700-1810).

    x_a: (..., k, N) the scaled source limbs; x_b: (..., m, N) the resident
    limbs of the output base; cross: (m, k); diag: (m, 1); frac over x_a."""
    from ..utils.device import host_np

    m = x_b.shape[-2]
    n = x_a.shape[-1]
    lead = x_a.shape[:-2]
    k = x_a.shape[-2]
    if k + m < 64:
        # fold the diagonal term into an extended conversion matrix
        # [cross | diag(diag)] applied to [x_a; x_b]: the whole multiply
        # chain then rides the fast bconv dispatch (fused MXU kernel on TPU)
        cr = host_np(cross, dtype=np.uint64)
        dg = host_np(diag, dtype=np.uint64).reshape(-1)
        ext = np.concatenate([cr, np.diag(dg).astype(np.uint64)], axis=1)
        x_ext = w64.concat([x_a, x_b], axis=-2)
        out = bconv_matmul(x_ext, ext, p, p_ratio_lo, p_ratio_hi)
    else:
        cw = w64.as_w64(host_np(cross, dtype=np.uint64))
        out = None
        for c0 in range(0, k, _ACC_CHUNK - 1):
            acc_hi = w64.zeros(lead + (m, n))
            acc_lo = w64.zeros(lead + (m, n))
            for i in range(c0, min(c0 + _ACC_CHUNK - 1, k)):
                xi = x_a[..., i:i + 1, :]
                hi, lo = w64.mul_u64_full(xi, cw[:, i:i + 1])
                acc_hi, acc_lo = w64.add_u128(acc_hi, acc_lo, hi, lo)
            if c0 == 0:
                hi, lo = w64.mul_u64_full(
                    x_b, w64.as_w64(host_np(diag, dtype=np.uint64)))
                acc_hi, acc_lo = w64.add_u128(acc_hi, acc_lo, hi, lo)
            part = w64.barrett_reduce_u128(acc_hi, acc_lo, p, p_ratio_lo, p_ratio_hi)
            out = part if out is None else w64.add_mod(out, part, p)
    alpha = frac_alpha(x_a, frac_hi, frac_lo)
    alpha_mod = w64.barrett_reduce_u64(alpha, p, p_ratio_hi)
    return w64.add_mod(out, w64.broadcast_to(alpha_mod, out.shape), p)
