"""BFV evaluator: BEHZ multiplication, relinearization, rotations, plain ops.

TPU-native counterpart of the reference's BFV evaluate paths
(/root/reference/src/evaluate.cu:530-743 bfv_multiply_behz and the BEHZ
kernels in src/rns.cu: fastbconv_m_tilde, sm_mrq, fast_floor, fastbconv_sk).
BFV ciphertexts are coefficient-form; multiplication lifts both operands to
the auxiliary base Bsk = B + {m_sk} exactly (Montgomery m_tilde reduction),
tensors in NTT domain over q and Bsk independently, multiplies by t, floors
by Q (BEHZ approximate floor), and converts back to q with the
Shenoy-Kumaresan exact conversion.

All inner loops are u32-pair (W64) modular arithmetic; per-level programs
jit separately (static shapes).
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import w64
from ..ops.bconv import bconv_matmul
from ..ops.galois import apply_galois_coeff, conj_elt, galois_elt_from_step
from ..ops.ntt import forward_ntt, inverse_ntt
from ..ops.w64 import W64
from ..scheme.bfv import BehzTables, BfvTools, _mod_arrays, _scalar_w64
from ..scheme.ciphertext import Ciphertext, Plaintext
from ..scheme.context import ContextLevel
from ..scheme.keys import GaloisKey, RelinKey
from . import evaluator as ev

# re-exported: add/sub/negate are scheme-agnostic elementwise mod-q ops
add = ev.add
sub = ev.sub
negate = ev.negate


# --------------------------------------------------------------------------
# BEHZ multiplication pipeline
# --------------------------------------------------------------------------

def _behz_lift(level: ContextLevel, bz: BehzTables, x: W64) -> W64:
    """x (size, k, N) in base q -> (size, kb, N) in Bsk, exact.

    fastbconv_m_tilde + sm_mrq (reference src/rns.cu): scale by
    m_tilde*qhat^{-1}, fast-convert to Bsk and to m_tilde=2^32 (u32
    wrap-around arithmetic), then remove the alpha*Q overshoot with the
    centered Montgomery correction."""
    q = level.mod.q
    scaled = w64.mul_mod_shoup(
        x, bz.mtilde_qhatinv_mod_q, bz.mtilde_qhatinv_mod_q_shoup, q
    )
    to_bsk = bconv_matmul(scaled, bz.qhat_mod_bsk, bz.bsk_q, bz.bsk_rlo, bz.bsk_rhi)
    # conversion to m_tilde = 2^32: only the low u32 plane matters
    qhat32 = jnp.asarray(bz.qhat_mod_mtilde)[:, None]          # (k, 1) u32
    r = jnp.sum(scaled.lo * qhat32, axis=-2, dtype=jnp.uint32)  # (size, N)
    r = r * jnp.uint32(bz.neg_inv_q_mod_mtilde)                # wrap mod 2^32
    # centered: r' = r - 2^32 when r >= 2^31; represent mod b as r + (b - 2^32)
    r64 = W64(r[..., None, :], jnp.zeros_like(r)[..., None, :])  # (size,1,N)
    from ..utils.device import host_np

    b_minus = w64.as_w64(host_np(bz.bsk_q, dtype=np.uint64) - np.uint64(1 << 32))
    shape = x.shape[:-2] + (bz.bsk_q.shape[0], x.shape[-1])
    r_center = w64.where(
        (r >= jnp.uint32(1 << 31))[..., None, :],
        w64.add(w64.broadcast_to(r64, shape), b_minus),
        w64.broadcast_to(r64, shape),
    )
    term = w64.mul_mod(r_center, bz.q_mod_bsk, bz.bsk_q, bz.bsk_rlo, bz.bsk_rhi)
    dest = w64.add_mod(to_bsk, term, bz.bsk_q)
    return w64.mul_mod_shoup(
        dest, bz.inv_mtilde_mod_bsk, bz.inv_mtilde_mod_bsk_shoup, bz.bsk_q
    )


def _fast_floor(level: ContextLevel, bz: BehzTables, xq: W64, xbsk: W64) -> W64:
    """floor(x / Q) in Bsk, given x's residues in q and Bsk
    (reference fast_floor, src/rns.cu; error <= k absorbed into noise)."""
    scaled = w64.mul_mod_shoup(xq, bz.qhatinv_mod_q, bz.qhatinv_mod_q_shoup, level.mod.q)
    conv = bconv_matmul(scaled, bz.qhat_mod_bsk, bz.bsk_q, bz.bsk_rlo, bz.bsk_rhi)
    return w64.mul_mod_shoup(
        w64.sub_mod(xbsk, conv, bz.bsk_q),
        bz.inv_q_mod_bsk, bz.inv_q_mod_bsk_shoup, bz.bsk_q,
    )


def _fastbconv_sk(level: ContextLevel, bz: BehzTables, x: W64) -> W64:
    """Shenoy-Kumaresan exact conversion Bsk -> q
    (reference fastbconv_sk, src/rns.cu)."""
    k = level.size
    q, rlo, rhi = level.mod.q, level.mod.ratio_lo, level.mod.ratio_hi
    msk = bz.m_sk
    msk_q, msk_rlo, msk_rhi = _mod_arrays(msk)
    xb, xmsk = x[..., :k, :], x[..., k:, :]
    scaled = w64.mul_mod_shoup(
        xb, bz.bhatinv_mod_b, bz.bhatinv_mod_b_shoup, bz.bsk_q[:k]
    )
    conv_q = bconv_matmul(scaled, bz.bhat_mod_q, q, rlo, rhi)
    conv_msk = bconv_matmul(scaled, bz.bhat_mod_msk, msk_q, msk_rlo, msk_rhi)
    alpha = w64.mul_mod(
        w64.sub_mod(conv_msk, xmsk, msk_q),
        _scalar_w64(bz.inv_b_mod_msk), msk_q, msk_rlo, msk_rhi,
    )  # (size, 1, N), the B-overshoot alpha_B (centered below)
    hi_branch = w64.add_mod(
        conv_q,
        w64.mul_mod(
            w64.sub(w64.broadcast_to(_scalar_w64(msk.value), alpha.shape), alpha),
            bz.b_mod_q, q, rlo, rhi,
        ),
        q,
    )
    lo_branch = w64.sub_mod(
        conv_q, w64.mul_mod(alpha, bz.b_mod_q, q, rlo, rhi), q
    )
    mask = w64.gt(alpha, _scalar_w64(msk.value >> 1))
    return w64.where(jnp.broadcast_to(mask, hi_branch.shape), hi_branch, lo_branch)


def _tensor(a: W64, b: W64, q, rlo, rhi) -> W64:
    """(2, L, N) x (2, L, N) -> (3, L, N) NTT-domain tensor product."""
    c0 = w64.mul_mod(a[0], b[0], q, rlo, rhi)
    c2 = w64.mul_mod(a[1], b[1], q, rlo, rhi)
    cross = w64.add_mod(
        w64.mul_mod(a[0], b[1], q, rlo, rhi),
        w64.mul_mod(a[1], b[0], q, rlo, rhi),
        q,
    )
    return w64.stack([c0, cross, c2])


def multiply(tools: BfvTools, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    """BFV multiply dispatch on the context's mul_tech
    (reference bfv_multiply, src/evaluate.cu:925-943)."""
    from ..core.params import MulTech

    if a.chain_index != b.chain_index:
        raise ValueError("operands at different levels")
    if a.size != 2 or b.size != 2:
        raise ValueError("BFV multiply expects size-2 ciphertexts")
    if tools.context.params.mul_tech == MulTech.behz:
        return _multiply_behz(tools, a, b)
    return _multiply_hps(tools, a, b)


def _multiply_behz(tools: BfvTools, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    """BEHZ multiply: (2,k,N) x (2,k,N) -> size-3 ct, coefficient form
    (reference bfv_multiply_behz, src/evaluate.cu:530-637)."""
    level = tools.context.level(a.chain_index)
    bz = tools.behz(a.chain_index)
    fn = tools._jit(("behz_mul", a.chain_index), _multiply_impl_factory(tools, bz), level)
    return a.with_data(fn(a.data, b.data))


def square(tools: BfvTools, a: Ciphertext) -> Ciphertext:
    return multiply(tools, a, a)


def _multiply_impl_factory(tools: BfvTools, bz: BehzTables):
    def impl(level: ContextLevel, ad: W64, bd: W64) -> W64:
        tab = tools.level_tables(level.chain_index)
        q, rlo, rhi = level.mod.q, level.mod.ratio_lo, level.mod.ratio_hi
        # lift to Bsk (coefficient domain)
        a_bsk = _behz_lift(level, bz, ad)
        b_bsk = _behz_lift(level, bz, bd)
        # tensor in NTT domain over q and Bsk independently
        prod_q = inverse_ntt(
            _tensor(
                forward_ntt(ad, level.ntt), forward_ntt(bd, level.ntt),
                q, rlo, rhi,
            ),
            level.ntt,
        )
        prod_bsk = inverse_ntt(
            _tensor(
                forward_ntt(a_bsk, bz.bsk_ntt), forward_ntt(b_bsk, bz.bsk_ntt),
                bz.bsk_q, bz.bsk_rlo, bz.bsk_rhi,
            ),
            bz.bsk_ntt,
        )
        # multiply by t, floor-divide by Q, convert back to q
        tq = w64.mul_mod_shoup(prod_q, tab.t_mod_q, tab.t_mod_q_shoup, q)
        tbsk = w64.mul_mod_shoup(
            prod_bsk, bz.t_mod_bsk, bz.t_mod_bsk_shoup, bz.bsk_q
        )
        floored = _fast_floor(level, bz, tq, tbsk)
        return _fastbconv_sk(level, bz, floored)

    return impl


# --------------------------------------------------------------------------
# HPS multiplication pipeline (hps / hps_overq / hps_overq_leveled;
# reference bfv_multiply_hps, src/evaluate.cu:745-923)
# --------------------------------------------------------------------------

def _multiply_hps(tools: BfvTools, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    from ..core.params import MulTech

    mul_tech = tools.context.params.mul_tech
    levels_dropped = 0
    if mul_tech == MulTech.hps_overq_leveled:
        depth = max(a.noise_scale_deg, b.noise_scale_deg) - 1
        levels_dropped = tools.find_levels_to_drop(
            depth, False, a.is_asymmetric or b.is_asymmetric
        )
    hp = tools.hps(a.chain_index, levels_dropped)
    level = tools.context.level(a.chain_index)
    fn = tools._jit(
        ("hps_mul", a.chain_index, levels_dropped),
        _hps_mul_impl_factory(tools, hp, mul_tech), level,
    )
    out = a.with_data(fn(a.data, b.data))
    if mul_tech == MulTech.hps_overq_leveled:
        out = replace(
            out, noise_scale_deg=max(a.noise_scale_deg, b.noise_scale_deg) + 1
        )
    return out


def _hps_mul_impl_factory(tools: BfvTools, hp, mul_tech):
    from ..core.params import MulTech
    from ..ops.bconv import bconv_matmul

    k = len(hp.base_ql)
    m = len(hp.base_rl)
    rl_q = hp.qlrl_q[k:]
    rl_rlo = hp.qlrl_rlo[k:]
    rl_rhi = hp.qlrl_rhi[k:]

    def lift_ct1(d: W64) -> W64:
        """ct1: Ql residues (scale&rounded from Q when leveled) ++ exact
        conversion to Rl."""
        if hp.levels_dropped:
            ql = hp.qq_sr.apply(d[:, k:, :], d[:, :k, :])
        else:
            ql = d
        return w64.concat([ql, hp.ql_to_rl.apply(ql)], axis=1)

    def lift_ct2(d: W64) -> W64:
        if mul_tech == MulTech.hps:
            return w64.concat([d, hp.ql_to_rl.apply(d)], axis=1)
        # overQ: approximate scaled lift to Rl (bConv_BEHZ_var1: scale by
        # [-Rl*qhat^-1]_q, matmul with q^-1 mod r_j), then exact back to Ql
        scaled = w64.mul_mod_shoup(d, hp.var1_scale, hp.var1_scale_shoup, hp.var1_q)
        rl = bconv_matmul(scaled, hp.var1_matrix, rl_q, rl_rlo, rl_rhi)
        ql = hp.rl_to_ql.apply(rl)
        return w64.concat([ql, rl], axis=1)

    def impl(level, ad: W64, bd: W64) -> W64:
        a_ntt = forward_ntt(lift_ct1(ad), hp.qlrl_ntt)
        b_ntt = forward_ntt(lift_ct2(bd), hp.qlrl_ntt)
        prod = inverse_ntt(
            _tensor(a_ntt, b_ntt, hp.qlrl_q, hp.qlrl_rlo, hp.qlrl_rhi),
            hp.qlrl_ntt,
        )
        if mul_tech == MulTech.hps:
            # round(t/Q * x): QR -> R, then exact Rl -> Ql
            r_part = hp.sr.apply(prod[:, :k, :], prod[:, k:, :])
            return hp.rl_to_ql.apply(r_part)
        # overQ: round(t/Rl * x): QlRl -> Ql
        out = hp.sr.apply(prod[:, k:, :], prod[:, :k, :])
        if hp.levels_dropped:
            # re-expand Ql -> Q: multiply by [QlDrop]_q, zero dropped limbs
            out = w64.mul_mod_shoup(
                out, hp.expand_mod_ql, hp.expand_mod_ql_shoup, hp.qlrl_q[:k]
            )
            pad = w64.zeros(out.shape[:1] + (hp.levels_dropped, out.shape[-1]))
            out = w64.concat([out, pad], axis=1)
        return out

    return impl


# --------------------------------------------------------------------------
# relinearization / rotations (coefficient-form hybrid keyswitch)
# --------------------------------------------------------------------------

def relinearize(tools: BfvTools, a: Ciphertext, rlk: RelinKey) -> Ciphertext:
    if a.size != 3:
        raise ValueError("relinearize expects a size-3 ciphertext")
    level = tools.context.level(a.chain_index)

    def impl(lvl, data):
        delta = ev.keyswitch_core(
            tools.context, lvl, data[2], rlk, input_ntt=False, output_ntt=False
        )
        return w64.add_mod(data[:2], delta, lvl.mod.q)

    fn = tools._jit(("relin", a.chain_index, id(rlk)), impl, level)
    return a.with_data(fn(a.data))


def rotate_rows(tools: BfvTools, a: Ciphertext, step: int, gk: GaloisKey) -> Ciphertext:
    """Rotate within each of the two slot rows by `step` (sigma_{5^step})."""
    return _apply_galois(tools, a, galois_elt_from_step(step, tools.context.n), gk)


def rotate_columns(tools: BfvTools, a: Ciphertext, gk: GaloisKey) -> Ciphertext:
    """Swap the two slot rows (sigma_{2N-1})."""
    return _apply_galois(tools, a, conj_elt(tools.context.n), gk)


def _apply_galois(tools: BfvTools, a: Ciphertext, elt: int, gk: GaloisKey) -> Ciphertext:
    if elt == 1:
        return a
    if a.size != 2:
        raise ValueError("rotate expects a size-2 ciphertext")
    ctx = tools.context
    level = ctx.level(a.chain_index)
    key = gk.key_for_elt(elt)

    def impl(lvl, data):
        d = ev.keyswitch_core(
            ctx, lvl, data[1], key, input_ntt=False, output_ntt=False
        )
        c0 = w64.add_mod(data[0], d[0], lvl.mod.q)
        new0 = apply_galois_coeff(c0, elt, ctx.n, lvl.mod.q)
        new1 = apply_galois_coeff(d[1], elt, ctx.n, lvl.mod.q)
        return w64.stack([new0, new1])

    fn = tools._jit(("rot", a.chain_index, elt, id(key)), impl, level)
    return a.with_data(fn(a.data))


# --------------------------------------------------------------------------
# plain ops / modulus switching
# --------------------------------------------------------------------------

def add_plain(tools: BfvTools, a: Ciphertext, pt: Plaintext) -> Ciphertext:
    """c0 += Delta*m + fix (multiply_add_plain_with_scaling_variant)."""
    return _axpy_plain(tools, a, pt, sign=+1)


def sub_plain(tools: BfvTools, a: Ciphertext, pt: Plaintext) -> Ciphertext:
    return _axpy_plain(tools, a, pt, sign=-1)


def _axpy_plain(tools: BfvTools, a: Ciphertext, pt: Plaintext, sign: int) -> Ciphertext:
    level = tools.context.level(a.chain_index)

    def impl(lvl, data, m):
        dm = tools.scale_plain_to_q(lvl, m)
        if sign > 0:
            c0 = w64.add_mod(data[0], dm, lvl.mod.q)
        else:
            c0 = w64.sub_mod(data[0], dm, lvl.mod.q)
        return w64.concat([c0[None], data[1:]], axis=0)

    fn = tools._jit(("axpy_plain", a.chain_index, sign, a.size), impl, level)
    return a.with_data(fn(a.data, pt.data))


def multiply_plain(tools: BfvTools, a: Ciphertext, pt: Plaintext) -> Ciphertext:
    """Dyadic product with the centered lift of m (multiply_plain_normal)."""
    level = tools.context.level(a.chain_index)

    def impl(lvl, data, m):
        q, rlo, rhi = lvl.mod.q, lvl.mod.ratio_lo, lvl.mod.ratio_hi
        lifted = tools.lift_plain_to_q(lvl, m)
        pt_ntt = forward_ntt(lifted, lvl.ntt)
        ct_ntt = forward_ntt(data, lvl.ntt)
        return inverse_ntt(w64.mul_mod(ct_ntt, pt_ntt[None], q, rlo, rhi), lvl.ntt)

    fn = tools._jit(("mul_plain", a.chain_index, a.size), impl, level)
    return a.with_data(fn(a.data, pt.data))


def mod_switch_to_next(tools: BfvTools, a: Ciphertext) -> Ciphertext:
    """Divide-and-round by q_last in the coefficient domain
    (reference mod_switch_scale_to_next, src/evaluate.cu:1591)."""
    ctx = tools.context
    if a.chain_index + 1 >= len(ctx.chain):
        raise ValueError("already at the last level")
    level = ctx.level(a.chain_index)
    if level.size < 2:
        raise ValueError("no modulus left to drop")
    next_level = ctx.level(a.chain_index + 1)

    def impl(lvl, data):
        q = lvl.mod.q
        q_last = q[-1:]
        half = q_last >> 1
        last = data[:, -1:, :]
        last_half = w64.add_mod(last, half, q_last)
        rest = next_level.mod
        reduced = w64.barrett_reduce_u64(last_half, rest.q, rest.ratio_hi)
        reduced = w64.broadcast_to(
            reduced, data.shape[:-2] + (lvl.size - 1, data.shape[-1])
        )
        half_mod = w64.barrett_reduce_u64(half, rest.q, rest.ratio_hi)
        tmp = w64.sub_mod(reduced, half_mod, rest.q)
        diff = w64.sub_mod(data[:, :-1, :], tmp, rest.q)
        return w64.mul_mod_shoup(
            diff, lvl.inv_q_last_mod_q, lvl.inv_q_last_mod_q_shoup, rest.q
        )

    fn = tools._jit(("modswitch", a.chain_index, a.size), impl, level)
    return replace(a, data=fn(a.data), chain_index=a.chain_index + 1)
