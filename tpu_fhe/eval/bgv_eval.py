"""BGV evaluator: NTT-domain multiply, correction factors, t-preserving
modulus switching.

TPU-native counterpart of the reference's BGV evaluate paths: multiply is
the same NTT tensor product as CKKS (bgv_ckks_multiply,
/root/reference/src/evaluate.cu:415-479) with correction factors
multiplying; addition balances correction factors first
(balance_correction_factors, src/evaluate.cu:22-84); modulus switching
divides by q_last with a delta that is 0 mod t (mod_t_and_divide_q_last_ntt,
src/rns.cu), multiplying the correction factor by q_last^{-1} mod t.
Relinearization/rotations reuse the hybrid keyswitch, whose moddown applies
the BGV t-correction automatically (eval/evaluator.py moddown_from_ntt).
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np

from ..core import numth
from ..ops import w64
from ..ops.ntt import forward_ntt, inverse_ntt
from ..ops.w64 import W64
from ..scheme.bgv import BgvTools
from ..scheme.bfv import _scalar_w64
from ..scheme.ciphertext import Ciphertext, Plaintext
from ..scheme.context import ContextLevel
from ..scheme.keys import GaloisKey, RelinKey
from . import evaluator as ev

relinearize = ev.relinearize      # BGV moddown correction applied inside
rotate = ev.rotate
conjugate = ev.conjugate


def multiply(tools: BgvTools, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    out = ev.multiply(tools.context, a, b)
    t = tools.t.value
    return replace(
        out,
        correction_factor=(a.correction_factor * b.correction_factor) % t,
        scale=1.0,
        noise_scale_deg=1,
    )


def _scale_by_int(tools: BgvTools, a: Ciphertext, f: int) -> Ciphertext:
    """Multiply ciphertext data by the centered representative of f mod t."""
    t = tools.t.value
    f %= t
    if f == 1:
        return a
    level = tools.context.level(a.chain_index)

    def impl(lvl, data):
        q, rlo, rhi = lvl.mod.q, lvl.mod.ratio_lo, lvl.mod.ratio_hi
        if f > t // 2:
            scaled = w64.mul_mod(data, _scalar_w64(t - f), q, rlo, rhi)
            return w64.neg_mod(scaled, q)
        return w64.mul_mod(data, _scalar_w64(f), q, rlo, rhi)

    fn = tools._jit(("scale_int", a.chain_index, a.size, f), impl, level)
    return a.with_data(fn(a.data))


def balance_and(op):
    """Wrap an additive evaluator op with correction-factor balancing
    (reference balance_correction_factors, src/evaluate.cu:22-84)."""

    def wrapped(tools: BgvTools, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        t = tools.t.value
        if a.correction_factor != b.correction_factor:
            # bring a to b's factor: a *= cf_b * cf_a^{-1}
            f = (
                b.correction_factor
                * numth.invert_mod(a.correction_factor % t, t)
            ) % t
            a = replace(
                _scale_by_int(tools, a, f),
                correction_factor=b.correction_factor,
            )
        return op(tools.context, a, b)

    return wrapped


add = balance_and(ev.add)
sub = balance_and(ev.sub)


def add_plain(tools: BgvTools, a: Ciphertext, m: Plaintext) -> Ciphertext:
    return _axpy_plain(tools, a, m, sign=+1)


def sub_plain(tools: BgvTools, a: Ciphertext, m: Plaintext) -> Ciphertext:
    return _axpy_plain(tools, a, m, sign=-1)


def _axpy_plain(tools: BgvTools, a: Ciphertext, m: Plaintext, sign: int) -> Ciphertext:
    """c0 +-= cf * lift(m) in NTT domain (plain ops must match the
    ciphertext's correction factor)."""
    level = tools.context.level(a.chain_index)
    cf = a.correction_factor % tools.t.value

    def impl(lvl, data, mdata):
        q, rlo, rhi = lvl.mod.q, lvl.mod.ratio_lo, lvl.mod.ratio_hi
        lifted = tools.lift_plain_to_q(lvl, mdata)
        if cf != 1:
            lifted = w64.mul_mod(lifted, _scalar_w64(cf), q, rlo, rhi)
        pt_ntt = forward_ntt(lifted, lvl.ntt)
        if sign > 0:
            c0 = w64.add_mod(data[0], pt_ntt, q)
        else:
            c0 = w64.sub_mod(data[0], pt_ntt, q)
        return w64.concat([c0[None], data[1:]], axis=0)

    fn = tools._jit(("axpy_plain", a.chain_index, sign, a.size, cf), impl, level)
    return a.with_data(fn(a.data, m.data))


def multiply_plain(tools: BgvTools, a: Ciphertext, m: Plaintext) -> Ciphertext:
    level = tools.context.level(a.chain_index)

    def impl(lvl, data, mdata):
        q, rlo, rhi = lvl.mod.q, lvl.mod.ratio_lo, lvl.mod.ratio_hi
        pt_ntt = forward_ntt(tools.lift_plain_to_q(lvl, mdata), lvl.ntt)
        return w64.mul_mod(data, pt_ntt[None], q, rlo, rhi)

    fn = tools._jit(("mul_plain", a.chain_index, a.size), impl, level)
    return a.with_data(fn(a.data, m.data))


def mod_switch_to_next(tools: BgvTools, a: Ciphertext) -> Ciphertext:
    """Divide by q_last with delta = t*u = c_last (mod q_last), 0 (mod t)
    (reference mod_t_and_divide_q_last_ntt); correction factor gains
    q_last^{-1} mod t."""
    ctx = tools.context
    if a.chain_index + 1 >= len(ctx.chain):
        raise ValueError("already at the last level")
    level = ctx.level(a.chain_index)
    if level.size < 2:
        raise ValueError("no modulus left to drop")
    next_level = ctx.level(a.chain_index + 1)
    tab = tools.level_tables(a.chain_index)
    t = tools.t.value

    def impl(lvl, data):
        q = lvl.mod.q
        q_last = q[-1:]
        rest = next_level.mod
        last = inverse_ntt(
            data[:, -1:, :], lvl.ntt.slice_limbs([lvl.size - 1])
        )
        # u = [c_last * t^{-1}]_{q_last}; delta = t*u centered by
        # subtracting t*q_last when 2u >= q_last
        u = w64.mul_mod(
            last, _scalar_w64(tab.inv_t_mod_q_last), q_last,
            lvl.mod.ratio_lo[-1:], lvl.mod.ratio_hi[-1:],
        )
        delta = w64.mul_mod(u, tab.t_mod_rest, rest.q, rest.ratio_lo, rest.ratio_hi)
        centered = w64.sub_mod(delta, w64.as_w64(tab.t_q_last_mod_rest), rest.q)
        half_mask = w64.geq(w64.add(u, u), w64.as_w64(q_last))
        shape = data.shape[:-2] + (lvl.size - 1, data.shape[-1])
        delta = w64.where(
            jnp_broadcast(half_mask, shape),
            w64.broadcast_to(centered, shape),
            w64.broadcast_to(delta, shape),
        )
        delta_ntt = forward_ntt(delta, next_level.ntt)
        diff = w64.sub_mod(data[:, :-1, :], delta_ntt, rest.q)
        return w64.mul_mod_shoup(
            diff, lvl.inv_q_last_mod_q, lvl.inv_q_last_mod_q_shoup, rest.q
        )

    fn = tools._jit(("modswitch", a.chain_index, a.size), impl, level)
    q_last_val = level.base.values[-1]
    new_cf = (
        a.correction_factor * numth.invert_mod(q_last_val % t, t)
    ) % t
    return replace(
        a,
        data=fn(a.data),
        chain_index=a.chain_index + 1,
        correction_factor=new_cf,
    )


def jnp_broadcast(mask, shape):
    import jax.numpy as jnp

    return jnp.broadcast_to(mask, shape)
