"""Hoisted rotations and extended-basis (QlP) operations.

Behavioural mirror of the reference's hoisting machinery
(src/evaluate.cu:3631-4030 and survey section 8.3), the single most
important performance structure in bootstrapping: ONE modup of c1 is shared
by every rotation in a BSGS level; all baby-step accumulation happens at the
extended basis QlP (values carry an implicit factor P), and a single
KeySwitchDown (moddown, divide by P) lands the result.

Extended ("ext") ciphertexts are ordinary Ciphertext pytrees whose limb axis
has size size_Ql + size_P and whose data equals P * (logical value) in RNS.
"""

from __future__ import annotations

from dataclasses import replace

import jax.numpy as jnp

from ..ops import w64
from ..ops import w64 as mm
from ..ops.w64 import W64
from ..ops.galois import apply_galois_ntt
from ..scheme.ciphertext import Ciphertext, Plaintext
from ..scheme.context import ContextLevel, FheContext
from ..scheme.keys import RelinKey
from .evaluator import (
    _qlp_mod,
    key_inner_product,
    moddown_from_ntt,
    modup,
)


def fast_rotation_precompute(ctx: FheContext, ct: Ciphertext) -> W64:
    """ONE modup of c1, shared across all rotations of this ct
    (EvalFastRotationPrecompute, src/evaluate.cu:3631-3658)."""
    level = ctx.level(ct.chain_index)
    return modup(ctx, level, ct.data[1])


def fast_rotation_ext(
    ctx: FheContext,
    ct: Ciphertext,
    precomp: W64,
    elt: int,
    key: RelinKey,
    add_first: bool,
) -> Ciphertext:
    """Rotation at the extended basis (EvalFastRotationExt,
    src/evaluate.cu:3660-3755): inner product of the hoisted digits with the
    fused rotation key, optional add of P*c0, then the automorphism."""
    level = ctx.level(ct.chain_index)
    ks = level.ks
    cx = key_inner_product(ctx, level, precomp, key)  # (2, QlP, N), holds P*(...)
    q, rlo, rhi = _qlp_mod(level)
    if add_first:
        size_Ql = level.size
        p_scaled = mm.mul_mod_shoup(
            ct.data[0],
            ks.big_p_mod_q,
            ks.big_p_mod_q_shoup,
            level.mod.q,
        )
        c0_q = mm.add_mod(cx[0, :size_Ql], p_scaled, level.mod.q)
        cx = cx.at[0, :size_Ql].set(c0_q)
    rotated = apply_galois_ntt(cx, elt, ctx.n)
    return replace(ct, data=rotated)


def keyswitch_ext(ctx: FheContext, ct: Ciphertext) -> Ciphertext:
    """Lift a ct from Ql to QlP by multiplying every limb by P mod q_j; the
    P-part limbs are zero (KeySwitchExt, src/evaluate.cu:3876-3940)."""
    level = ctx.level(ct.chain_index)
    ks = level.ks
    scaled = mm.mul_mod_shoup(
        ct.data, ks.big_p_mod_q, ks.big_p_mod_q_shoup, level.mod.q
    )
    size_P = ks.alpha
    zeros = w64.zeros((ct.size, size_P, ct.n))
    data = w64.concat([scaled, zeros], axis=1)
    return ct.with_data(data)


def keyswitch_down(ctx: FheContext, ct_ext: Ciphertext) -> Ciphertext:
    """Moddown all components: QlP -> Ql, divides by P (KeySwitchDown)."""
    level = ctx.level(ct_ext.chain_index)
    data = moddown_from_ntt(ctx, level, ct_ext.data)
    return ct_ext.with_data(data)


def keyswitch_down_first(ctx: FheContext, ct_ext: Ciphertext) -> Ciphertext:
    """Moddown only c0 (KeySwitchDownFirstElement); returns a size-1 ct."""
    level = ctx.level(ct_ext.chain_index)
    data = moddown_from_ntt(ctx, level, ct_ext.data[0:1])
    return ct_ext.with_data(data)


def eval_mult_ext(ctx: FheContext, ct_ext: Ciphertext, pt_ext: Plaintext) -> Ciphertext:
    """Multiply an ext ct by a plaintext encoded at QlP (EvalMultExt)."""
    level = ctx.level(ct_ext.chain_index)
    q, rlo, rhi = _qlp_mod(level)
    pt_data = pt_ext.data
    if not isinstance(pt_data, W64):
        # compact q32 plaintext (u32 lo plane only): re-wrap in-program —
        # the zero hi never lives in HBM
        pt_data = W64(pt_data, None)
    if ctx.is_q32:
        from .evaluator import q32_mul_consts_for

        data = mm.mul_mod_q32(ct_ext.data, pt_data[None],
                              q32_mul_consts_for(level, ext=True))
    else:
        data = mm.mul_mod(ct_ext.data, pt_data[None], q, rlo, rhi)
    return replace(
        ct_ext,
        data=data,
        scale=ct_ext.scale * pt_ext.scale,
        noise_scale_deg=ct_ext.noise_scale_deg + pt_ext.noise_scale_deg,
    )


def eval_add_ext(ctx: FheContext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    level = ctx.level(a.chain_index)
    q, _, _ = _qlp_mod(level)
    return a.with_data(mm.add_mod(a.data, b.data, q))


def reset_poly_ext(ctx: FheContext, ct_ext: Ciphertext, index: int = 0) -> Ciphertext:
    """Zero one component (reference reset_poly_ext, used by BSGS outer)."""
    data = ct_ext.data.at[index].set(w64.zeros_like(ct_ext.data[index]))
    return ct_ext.with_data(data)


def rotate_c0(ctx: FheContext, ct: Ciphertext, elt: int) -> Ciphertext:
    """Apply the automorphism to c0 only (reference rotate_c0,
    src/evaluate.cu:3981)."""
    c0 = apply_galois_ntt(ct.data[0], elt, ctx.n)
    return ct.with_data(w64.concat([c0[None], ct.data[1:]], axis=0))


def hoisted_rotation_sum(ctx: FheContext, ct: Ciphertext, steps, gk) -> Ciphertext:
    """sum over `steps` of rotate(ct, step) with ONE modup shared across
    every rotation and ONE moddown at the end (reference hoisting_inplace,
    src/evaluate.cu:1922-2130; our fused-key form accumulates at the
    extended basis instead of rotating each digit).  Step 0 contributes
    the unrotated ct."""
    from ..ops.galois import galois_elt_from_step

    if ct.size != 2:
        raise ValueError("hoisted rotation-sum expects a size-2 ciphertext")
    pre = fast_rotation_precompute(ctx, ct)
    acc = None
    for step in steps:
        elt = galois_elt_from_step(step, ctx.n)
        if elt == 1:
            term = keyswitch_ext(ctx, ct)
        else:
            term = fast_rotation_ext(
                ctx, ct, pre, elt, gk.key_for_elt(elt), add_first=True
            )
        acc = term if acc is None else eval_add_ext(ctx, acc, term)
    return keyswitch_down(ctx, acc)
