"""FLEXIBLEAUTO CKKS semantics (OpenFHE-style automatic rescaling).

Behavioural mirror of the reference's bootstrap-support evaluator ops
(src/evaluate.cu:2284-2980): the scaling-factor ladder, level/depth
adjustment (AdjustLevelsAndDepthInPlace — replicated branch-for-branch, this
is where CKKS precision lives, SURVEY.md section 8.4), EvalMultAuto /
EvalAddAuto / EvalSubAuto, scalar ops via CRT lift, ModReduce, RaiseMod
(mod-raise to the full chain for bootstrapping), and MultByMonomial.

noiseScaleDeg in {1, 2} is the degree of the scaling factor carried by a
ciphertext; level l corresponds to chain index l + 1.
"""

from __future__ import annotations

from dataclasses import replace
from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from ..ops import w64
from ..ops import w64 as mm
from ..ops.w64 import W64
from ..ops.ntt import forward_ntt, inverse_ntt
from ..scheme.ciphertext import Ciphertext, Plaintext
from ..scheme.context import FheContext
from ..scheme.keys import RelinKey
from . import evaluator as ev


# --------------------------------------------------------------------------
# scaling factor ladder (reference: include/ciphertext.h:320-367)
# --------------------------------------------------------------------------

def composite_degree(ctx: FheContext) -> int:
    """Limbs per logical CKKS level (1 = classic; >1 = composite scaling,
    the TPU-native q32 regime where a logical level is a group of ~28-bit
    primes — see core/params.py)."""
    return getattr(ctx.params, "composite_degree", 1)


def level_group_product(ctx: FheContext, size_Ql: int) -> float:
    """Product of the primes one mod_reduce at limb-count size_Ql divides
    by: the last `composite_degree` primes of the level (= q_last for the
    classic regime)."""
    d = composite_degree(ctx)
    q = ctx.q_values
    prod = 1.0
    for v in q[size_Ql - d:size_Ql]:
        prod *= float(v)
    return prod


def scaling_factors(ctx: FheContext) -> tuple[list[float], list[float]]:
    """sf[0] = Qg_{G-1}; sf[k] = sf[k-1]^2 / Qg_{G-k}; big[k] = sf[k]^2,
    where Qg_j is the product of logical-level group j's primes (a single
    prime in the classic regime; `composite_degree` primes in composite
    scaling).  Mirrors the reference ladder (include/ciphertext.h:337-355)
    with q_{K-k} generalized to the group product."""
    key = "_flexauto_sf"
    cached = getattr(ctx, key, None)
    if cached is not None:
        return cached
    q = ctx.q_values
    d = composite_degree(ctx)
    G = len(q) // d
    qg = []
    for j in range(G):
        prod = 1.0
        for v in q[d * j:d * j + d]:
            prod *= float(v)
        qg.append(prod)
    sf = [qg[G - 1]]
    for k in range(1, G):
        sf.append(sf[k - 1] * sf[k - 1] / qg[G - k])
        ratio = sf[k] / sf[0]
        if not (0.5 < ratio < 2.0):
            raise ValueError(
                "FLEXIBLEAUTO scaling-factor drift out of range; choose "
                "data primes closer to 2^p"
            )
    big = [s * s for s in sf]
    out = (sf, big)
    setattr(ctx, key, out)
    return out


def default_scale(ctx: FheContext) -> float:
    return scaling_factors(ctx)[0][0]


def _level(ct: Ciphertext, ctx: FheContext | None = None) -> int:
    if ctx is None:
        return ct.chain_index - 1
    return (ct.chain_index - 1) // composite_degree(ctx)


# --------------------------------------------------------------------------
# ModReduce / level switching (logical levels: `composite_degree` limbs each)
# --------------------------------------------------------------------------

def mod_reduce(ctx: FheContext, ct: Ciphertext, levels: int = 1) -> Ciphertext:
    d = composite_degree(ctx)
    out = ct
    for _ in range(levels):
        # composite: ONE fused divide-and-round by the group product
        # (half the NTT work of d sequential single-prime rescales)
        out = (ev.rescale_composite(ctx, out, d) if d > 1
               else ev.rescale_to_next(ctx, out))
    return replace(out, noise_scale_deg=ct.noise_scale_deg - levels)


def mod_switch_level(ctx: FheContext, ct: Ciphertext, levels: int) -> Ciphertext:
    out = ct
    for _ in range(levels * composite_degree(ctx)):
        out = ev.mod_drop_to_next(ctx, out)
    return out


# --------------------------------------------------------------------------
# scalar CRT lifts (GetElementForEvalMult / AddOrSub)
# --------------------------------------------------------------------------

def _crt_lift_mult(ctx: FheContext, ct: Ciphertext, operand: float) -> list[int]:
    """round(operand * sf[level]) as residues mod each q_i.

    The float product keeps f64 precision exactly as the reference's
    __int128 path (src/evaluate.cu:2332-2411); Python's exact float->int
    conversion subsumes the approxFactor splitting."""
    sf, _ = scaling_factors(ctx)
    scf = sf[_level(ct, ctx)]
    large = int(round(operand * scf))
    level = ctx.level(ct.chain_index)
    return [large % q for q in level.base.values]


def _crt_lift_addsub(ctx: FheContext, ct: Ciphertext, operand: float) -> list[int]:
    """round(operand*sf) * round(sf)^(noiseDeg-1) mod q_i
    (src/evaluate.cu:2894-2950)."""
    sf, _ = scaling_factors(ctx)
    scf = sf[_level(ct, ctx)]
    const = int(round(operand * scf))
    int_scf = int(round(scf))
    for _ in range(1, ct.noise_scale_deg):
        const *= int_scf
    level = ctx.level(ct.chain_index)
    return [const % q for q in level.base.values]


def _scalar_vec(level, residues: list[int]) -> np.ndarray:
    return np.array(residues, dtype=np.uint64).reshape(-1, 1)


def mult_const_core(ctx: FheContext, ct: Ciphertext, operand: float) -> Ciphertext:
    """Multiply by a double: noiseScaleDeg += 1, scale *= sf[level]."""
    level = ctx.level(ct.chain_index)
    sf, _ = scaling_factors(ctx)
    factors = _scalar_vec(level, _crt_lift_mult(ctx, ct, operand))
    data = mm.mul_mod(
        ct.data, factors[None], level.mod.q, level.mod.ratio_lo, level.mod.ratio_hi
    )
    return replace(
        ct,
        data=data,
        noise_scale_deg=ct.noise_scale_deg + 1,
        scale=ct.scale * sf[_level(ct, ctx)],
    )


def mult_const(ctx: FheContext, ct: Ciphertext, operand: float) -> Ciphertext:
    """EvalMultConst: mod-reduce first when noiseScaleDeg == 2 so the degree
    never exceeds 2 (include/evaluate.cuh:317-343)."""
    if ct.noise_scale_deg == 2:
        ct = mod_reduce(ctx, ct, 1)
    return mult_const_core(ctx, ct, operand)


def add_const(ctx: FheContext, ct: Ciphertext, operand: float) -> Ciphertext:
    if operand == 0:
        return ct
    level = ctx.level(ct.chain_index)
    factors = _scalar_vec(level, _crt_lift_addsub(ctx, ct, operand))
    c0 = mm.add_mod(ct.data[0], factors, level.mod.q)
    return ct.with_data(w64.concat([c0[None], ct.data[1:]], axis=0))


def sub_const(ctx: FheContext, ct: Ciphertext, operand: float) -> Ciphertext:
    level = ctx.level(ct.chain_index)
    factors = _scalar_vec(level, _crt_lift_addsub(ctx, ct, operand))
    c0 = mm.sub_mod(ct.data[0], factors, level.mod.q)
    return ct.with_data(w64.concat([c0[None], ct.data[1:]], axis=0))


# --------------------------------------------------------------------------
# AdjustLevelsAndDepth (src/evaluate.cu:2611-2790, branch-exact)
# --------------------------------------------------------------------------

def adjust_levels_and_depth(
    ctx: FheContext, c1: Ciphertext, c2: Ciphertext
) -> tuple[Ciphertext, Ciphertext]:
    sf, sf_big = scaling_factors(ctx)
    q = ctx.q_values
    c1lvl, c2lvl = _level(c1, ctx), _level(c2, ctx)
    c1depth, c2depth = c1.noise_scale_deg, c2.noise_scale_deg

    if c1lvl < c2lvl:
        c1 = _adjust_lower(ctx, c1, c2, sf, sf_big, q)
    elif c1lvl > c2lvl:
        c2 = _adjust_lower(ctx, c2, c1, sf, sf_big, q)
    else:
        if c1depth < c2depth:
            c1 = mult_const_core(ctx, c1, 1.0)
        elif c2depth < c1depth:
            c2 = mult_const_core(ctx, c2, 1.0)
    return c1, c2


def _adjust_lower(
    ctx: FheContext, lo: Ciphertext, hi: Ciphertext, sf, sf_big, q
) -> Ciphertext:
    """Bring `lo` (at the lower level = larger modulus) to `hi`'s level."""
    lolvl, hilvl = _level(lo, ctx), _level(hi, ctx)
    lodepth, hidepth = lo.noise_scale_deg, hi.noise_scale_deg
    size_Ql_lo = ctx.level(lo.chain_index).size

    if lodepth == 2:
        if hidepth == 2:
            scf1, scf2 = lo.scale, hi.scale
            scf = sf[lolvl]
            q1 = level_group_product(ctx, size_Ql_lo)
            lo = mult_const_core(ctx, lo, scf2 / scf1 * q1 / scf)
            lo = mod_reduce(ctx, lo, 1)
            if lolvl + 1 < hilvl:
                lo = mod_switch_level(ctx, lo, hilvl - lolvl - 1)
            lo = replace(lo, scale=hi.scale)
        else:
            if lolvl + 1 == hilvl:
                lo = mod_reduce(ctx, lo, 1)
            else:
                scf1 = lo.scale
                scf2 = sf_big[hilvl - 1]
                scf = sf[lolvl]
                q1 = level_group_product(ctx, size_Ql_lo)
                lo = mult_const_core(ctx, lo, scf2 / scf1 * q1 / scf)
                lo = mod_reduce(ctx, lo, 1)
                if lolvl + 2 < hilvl:
                    lo = mod_switch_level(ctx, lo, hilvl - lolvl - 2)
                lo = mod_reduce(ctx, lo, 1)
                lo = replace(lo, scale=hi.scale)
    else:
        if hidepth == 2:
            scf1, scf2 = lo.scale, hi.scale
            scf = sf[lolvl]
            lo = mult_const_core(ctx, lo, scf2 / scf1 / scf)
            lo = mod_switch_level(ctx, lo, hilvl - lolvl)
            lo = replace(lo, scale=scf2)
        else:
            scf1 = lo.scale
            scf2 = sf_big[hilvl - 1]
            scf = sf[lolvl]
            lo = mult_const_core(ctx, lo, scf2 / scf1 / scf)
            if lolvl + 1 < hilvl:
                lo = mod_switch_level(ctx, lo, hilvl - lolvl - 1)
            lo = mod_reduce(ctx, lo, 1)
            lo = replace(lo, scale=hi.scale)
    return lo


# --------------------------------------------------------------------------
# auto ops
# --------------------------------------------------------------------------

def _snap_scales(a: Ciphertext, b: Ciphertext):
    """FLEXIBLEAUTO add/sub tolerance: after level/depth adjustment the
    two operands' ladder scales can still differ by the per-level
    sf-ratio drift (sf[k] all sit near 2^p within the (0.5, 2) window,
    but are not equal across levels).  The reference deliberately
    DISABLES the scale check in sub_inplace (src/evaluate.cu:315-320) and
    proceeds — Meta-BTS subtracts its error term across such a pair.  We
    bound the same behavior: within 5% relative, unify metadata to a's
    scale (introduces the same bounded relative error the reference
    accepts); beyond that it is a real usage bug and still raises."""
    if a.chain_index == b.chain_index and b.scale != a.scale:
        if abs(a.scale - b.scale) < 0.05 * abs(a.scale):
            b = replace(b, scale=a.scale)
    return a, b


def eval_add_auto(ctx: FheContext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    a, b = adjust_levels_and_depth(ctx, a, b)
    a, b = _snap_scales(a, b)
    return ev.add(ctx, a, b)


def eval_sub_auto(ctx: FheContext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    a, b = adjust_levels_and_depth(ctx, a, b)
    a, b = _snap_scales(a, b)
    return ev.sub(ctx, a, b)


def eval_mult_auto(
    ctx: FheContext, a: Ciphertext, b: Ciphertext, rlk: RelinKey
) -> Ciphertext:
    a, b = adjust_levels_and_depth(ctx, a, b)
    if a.noise_scale_deg == 2:
        a = mod_reduce(ctx, a, 1)
        b = mod_reduce(ctx, b, 1)
    deg = a.noise_scale_deg + b.noise_scale_deg
    out = ev.relinearize(ctx, ev.multiply(ctx, a, b), rlk)
    return replace(out, noise_scale_deg=deg)


def eval_square_auto(ctx: FheContext, a: Ciphertext, rlk: RelinKey) -> Ciphertext:
    if a.noise_scale_deg == 2:
        a = mod_reduce(ctx, a, 1)
    deg = 2 * a.noise_scale_deg
    out = ev.relinearize(ctx, ev.square(ctx, a), rlk)
    return replace(out, noise_scale_deg=deg)


def eval_mult_plain_auto(
    ctx: FheContext, ct: Ciphertext, pt: Plaintext
) -> Ciphertext:
    """EvalMultAutoInplace with a plaintext: morph pt into a size-1 ct,
    adjust, multiply slot-wise."""
    morph = Ciphertext(
        data=pt.data[None],
        chain_index=pt.chain_index,
        scale=pt.scale,
        noise_scale_deg=pt.noise_scale_deg,
    )
    ct2, morph = adjust_levels_and_depth(ctx, ct, morph)
    if ct2.noise_scale_deg == 2:
        ct2 = mod_reduce(ctx, ct2, 1)
        morph = mod_reduce(ctx, morph, 1)
    level = ctx.level(ct2.chain_index)
    data = mm.mul_mod(
        ct2.data, morph.data[0][None], level.mod.q, level.mod.ratio_lo,
        level.mod.ratio_hi,
    )
    return replace(
        ct2,
        data=data,
        scale=ct2.scale * morph.scale,
        noise_scale_deg=ct2.noise_scale_deg + morph.noise_scale_deg,
    )


# --------------------------------------------------------------------------
# RaiseMod (src/evaluate.cu:2459-2505) and MultByMonomial (:2521)
# --------------------------------------------------------------------------

def raise_mod(ctx: FheContext, ct: Ciphertext) -> Ciphertext:
    """Mod-raise to the full chain: signed-lift the anchor-level residues of
    each component to every limb of Q (via switchModulus) and NTT back.

    Classic regime: the anchor is limb 0 and the lift reads its residues
    directly.  Composite scaling: the anchor is a GROUP of primes, so the
    coefficients are first CRT-composed exactly to u64 (the params layer
    guarantees the anchor product fits 62 bits), centered against the group
    product, and reduced into every limb of Q."""
    if composite_degree(ctx) > 1:
        return _raise_mod_composite(ctx, ct)
    level = ctx.level(ct.chain_index)
    first = ctx.first_data_level
    coeff = inverse_ntt(ct.data, level.ntt)  # (size, L, N); only limb 0 used
    c_l0 = coeff[:, 0:1, :]                  # (size, 1, N) W64
    q0 = level.mod.q[0:1]                    # (1,1) uint64 table
    half = q0 >> 1
    new_q = first.mod.q                      # (K, 1)
    # signed lift: v > q0/2 represents v - q0
    is_neg = w64.gt(c_l0, half)
    bigger = new_q > q0
    lifted_up = w64.add(c_l0, new_q - q0)                 # new_q > q0 branch
    diff_small = w64.sub(new_q, mm.barrett_reduce_u64(q0, new_q, first.mod.ratio_hi))
    lifted_down = mm.barrett_reduce_u64(
        w64.add(c_l0, diff_small), new_q, first.mod.ratio_hi
    )
    pos_small = mm.barrett_reduce_u64(c_l0, new_q, first.mod.ratio_hi)
    raised = w64.where(
        bigger,
        w64.where(is_neg, lifted_up, c_l0),
        w64.where(is_neg, lifted_down, pos_small),
    )
    data = forward_ntt(raised, first.ntt)
    return replace(ct, data=data, chain_index=1)


def _raise_mod_composite(ctx: FheContext, ct: Ciphertext) -> Ciphertext:
    """RaiseMod for composite scaling: Garner-compose the anchor group's
    residues to the exact u64 coefficient mod Qa (= product of the anchor
    primes, < 2^62 by the params check), center against Qa, and reduce into
    every limb of Q.  Every target prime is < Qa, so only the reference's
    `new_q < q0` switchModulus branch applies (src/evaluate.cu:2459-2503)."""
    from ..core.numth import invert_mod

    d = composite_degree(ctx)
    level = ctx.level(ct.chain_index)
    if level.size != d:
        raise ValueError(
            "composite RaiseMod expects the ciphertext at the anchor level "
            f"(size {d}), got size {level.size}"
        )
    first = ctx.first_data_level
    qs = [int(v) for v in ctx.q_values[:d]]
    coeff = inverse_ntt(ct.data, level.ntt)  # (size, d, N), [0, q_i)

    def scl(v: int) -> np.ndarray:
        return np.array([[v]], dtype=np.uint64)

    # Garner: cur = x mod (q_0..q_{i-1}) as an exact u64; extend one prime
    # at a time with v_i = (x_i - cur) * inv(prod_prev) mod q_i.
    cur = coeff[:, 0:1, :]
    prod_prev = qs[0]
    for i in range(1, d):
        qi = qs[i]
        q_vec = level.mod.q[i:i + 1]
        rlo = level.mod.ratio_lo[i:i + 1]
        rhi = level.mod.ratio_hi[i:i + 1]
        cur_mod = mm.barrett_reduce_u64(cur, q_vec, rhi)
        diff = mm.sub_mod(coeff[:, i:i + 1, :], cur_mod, q_vec)
        inv = invert_mod(prod_prev % qi, qi)
        v = mm.mul_mod(diff, scl(inv), q_vec, rlo, rhi)
        cur = w64.add(mm.mul_u64_lo(v, scl(prod_prev)), cur)
        prod_prev *= qi

    qa = prod_prev
    new_q = first.mod.q  # (K, 1)
    all_q = [int(v) for v in ctx.q_values]
    is_neg = w64.gt(cur, scl(qa >> 1))
    # (cur - Qa) mod q_j computed as (cur + (q_j - Qa mod q_j)) mod q_j;
    # the sum stays < 2^62 + 2^31 so the u64 add is exact (host-exact
    # per-limb constants; q_j - Qa%q_j == q_j when q_j divides Qa is fine:
    # it only shifts by a multiple of q_j before the Barrett landing)
    diff_small = np.array(
        [[q - qa % q] for q in all_q], dtype=np.uint64
    )
    lifted_down = mm.barrett_reduce_u64(
        w64.add(cur, diff_small), new_q, first.mod.ratio_hi
    )
    pos = mm.barrett_reduce_u64(cur, new_q, first.mod.ratio_hi)
    raised = w64.where(is_neg, lifted_down, pos)
    data = forward_ntt(raised, first.ntt)
    return replace(ct, data=data, chain_index=1)


def mult_by_monomial(ctx: FheContext, ct: Ciphertext, power: int) -> Ciphertext:
    """Multiply by x^power (exact, scale-free)."""
    level = ctx.level(ct.chain_index)
    n = ctx.n
    m = 2 * n
    power = power % m
    index = power % n
    mono = np.zeros((level.size, n), dtype=np.uint64)
    if power < n:
        mono[:, index] = 1
    else:
        mono[:, index] = [qv - 1 for qv in level.base.values]
    mono_ntt = forward_ntt(W64.from_np(mono), level.ntt)
    data = mm.mul_mod(
        ct.data, mono_ntt[None], level.mod.q, level.mod.ratio_lo,
        level.mod.ratio_hi,
    )
    return ct.with_data(data)


def mult_by_integer(ctx: FheContext, ct: Ciphertext, value: int) -> Ciphertext:
    """Multiply by an exact integer (no scale change)."""
    level = ctx.level(ct.chain_index)
    residues = [value % q for q in level.base.values]
    factors = _scalar_vec(level, residues)
    data = mm.mul_mod(
        ct.data, factors[None], level.mod.q, level.mod.ratio_lo,
        level.mod.ratio_hi,
    )
    return ct.with_data(data)
