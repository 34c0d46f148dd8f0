"""Evaluator core: add/sub/mul, hybrid key switching, rescale, rotations.

TPU-native counterpart of the reference's evaluate layer (src/evaluate.cu,
src/eval_key_switch.cu, src/rns_bconv.cu:530-843, src/rns.cu rescale):

  * tensor products are elementwise NTT-domain modmuls over (L, N) planes;
  * hybrid key switching = modup (iNTT + per-digit fast basis conversion to
    the complement of QlP + NTT) -> beta-digit inner product with the evk in
    128-bit accumulation -> moddown (BEHZ P->Ql conversion + P^{-1} scale);
  * rescale divides by q_last with round-half-up via the half-lift trick.

All functions are pure; per-chain-index static shapes mean each level
compiles its own program (jit caches on Ciphertext aux metadata).
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.params import SchemeType
from ..ops import w64
from ..ops import w64 as mm
from ..ops.w64 import W64
from ..ops.bconv import bconv_matmul
from ..ops.galois import apply_galois_ntt, conj_elt, galois_elt_from_step
from ..ops.ntt import (
    forward_ntt,
    forward_ntt_sub_scale,
    inverse_ntt,
    inverse_ntt_scaled,
)
from ..scheme.ciphertext import Ciphertext, Plaintext
from ..scheme.context import ContextLevel, FheContext
from ..scheme.keys import GaloisKey, RelinKey


# --------------------------------------------------------------------------
# additive ops
# --------------------------------------------------------------------------

def _check_compatible(a: Ciphertext, b: Ciphertext):
    if a.chain_index != b.chain_index:
        raise ValueError("ciphertexts at different levels; adjust first")
    if abs(a.scale - b.scale) > 1e-6 * a.scale:
        raise ValueError("scale mismatch in add/sub")


def add(ctx: FheContext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    _check_compatible(a, b)
    level = ctx.level(a.chain_index)
    if a.size == b.size:
        data = mm.add_mod(a.data, b.data, level.mod.q)
    else:
        big, small = (a, b) if a.size > b.size else (b, a)
        head = mm.add_mod(big.data[: small.size], small.data, level.mod.q)
        data = w64.concat([head, big.data[small.size:]], axis=0)
    return a.with_data(data)


def sub(ctx: FheContext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    _check_compatible(a, b)
    level = ctx.level(a.chain_index)
    if a.size == b.size:
        data = mm.sub_mod(a.data, b.data, level.mod.q)
    elif a.size > b.size:
        head = mm.sub_mod(a.data[: b.size], b.data, level.mod.q)
        data = w64.concat([head, a.data[b.size:]], axis=0)
    else:
        head = mm.sub_mod(a.data, b.data[: a.size], level.mod.q)
        tail = mm.neg_mod(b.data[a.size:], level.mod.q)
        data = w64.concat([head, tail], axis=0)
    return a.with_data(data)


def negate(ctx: FheContext, a: Ciphertext) -> Ciphertext:
    level = ctx.level(a.chain_index)
    return a.with_data(mm.neg_mod(a.data, level.mod.q))


def add_plain(ctx: FheContext, a: Ciphertext, pt: Plaintext) -> Ciphertext:
    level = ctx.level(a.chain_index)
    head = mm.add_mod(a.data[0], pt.data, level.mod.q)
    return a.with_data(w64.concat([head[None], a.data[1:]], axis=0))


def sub_plain(ctx: FheContext, a: Ciphertext, pt: Plaintext) -> Ciphertext:
    level = ctx.level(a.chain_index)
    head = mm.sub_mod(a.data[0], pt.data, level.mod.q)
    return a.with_data(w64.concat([head[None], a.data[1:]], axis=0))


# --------------------------------------------------------------------------
# multiplication (CKKS/BGV tensor product, NTT domain)
# --------------------------------------------------------------------------

def multiply(ctx: FheContext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    """General NTT-domain tensor product: size-m x size-n -> size (m+n-1),
    c_k = sum_{i+j=k} a_i * b_j (reference tensor_prod_mxn_rns_poly path,
    src/evaluate.cu:415-479); scales multiply.  The common 2x2 case emits
    exactly the classic (a0b0, a0b1+a1b0, a1b1)."""
    _ = _check_level(a, b)
    level = ctx.level(a.chain_index)
    q, rlo, rhi = level.mod.q, level.mod.ratio_lo, level.mod.ratio_hi
    if ctx.is_q32:
        c32 = q32_mul_consts_for(level)
        mul = lambda x, y: mm.mul_mod_q32(x, y, c32)  # noqa: E731
    else:
        mul = lambda x, y: mm.mul_mod(x, y, q, rlo, rhi)  # noqa: E731
    m, n = a.size, b.size
    comps: list = [None] * (m + n - 1)
    for i in range(m):
        for j in range(n):
            t = mul(a.data[i], b.data[j])
            k = i + j
            comps[k] = t if comps[k] is None else mm.add_mod(comps[k], t, q)
    return replace(
        a,
        data=w64.stack(comps),
        scale=a.scale * b.scale,
        noise_scale_deg=a.noise_scale_deg + b.noise_scale_deg,
    )


def square(ctx: FheContext, a: Ciphertext) -> Ciphertext:
    level = ctx.level(a.chain_index)
    q, rlo, rhi = level.mod.q, level.mod.ratio_lo, level.mod.ratio_hi
    if ctx.is_q32:
        c32 = q32_mul_consts_for(level)
        mul = lambda x, y: mm.mul_mod_q32(x, y, c32)  # noqa: E731
    else:
        mul = lambda x, y: mm.mul_mod(x, y, q, rlo, rhi)  # noqa: E731
    a0, a1 = a.data[0], a.data[1]
    c0 = mul(a0, a0)
    c2 = mul(a1, a1)
    cross = mul(a0, a1)
    cross = mm.add_mod(cross, cross, q)
    return replace(
        a,
        data=w64.stack([c0, cross, c2]),
        scale=a.scale * a.scale,
        noise_scale_deg=a.noise_scale_deg * 2,
    )


def multiply_plain(ctx: FheContext, a: Ciphertext, pt: Plaintext) -> Ciphertext:
    level = ctx.level(a.chain_index)
    q, rlo, rhi = level.mod.q, level.mod.ratio_lo, level.mod.ratio_hi
    pt_data = pt.data if isinstance(pt.data, W64) else W64(pt.data, None)
    if ctx.is_q32:
        data = mm.mul_mod_q32(a.data, pt_data[None],
                              q32_mul_consts_for(level))
    else:
        data = mm.mul_mod(a.data, pt_data[None], q, rlo, rhi)
    return replace(
        a,
        data=data,
        scale=a.scale * pt.scale,
        noise_scale_deg=a.noise_scale_deg + pt.noise_scale_deg,
    )


def _check_level(a: Ciphertext, b: Ciphertext) -> int:
    if a.chain_index != b.chain_index:
        raise ValueError("operands at different chain indices")
    return a.chain_index


# --------------------------------------------------------------------------
# hybrid key switching (the hot path)
# --------------------------------------------------------------------------


_Q32MUL_CACHE: dict = {}


def q32_mul_consts_for(level: ContextLevel, ext: bool = False):
    """Cached single-word multiply constants (w64.q32_mul_consts) for a
    level's Ql (or extended QlP) basis."""
    got = _Q32MUL_CACHE.get((id(level), ext))
    if got is not None:
        return got[1]
    from ..utils.device import host_np

    if ext:
        qv = np.concatenate(
            [host_np(level.mod.q), host_np(level.ks.p_mod.q)]
        ).reshape(-1)
    else:
        qv = host_np(level.mod.q).reshape(-1)
    consts = w64.q32_mul_consts(qv)
    _Q32MUL_CACHE[(id(level), ext)] = (level, consts)
    return consts


_MESH_MODUP_CACHE: dict = {}


def _limb_mesh_active() -> bool:
    """True when tracing under a device mesh whose 'limb' axis is > 1 —
    only then is the shard-friendly modup form worth its extra NTT rows."""
    if not w64._in_mesh_context():
        return False
    try:
        from jax._src import mesh as _mesh_lib

        m = _mesh_lib.thread_resources.env.physical_mesh
        if not m.empty:
            return m.shape.get("limb", 1) > 1
    except Exception:  # pragma: no cover - private API moved
        pass
    try:
        m = jax.sharding.get_abstract_mesh()
        return dict(getattr(m, "shape_tuple", ())).get("limb", 1) > 1
    except Exception:  # pragma: no cover
        return False


def _replicate_mesh(x: W64) -> W64:
    """Explicitly replicate a small boundary block under an active limb
    mesh: the SPMD partitioner then emits ONE all-gather for it instead of
    a train of per-shard collective-permutes (the r04 scaling logs' 12->30
    permute growth came from limb-boundary slices in rescale/moddown
    being resharded piecemeal)."""
    if not w64._in_mesh_context():
        return x
    try:
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as _P
        from jax._src import mesh as _mesh_lib

        m = _mesh_lib.thread_resources.env.physical_mesh
        if m.empty:
            return x
        rep = NamedSharding(m, _P())

        def con(v):
            return _jax.lax.with_sharding_constraint(v, rep)

        return W64(con(x.lo), None if x.hi_ is None else con(x.hi_))
    except Exception:  # pragma: no cover - private API moved
        return x


def _mesh_modup_tables(level: ContextLevel):
    """Per-level tables for the shard-friendly (mask-select) modup form:
    full-QlP NTT tables, per-digit (QlP, alpha) conversion matrices with
    zero rows at the digit's own limbs, and the QlP modulus vectors."""
    got = _MESH_MODUP_CACHE.get(id(level))
    if got is not None:
        return got[1]
    import numpy as _np

    from ..ops.ntt import DeviceNTTTables
    from ..utils.device import host_np

    ks = level.ks
    size_Ql = level.size
    size_P = int(ks.p_mod.q.shape[0])
    qlp = size_Ql + size_P
    full_ntt = DeviceNTTTables.concat(level.ntt, ks.p_ntt)
    q, rlo, rhi = _qlp_mod(level)
    q = q.reshape(-1, 1)
    rlo = rlo.reshape(-1, 1)
    rhi = rhi.reshape(-1, 1)
    per_digit = []
    for dt in ks.digits:
        alpha = dt.end - dt.start
        tab = host_np(dt.qhat_mod_p, dtype=_np.uint64)
        full = _np.zeros((qlp, alpha), dtype=_np.uint64)
        full[: dt.start] = tab[: dt.start]
        full[dt.end:] = tab[dt.start:]
        rows = _np.arange(qlp)
        own_mask = ((rows >= dt.start) & (rows < dt.end))[:, None]
        per_digit.append((full, own_mask))
    data = (full_ntt, q, rlo, rhi, per_digit)
    _MESH_MODUP_CACHE[id(level)] = (level, data)
    return data


def _modup_mesh(
    ctx: FheContext, level: ContextLevel, c2: W64, scaled: W64,
    *, is_ntt: bool, q32: bool,
) -> W64:
    """Shard-friendly modup: instead of row-splicing each digit's own NTT
    limbs into the converted complement (a concat that crosses limb-shard
    boundaries and makes the SPMD partitioner emit collective-permutes),
    convert EVERY QlP row per digit (zero conversion weights at the
    digit's own rows), NTT the whole (QlP, N) block limb-locally, and
    elementwise-select the own rows from the zero-padded input.  Costs
    alpha extra NTT rows per digit; keeps every step limb-local except
    the bconv contraction itself, which becomes the digit-sum collective
    (SURVEY.md section 2.3).  Bit-identical to the splice form."""
    ks = level.ks
    size_Ql = level.size
    full_ntt, q_all, rlo_all, rhi_all, per_digit = _mesh_modup_tables(level)
    qlp = q_all.shape[0]
    n = c2.shape[-1]

    if is_ntt:
        own_full = c2
    else:
        own_full = forward_ntt(c2, level.ntt)
    own_ext = w64.concat(
        [own_full, w64.zeros((qlp - size_Ql, n))], axis=0
    )

    # replicate the scaled coefficient rows ONCE (one all-gather of the
    # (L, N) block) instead of letting the partitioner emit per-digit
    # boundary gathers for every alpha-row slice below
    scaled = _replicate_mesh(scaled)

    digits = []
    for dt, (qhat_all, own_mask) in zip(ks.digits, per_digit):
        piece = scaled[dt.start:dt.end]
        conv = bconv_matmul(
            piece, qhat_all, q_all, rlo_all, rhi_all, src_q32=q32
        )
        conv_ntt = forward_ntt(conv, full_ntt)
        digits.append(w64.where(own_mask, own_ext, conv_ntt))
    return w64.stack(digits)


def modup(
    ctx: FheContext, level: ContextLevel, c2: W64, *, is_ntt: bool = True
) -> W64:
    """Digit-decompose c2 ((size_Ql, N)) into (beta, size_QlP, N), NTT form.

    Mirrors DRNSTool::modup (src/rns_bconv.cu:530-628): iNTT, scale by the
    per-digit partQlHatInv, fast-convert each digit to the complement of
    QlP, NTT the converted limbs, and splice the digit's own NTT limbs in
    unchanged.  With is_ntt=False (BFV: coefficient-form input) the iNTT is
    skipped and the digit's own limbs are forward-transformed instead.
    Under an active device mesh the mask-select form (_modup_mesh) is used
    instead of the row splice."""
    ks = level.ks
    from ..ops.ntt_pallas import NTTPlan32

    q32 = isinstance(level.ntt.plan, NTTPlan32)
    if is_ntt:
        scaled = inverse_ntt_scaled(
            c2, level.ntt, ks.part_qhatinv, ks.part_qhatinv_shoup
        )
    else:
        scaled = mm.mul_mod_shoup(
            c2, ks.part_qhatinv, ks.part_qhatinv_shoup, level.mod.q
        )
    if _limb_mesh_active():
        return _modup_mesh(ctx, level, c2, scaled, is_ntt=is_ntt, q32=q32)
    digits = []
    for dt in ks.digits:
        piece = scaled[dt.start:dt.end]
        conv = bconv_matmul(
            piece, dt.qhat_mod_p, dt.comp_mod.q, dt.comp_mod.ratio_lo,
            dt.comp_mod.ratio_hi, src_q32=q32,
        )
        conv_ntt = forward_ntt(conv, dt.comp_ntt)
        if is_ntt:
            own = c2[dt.start:dt.end]
        else:
            own = forward_ntt(
                c2[dt.start:dt.end],
                level.ntt.slice_limbs(list(range(dt.start, dt.end))),
            )
        if q32:
            # q32: every piece is a compact residue plane (< 2^30); splice
            # the lo planes only so the structurally-zero hi planes are
            # never materialized by the concat/stack copies
            digits.append(jnp.concatenate(
                [conv_ntt.lo[: dt.start], own.lo, conv_ntt.lo[dt.start:]],
                axis=0,
            ))
        else:
            digits.append(w64.concat(
                [conv_ntt[: dt.start], own, conv_ntt[dt.start:]],
                axis=0,
            ))
    if q32:
        return W64(jnp.stack(digits), None)
    return w64.stack(digits)


def key_inner_product(
    ctx: FheContext, level: ContextLevel, t_mod_up: W64, key: RelinKey
) -> W64:
    """(beta, size_QlP, N) x evk -> (2, size_QlP, N) with 128-bit lazy
    accumulation (src/eval_key_switch.cu:26-85)."""
    ks = level.ks
    size_Ql = level.size
    size_Q = ctx.params.size_Q
    evk = key.data  # (dnum, 2, size_QP, N); q32 keys arrive as bare u32
    if not isinstance(evk, W64):
        # compact q32 key: hi planes are structurally zero; the q32 pallas
        # kernels read only the lo plane, and the XLA fallback synthesizes
        # zero hi in-program (fused, never resident in HBM)
        import jax.numpy as _jnp

        evk = W64(evk, _jnp.zeros_like(evk))
    beta = ks.beta
    n = t_mod_up.shape[-1]

    from ..ops.ntt_pallas import pallas_enabled

    if pallas_enabled() and n % 128 == 0 and (n // 128) % 8 == 0:
        # fused kernel: the Ql ++ P evk limb slice happens in the block
        # index map, the digit loop in VMEM (ops/ks_pallas.py)
        from ..ops.ks_pallas import (
            key_inner_prod_pallas, key_inner_prod_pallas32,
        )
        from ..ops.ntt_pallas import NTTPlan32
        import numpy as _np

        q, rlo, rhi = _qlp_mod(level)
        size_QP = ctx.params.size_QP  # evk rows may be padded for sharding
        limb_map = _np.concatenate([
            _np.arange(size_Ql, dtype=_np.int32),
            _np.arange(size_Q, size_QP, dtype=_np.int32),
        ])
        if isinstance(level.ntt.plan, NTTPlan32):
            if key.shoup is not None:
                # Shoup-form key: one lazy Shoup32 multiply per digit,
                # plain u32 accumulator (ops/ks_pallas.py)
                from ..ops.ks_pallas import key_inner_prod_shoup_pallas32

                return key_inner_prod_shoup_pallas32(
                    t_mod_up[:beta], evk, key.shoup, limb_map, q.reshape(-1)
                )
            # q32 context: single-word residues, 96-bit digit accumulator
            return key_inner_prod_pallas32(
                t_mod_up[:beta], evk, limb_map, q.reshape(-1)
            )
        if key.shoup is not None:
            from ..ops.ks_pallas import key_inner_prod_shoup_pallas

            return key_inner_prod_shoup_pallas(
                t_mod_up[:beta], evk, key.shoup, limb_map, q.reshape(-1)
            )
        return key_inner_prod_pallas(
            t_mod_up[:beta], evk, limb_map,
            q.reshape(-1), rlo.reshape(-1), rhi.reshape(-1),
        )

    evk_l = w64.concat(
        [evk[:, :, :size_Ql, :], evk[:, :, size_Q:ctx.params.size_QP, :]],
        axis=2,
    )  # (dnum, 2, size_QlP, N); upper bound explicit because the key's
    # limb axis may carry zero pad rows from mesh sharding
    shape = (2,) + t_mod_up.shape[1:]
    acc_hi = w64.zeros(shape)
    acc_lo = w64.zeros(shape)
    for d in range(beta):
        hi, lo = mm.mul_u64_full(t_mod_up[d][None], evk_l[d])
        acc_hi, acc_lo = mm.add_u128(acc_hi, acc_lo, hi, lo)
    qlp = _qlp_mod(level)
    return mm.barrett_reduce_u128(acc_hi, acc_lo, *qlp)


def _qlp_mod(level: ContextLevel):
    ks = level.ks
    import numpy as _np

    from ..utils.device import host_np

    q = _np.concatenate([host_np(level.mod.q), host_np(ks.p_mod.q)])
    rlo = _np.concatenate(
        [host_np(level.mod.ratio_lo), host_np(ks.p_mod.ratio_lo)]
    )
    rhi = _np.concatenate(
        [host_np(level.mod.ratio_hi), host_np(ks.p_mod.ratio_hi)]
    )
    return q, rlo, rhi


def moddown_from_ntt(
    ctx: FheContext, level: ContextLevel, cx: W64, *, output_ntt: bool = True
) -> W64:
    """(..., size_QlP, N) NTT -> (..., size_Ql, N): subtract the BEHZ
    P->Ql conversion of the P part and scale by P^{-1}
    (DRNSTool::moddown_from_NTT, src/rns_bconv.cu:791-843).  With
    output_ntt=False (BFV) the Ql part is inverse-transformed and the
    subtraction happens in the coefficient domain instead."""
    ks = level.ks
    size_Ql = level.size
    from ..ops.ntt_pallas import NTTPlan32

    q32 = isinstance(level.ntt.plan, NTTPlan32)
    if ctx.scheme == SchemeType.bgv:
        # t-preserving subtraction (reference bgv_moddown_kernel): delta =
        # t*U with U = [x * t^{-1}]_P, so delta = x (mod P) and 0 (mod t);
        # the alpha*t*P conversion overshoot divides to alpha*t = 0 mod t.
        scaled = _replicate_mesh(inverse_ntt_scaled(
            cx[..., size_Ql:, :], ks.p_ntt,
            ks.tinv_p_hatinv, ks.tinv_p_hatinv_shoup,
        ))
        delta = bconv_matmul(
            scaled, ks.p_hat_mod_q, level.mod.q, level.mod.ratio_lo,
            level.mod.ratio_hi, src_q32=q32,
        )
        pre, pre_shoup = ks.t_mod_q, ks.t_mod_q_shoup
    else:
        scaled = _replicate_mesh(inverse_ntt_scaled(
            cx[..., size_Ql:, :], ks.p_ntt, ks.p_hatinv, ks.p_hatinv_shoup
        ))
        delta = bconv_matmul(
            scaled, ks.p_hat_mod_q, level.mod.q, level.mod.ratio_lo,
            level.mod.ratio_hi, src_q32=q32,
        )
        pre = pre_shoup = None
    if output_ntt:
        # (cx - pre*NTT(delta)) * P^{-1} fused into the forward transform
        return forward_ntt_sub_scale(
            delta, cx[..., :size_Ql, :], level.ntt,
            ks.big_pinv_mod_q, ks.big_pinv_mod_q_shoup,
            pre=pre, pre_shoup=pre_shoup,
        )
    if pre is not None:
        delta = mm.mul_mod_shoup(delta, pre, pre_shoup, level.mod.q)
    ql_coeff = inverse_ntt(cx[..., :size_Ql, :], level.ntt)
    diff = mm.sub_mod(ql_coeff, delta, level.mod.q)
    return mm.mul_mod_shoup(
        diff, ks.big_pinv_mod_q, ks.big_pinv_mod_q_shoup, level.mod.q
    )


def keyswitch_core(
    ctx: FheContext,
    level: ContextLevel,
    c2: W64,
    key: RelinKey,
    *,
    input_ntt: bool = True,
    output_ntt: bool = True,
) -> W64:
    """Full hybrid keyswitch of one polynomial: returns (2, size_Ql, N)."""
    t_mod_up = modup(ctx, level, c2, is_ntt=input_ntt)
    cx = key_inner_product(ctx, level, t_mod_up, key)
    return moddown_from_ntt(ctx, level, cx, output_ntt=output_ntt)


def relinearize(ctx: FheContext, a: Ciphertext, rlk: RelinKey) -> Ciphertext:
    """size-3 -> size-2 using the relinearization key."""
    if a.size != 3:
        raise ValueError("relinearize expects a size-3 ciphertext")
    level = ctx.level(a.chain_index)
    delta = keyswitch_core(ctx, level, a.data[2], rlk)
    data = mm.add_mod(a.data[:2], delta, level.mod.q)
    return a.with_data(data)


# --------------------------------------------------------------------------
# rescale / mod switch (CKKS)
# --------------------------------------------------------------------------

def rescale_to_next(ctx: FheContext, a: Ciphertext) -> Ciphertext:
    """Divide by q_last with rounding; drops one limb and one chain level
    (mirrors divide_and_round_q_last_ntt, src/rns.cu)."""
    if a.chain_index + 1 >= len(ctx.chain):
        raise ValueError("already at the last level; cannot rescale")
    level = ctx.level(a.chain_index)
    size_Ql = level.size
    if size_Ql < 2:
        raise ValueError("no modulus left to rescale")
    q = level.mod.q
    q_last = q[-1:]  # (1,1)
    half = q_last >> 1

    last_coeff = _replicate_mesh(inverse_ntt(
        a.data[:, -1:, :], level.ntt.slice_limbs([size_Ql - 1])))
    # add q_last/2 for rounding, then reduce into each remaining q_i
    last_half = mm.add_mod(last_coeff, half, q_last)
    rest_mod = ctx.level(a.chain_index + 1).mod
    reduced = mm.barrett_reduce_u64(
        last_half, rest_mod.q, rest_mod.ratio_hi
    )  # (..., 1->broadcast? no: (size,1,N) vs (L-1,1)) -- handled below
    # broadcast the single limb across remaining limbs
    reduced = w64.broadcast_to(
        reduced, a.data.shape[:-2] + (size_Ql - 1, a.data.shape[-1])
    )
    half_mod = mm.barrett_reduce_u64(half, rest_mod.q, rest_mod.ratio_hi)
    tmp = mm.sub_mod(reduced, half_mod, rest_mod.q)
    next_level = ctx.level(a.chain_index + 1)
    # (ct - NTT(tmp)) * q_last^{-1} fused into the forward transform
    out = forward_ntt_sub_scale(
        tmp, a.data[:, :-1, :], next_level.ntt,
        level.inv_q_last_mod_q, level.inv_q_last_mod_q_shoup,
    )
    q_last_val = ctx.q_values[size_Ql - 1]
    # noise_scale_deg is managed by the FLEXIBLEAUTO layer (ModReduce);
    # plain rescale only adjusts the scale (reference rescale_to_next).
    return replace(
        a,
        data=out,
        chain_index=a.chain_index + 1,
        scale=a.scale / q_last_val,
    )


def _garner_compose_u64(level, coeff: W64, start: int, count: int,
                        qs: list[int]) -> W64:
    """CRT-compose `count` consecutive limb residues (chain positions
    start..start+count-1 of `level`) into the exact u64 value mod their
    product (caller guarantees the product fits 62 bits).  Garner: extend
    one prime at a time with v_i = (x_i - cur) * inv(prod_prev) mod q_i."""
    from ..core.numth import invert_mod

    def scl(v: int) -> np.ndarray:
        return np.array([[v]], dtype=np.uint64)

    cur = coeff[..., 0:1, :]
    prod_prev = qs[0]
    for i in range(1, count):
        qi = qs[i]
        row = start + i
        q_vec = level.mod.q[row:row + 1]
        rlo = level.mod.ratio_lo[row:row + 1]
        rhi = level.mod.ratio_hi[row:row + 1]
        cur_mod = mm.barrett_reduce_u64(cur, q_vec, rhi)
        diff = mm.sub_mod(coeff[..., i:i + 1, :], cur_mod, q_vec)
        inv = invert_mod(prod_prev % qi, qi)
        v = mm.mul_mod(diff, scl(inv), q_vec, rlo, rhi)
        cur = w64.add(mm.mul_u64_lo(v, scl(prod_prev)), cur)
        prod_prev *= qi
    return cur


def rescale_composite(ctx: FheContext, a: Ciphertext, limbs: int = 2) -> Ciphertext:
    """Composite-scaling rescale: ONE divide-and-round by the product of
    the last `limbs` primes.

    The TPU-native q32 regime replaces each ~56-60-bit scale prime with a
    PAIR of ~28-30-bit primes (single-word butterflies, see
    ops/ntt_pallas.py q32 plan); one logical CKKS level then spans two
    RNS limbs and a multiplication rescales by both.  Precision matches
    the 60-bit-prime regime because the working scale is the pair product
    (~2^56), not a single small prime.

    Fused path (product < 2^62): iNTT only the dropped limbs,
    Garner-compose them to the exact u64 value mod Q2, apply the rounding
    shift, and land the subtraction + *Q2^{-1} in ONE fused forward pass —
    half the NTT work of `limbs` sequential single-prime rescales (which
    remain the fallback for oversized products)."""
    if limbs == 1:
        return rescale_to_next(ctx, a)
    if a.chain_index + limbs >= len(ctx.chain):
        raise ValueError("not enough levels left to rescale")
    level = ctx.level(a.chain_index)
    L = level.size
    if L - limbs < 1:
        raise ValueError("no modulus left to rescale")
    qd = [int(v) for v in ctx.q_values[L - limbs:L]]
    q2 = 1
    for v in qd:
        q2 *= v
    if q2.bit_length() > 62:
        for _ in range(limbs):
            a = rescale_to_next(ctx, a)
        return a

    drop_idx = list(range(L - limbs, L))
    # per-(level, limbs) cached slice: slice_limbs builds host index views
    # and must never run per call on the bootstrap hot path
    slice_cache = ctx.__dict__.setdefault("_comp_rescale_ntt_slices", {})
    drop_ntt = slice_cache.get((a.chain_index, limbs))
    if drop_ntt is None:
        drop_ntt = level.ntt.slice_limbs(drop_idx)
        slice_cache[(a.chain_index, limbs)] = drop_ntt
    coeff = inverse_ntt(a.data[:, L - limbs:, :], drop_ntt)
    v = _garner_compose_u64(level, coeff, L - limbs, limbs, qd)  # [0, Q2)

    half = q2 >> 1
    # w = (v + Q2/2) mod Q2 (sum < 2^63: exact), then per remaining limb
    # tmp_i = (w - Q2/2) mod q_i so that x - tmp == round(x/Q2)*Q2 (mod q_i)
    w_ = w64.csub(
        w64.add(v, np.array([[half]], dtype=np.uint64)),
        np.array([[q2]], dtype=np.uint64),
    )
    next_level = ctx.level(a.chain_index + limbs)
    rest_mod = next_level.mod
    red = mm.barrett_reduce_u64(w_, rest_mod.q, rest_mod.ratio_hi)
    rest_q = [int(x) for x in ctx.q_values[:L - limbs]]
    half_mod = np.array([[half % q] for q in rest_q], dtype=np.uint64)
    tmp = mm.sub_mod(red, half_mod, rest_mod.q)

    cache = ctx.__dict__.setdefault("_comp_rescale_tables", {})
    tabs = cache.get((a.chain_index, limbs))
    if tabs is None:
        from ..core.numth import invert_mod

        inv_q2 = np.array(
            [[invert_mod(q2 % q, q)] for q in rest_q], dtype=np.uint64
        )
        inv_q2_shoup = np.array(
            [[(int(iv[0]) << 64) // q] for iv, q in zip(inv_q2, rest_q)],
            dtype=np.uint64,
        )
        tabs = (inv_q2, inv_q2_shoup)
        cache[(a.chain_index, limbs)] = tabs
    inv_q2, inv_q2_shoup = tabs

    out = forward_ntt_sub_scale(
        tmp, a.data[:, :L - limbs, :], next_level.ntt, inv_q2, inv_q2_shoup
    )
    scale = a.scale
    for v_ in qd:
        scale /= float(v_)
    return replace(a, data=out, chain_index=a.chain_index + limbs, scale=scale)


def mod_drop_to_next(ctx: FheContext, a: Ciphertext) -> Ciphertext:
    """Drop the last limb without scaling (mod switch)."""
    if a.chain_index + 1 >= len(ctx.chain):
        raise ValueError("already at the last level; cannot drop further")
    return replace(a, data=a.data[:, :-1, :], chain_index=a.chain_index + 1)


# --------------------------------------------------------------------------
# rotations
# --------------------------------------------------------------------------

def rotate(ctx: FheContext, a: Ciphertext, step: int, gk: GaloisKey) -> Ciphertext:
    """Rotate by `step` slots.  When the fused key for this exact step is
    missing, fall back to the step's NAF decomposition over power-of-two
    rotations (reference rotate_internal, src/evaluate.cu:1885-1915) —
    any step rotates with only the O(log N) classic key set
    (SecretKey.galois_key_power_of_2)."""
    elt = galois_elt_from_step(step, ctx.n)
    if elt == 1:
        return a
    try:
        key = gk.key_for_elt(elt)
    except ValueError:
        from ..core.numth import naf

        parts = naf(step)
        if len(parts) <= 1:
            raise  # power-of-two step with no key: nothing to compose
        out = a
        slots = ctx.n // 2
        for s in parts:
            if abs(s) != slots:
                out = rotate(ctx, out, s, gk)
        return out
    return apply_galois_with_key(ctx, a, elt, key)


def conjugate(ctx: FheContext, a: Ciphertext, gk: GaloisKey) -> Ciphertext:
    return apply_galois(ctx, a, conj_elt(ctx.n), gk)


def apply_galois(ctx: FheContext, a: Ciphertext, elt: int, gk: GaloisKey) -> Ciphertext:
    if elt == 1:
        return a
    return apply_galois_with_key(ctx, a, elt, gk.key_for_elt(elt))


def apply_galois_with_key(
    ctx: FheContext, a: Ciphertext, elt: int, key: RelinKey
) -> Ciphertext:
    """Fused-form rotation (reference EvalRotateFused, src/evaluate.cu:2154):
    keyswitch the UNROTATED c1 with the fused key Enc_{sigma^{-1}(s)}(P*s),
    then apply sigma to both output components and c0."""
    if a.size != 2:
        raise ValueError("rotate expects size-2 ciphertext")
    level = ctx.level(a.chain_index)
    d = keyswitch_core(ctx, level, a.data[1], key)
    c0 = mm.add_mod(a.data[0], d[0], level.mod.q)
    new0 = apply_galois_ntt(c0, elt, ctx.n)
    new1 = apply_galois_ntt(d[1], elt, ctx.n)
    return a.with_data(w64.stack([new0, new1]))
