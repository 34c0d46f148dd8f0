"""Coefficient-sharded evaluator ops: keyswitch and rotation with the ring
dimension N partitioned over a `coeff` mesh axis (SURVEY.md sections
2.3/5.7 — the "sequence parallel" analog for FHE).

All transforms go through the 4-step NTT (parallel.ntt4step): phase-local
butterflies + one all-to-all between phases.  Everything else in the
keyswitch is coefficient-local:

  * the per-digit base conversions contract over the LIMB axis — each
    coefficient column converts independently;
  * the inner product with the evk and the digit sum are elementwise in
    (limb, coeff);
  * the Galois automorphism is an index permutation of the N axis — under
    coeff sharding GSPMD lowers the gather to the shard exchange
    (all-to-all / collective-permute), the ppermute named in SURVEY 2.3.

Outputs are bit-identical to the single-device evaluator (tested in
tests/test_coeff_sharded.py): every step lands in canonical [0, q) exactly
as the fused single-chip kernels do.

The reference has no distributed counterpart (single GPU, SURVEY section 1);
the design is TPU-native, mesh axes ('limb', 'coeff').
"""

from __future__ import annotations

from dataclasses import replace

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..eval.evaluator import _mesh_modup_tables, _qlp_mod
from ..ops import w64
from ..ops import w64 as mm
from ..ops.bconv import bconv_matmul
from ..ops.galois import apply_galois_ntt, galois_elt_from_step
from ..ops.w64 import W64
from ..scheme.ciphertext import Ciphertext
from ..scheme.context import ContextLevel, FheContext
from ..scheme.keys import GaloisKey, RelinKey
from .ntt4step import forward_ntt_4step, inverse_ntt_4step


def coeff_mesh(n_limb: int = 1, n_coeff: int | None = None, devices=None) -> Mesh:
    """A ('limb', 'coeff') mesh for coefficient-sharded evaluation."""
    devices = devices if devices is not None else jax.devices()
    if n_coeff is None:
        n_coeff = len(devices) // n_limb
    dev = np.asarray(devices[: n_limb * n_coeff]).reshape(n_limb, n_coeff)
    return Mesh(dev, ("limb", "coeff"))


def _sharded(x: W64, mesh: Mesh, spec: P) -> W64:
    sh = NamedSharding(mesh, spec)
    return W64(
        jax.lax.with_sharding_constraint(x.lo, sh),
        jax.lax.with_sharding_constraint(x.hi, sh),
    )


CT_SPEC = P(None, "limb", "coeff")          # (size, L, N)
POLY_SPEC = P("limb", "coeff")              # (L, N)


def modup_4step(
    ctx: FheContext, level: ContextLevel, c2: W64, mesh: Mesh
) -> W64:
    """Digit decomposition with 4-step transforms; c2 (size_Ql, N) NTT form,
    coeff-sharded.  Uses the mask-select digit form (evaluator._modup_mesh)
    so no row splices cross shard boundaries; returns (beta, QlP, N)."""
    ks = level.ks
    from ..ops.ntt_pallas import NTTPlan32

    q32 = isinstance(level.ntt.plan, NTTPlan32)
    size_Ql = level.size
    full_ntt, q_all, rlo_all, rhi_all, per_digit = _mesh_modup_tables(level)
    qlp = q_all.shape[0]
    n = c2.shape[-1]

    # iNTT then the per-digit QlHatInv scale (the single-chip path fuses
    # these; unfused is bit-identical — both land canonical)
    coeff = inverse_ntt_4step(c2, level.ntt, mesh)
    scaled = mm.mul_mod_shoup(
        coeff, ks.part_qhatinv, ks.part_qhatinv_shoup, level.mod.q
    )
    scaled = _sharded(scaled, mesh, POLY_SPEC)

    own_ext = w64.concat([c2, w64.zeros((qlp - size_Ql, n))], axis=0)
    digits = []
    for dt, (qhat_all, own_mask) in zip(ks.digits, per_digit):
        piece = scaled[dt.start:dt.end]
        conv = bconv_matmul(
            piece, qhat_all, q_all, rlo_all, rhi_all, src_q32=q32
        )
        conv = _sharded(conv, mesh, POLY_SPEC)
        conv_ntt = forward_ntt_4step(conv, full_ntt, mesh)
        digits.append(w64.where(own_mask, own_ext, conv_ntt))
    return w64.stack(digits)


def moddown_4step(
    ctx: FheContext, level: ContextLevel, cx: W64, mesh: Mesh
) -> W64:
    """(2, QlP, N) NTT -> (2, Ql, N): BEHZ P->Ql with 4-step transforms."""
    ks = level.ks
    size_Ql = level.size
    from ..ops.ntt_pallas import NTTPlan32

    q32 = isinstance(level.ntt.plan, NTTPlan32)
    outs = []
    for comp in range(cx.shape[0]):
        x = cx[comp]
        p_coeff = inverse_ntt_4step(x[size_Ql:], ks.p_ntt, mesh)
        scaled = mm.mul_mod_shoup(
            p_coeff, ks.p_hatinv, ks.p_hatinv_shoup, ks.p_mod.q
        )
        delta = bconv_matmul(
            scaled, ks.p_hat_mod_q, level.mod.q, level.mod.ratio_lo,
            level.mod.ratio_hi, src_q32=q32,
        )
        delta_ntt = forward_ntt_4step(
            _sharded(delta, mesh, POLY_SPEC), level.ntt, mesh
        )
        diff = mm.sub_mod(x[:size_Ql], delta_ntt, level.mod.q)
        outs.append(mm.mul_mod_shoup(
            diff, ks.big_pinv_mod_q, ks.big_pinv_mod_q_shoup, level.mod.q
        ))
    return w64.stack(outs)


def keyswitch_core_4step(
    ctx: FheContext, level: ContextLevel, c2: W64, key: RelinKey, mesh: Mesh
) -> W64:
    """Full hybrid keyswitch of one coeff-sharded polynomial: (2, Ql, N)."""
    from ..eval.evaluator import key_inner_product

    t_mod_up = modup_4step(ctx, level, c2, mesh)
    # elementwise in (limb, coeff): stays sharded, no collectives
    cx = key_inner_product(ctx, level, t_mod_up, key)
    return moddown_4step(ctx, level, cx, mesh)


def rotate_4step(
    ctx: FheContext, ct: Ciphertext, step: int, gk: GaloisKey, mesh: Mesh
) -> Ciphertext:
    """Fused-form rotation with coeff-sharded keyswitch; the automorphism
    gather crosses shards (GSPMD ppermute/all-to-all)."""
    elt = galois_elt_from_step(step, ctx.n)
    if elt == 1:
        return ct
    key = gk.key_for_elt(elt)
    level = ctx.level(ct.chain_index)
    d = keyswitch_core_4step(ctx, level, ct.data[1], key, mesh)
    c0 = mm.add_mod(ct.data[0], d[0], level.mod.q)
    new0 = apply_galois_ntt(c0, elt, ctx.n)
    new1 = apply_galois_ntt(d[1], elt, ctx.n)
    out = w64.stack([new0, new1])
    out = _sharded(out, mesh, CT_SPEC)
    return ct.with_data(out)
