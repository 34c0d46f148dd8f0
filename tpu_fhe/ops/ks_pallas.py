"""Fused keyswitch inner product as a Pallas TPU kernel.

TPU-native counterpart of the reference's key_switch_inner_prod_c2_and_evk
(/root/reference/src/eval_key_switch.cu:26-85): for each limb of the
extended basis QlP, accumulate the beta digit x evk products in an explicit
128-bit (four uint32 plane) accumulator and land one Barrett reduction.

Why a kernel: the XLA version (eval/evaluator.py::key_inner_product)
measures ~2.4x above its VPU compute bound at the bench shape — the
128-bit accumulator chain materializes between fusions.  Here the whole
digit loop runs in VMEM per (limb, block) and the evaluation-key limb
slice [0:size_Ql] ++ [size_Q:size_QP] is performed by the block index map
(scalar-prefetch limb map), so the (dnum, 2, QlP, N) evk copy the XLA path
concatenates never exists.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import u32pair as u32

LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _add128(a, p):
    """(w0..w3) += (p0..p3) with carries; all uint32 tensors."""
    a0, a1, a2, a3 = a
    p0, p1, p2, p3 = p
    s0 = a0 + p0
    c0 = (s0 < a0).astype(jnp.uint32)
    s1 = a1 + p1
    c1 = (s1 < a1).astype(jnp.uint32)
    s1b = s1 + c0
    c1b = (s1b < s1).astype(jnp.uint32)
    s2 = a2 + p2
    c2 = (s2 < a2).astype(jnp.uint32)
    s2b = s2 + c1 + c1b
    c2b = (s2b < s2).astype(jnp.uint32)
    s3 = a3 + p3 + c2 + c2b
    return s0, s1b, s2b, s3


def _kernel(lm_ref, qlo_ref, qhi_ref, r0lo_ref, r0hi_ref, r1lo_ref, r1hi_ref,
            tlo_ref, thi_ref, klo_ref, khi_ref, olo_ref, ohi_ref,
            *, beta: int):
    l = pl.program_id(0)
    qlo = qlo_ref[l]
    qhi = qhi_ref[l]
    r0lo = r0lo_ref[l]
    r0hi = r0hi_ref[l]
    r1lo = r1lo_ref[l]
    r1hi = r1hi_ref[l]

    for c in range(2):
        acc = None
        for d in range(beta):
            tl = tlo_ref[d, 0]          # (R, 128)
            th = thi_ref[d, 0]
            kl = klo_ref[d, c, 0]
            kh = khi_ref[d, c, 0]
            prod = u32.mul64_full(tl, th, kl, kh)
            acc = prod if acc is None else _add128(acc, prod)
        w0, w1, w2, w3 = acc
        rlo, rhi = u32.barrett_reduce128(
            w0, w1, w2, w3, qlo, qhi, r0lo, r0hi, r1lo, r1hi
        )
        olo_ref[c, 0] = rlo
        ohi_ref[c, 0] = rhi


def _add96(a, p):
    """(w0, w1, w2) += 64-bit (p0, p1) with carries; all uint32 tensors."""
    a0, a1, a2 = a
    p0, p1 = p
    s0 = a0 + p0
    c0 = (s0 < a0).astype(jnp.uint32)
    s1 = a1 + p1
    c1 = (s1 < a1).astype(jnp.uint32)
    s1b = s1 + c0
    c1b = (s1b < s1).astype(jnp.uint32)
    s2 = a2 + c1 + c1b
    return s0, s1b, s2


def _kernel32(lm_ref, q_ref, wso_ref, c32_ref, c32s_ref, c64_ref, c64s_ref,
              t_ref, k_ref, o_ref, *, beta: int):
    """q32 variant: residues are single u32 words (q < 2^30), products are
    64-bit, the digit sum runs in a 96-bit accumulator and lands with the
    word-fold Barrett (u32.barrett_reduce96_32)."""
    l = pl.program_id(0)
    q = q_ref[l]
    args = (wso_ref[l], c32_ref[l], c32s_ref[l], c64_ref[l], c64s_ref[l])

    for c in range(2):
        acc = None
        for d in range(beta):
            prod = u32.mul32(t_ref[d, 0], k_ref[d, c, 0])
            if acc is None:
                acc = (prod[0], prod[1], jnp.zeros_like(prod[0]))
            else:
                acc = _add96(acc, prod)
        o_ref[c, 0] = u32.barrett_reduce96_32(*acc, q, *args)


def _kernel_shoup(lm_ref, qlo_ref, qhi_ref,
                  tlo_ref, thi_ref, klo_ref, khi_ref, kslo_ref, kshi_ref,
                  olo_ref, ohi_ref, *, beta: int):
    """Shoup-form variant: the evk carries precomputed Shoup companions, so
    each digit product is one lazy Shoup multiply to [0, 2q) and the digit
    sum runs in a plain 64-bit accumulator (csub per add) — no 128-bit MAC
    chain and no Barrett landing.  Bit-identical output to _kernel."""
    l = pl.program_id(0)
    qlo = qlo_ref[l]
    qhi = qhi_ref[l]
    q2lo = qlo + qlo
    q2hi = qhi + qhi + (q2lo < qlo).astype(jnp.uint32)

    for c in range(2):
        acc = None
        for d in range(beta):
            vl, vh = u32.mul_mod_shoup64(
                tlo_ref[d, 0], thi_ref[d, 0],
                klo_ref[d, c, 0], khi_ref[d, c, 0],
                kslo_ref[d, c, 0], kshi_ref[d, c, 0],
                qlo, qhi, lazy=True)                     # [0, 2q)
            if acc is None:
                acc = (vl, vh)
            else:
                sl, sh = u32.add64(acc[0], acc[1], vl, vh)   # < 4q < 2^63
                acc = u32.csub64(sl, sh, q2lo, q2hi)         # [0, 2q)
        olo, ohi = u32.csub64(acc[0], acc[1], qlo, qhi)      # [0, q)
        olo_ref[c, 0] = olo
        ohi_ref[c, 0] = ohi


def _kernel32_shoup(lm_ref, q_ref, t_ref, k_ref, ks_ref, o_ref, *, beta: int):
    """q32 Shoup-form variant: single-word residues, one lazy Shoup32
    multiply per digit, plain u32 accumulator (sums < 4q < 2^32)."""
    l = pl.program_id(0)
    q = q_ref[l]
    q2 = q + q
    for c in range(2):
        acc = None
        for d in range(beta):
            v = u32.mul_mod_shoup32(
                t_ref[d, 0], k_ref[d, c, 0], ks_ref[d, c, 0], q, lazy=True)
            acc = v if acc is None else u32.csub32(acc + v, q2)
        o_ref[c, 0] = u32.csub32(acc, q)


def key_inner_prod_shoup_pallas(t, evk, evk_shoup, limb_map, q_words):
    """Shoup-form inner product: evk_shoup = floor(evk * 2^64 / q) per limb
    (same shape as evk).  Returns W64 (2, L, N), bit-identical to
    key_inner_prod_pallas."""
    from .w64 import W64

    beta, L, n = t.shape
    rows = n // LANES

    def planes(x):
        return x.reshape(x.shape[:-1] + (rows, LANES))

    tlo, thi = planes(t.lo), planes(t.hi)
    klo, khi = planes(evk.lo), planes(evk.hi)
    kslo, kshi = planes(evk_shoup.lo), planes(evk_shoup.hi)

    q = np.asarray(q_words, dtype=np.uint64).reshape(-1)
    qlo = jnp.asarray((q & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    qhi = jnp.asarray((q >> np.uint64(32)).astype(np.uint32))
    lm = jnp.asarray(limb_map, dtype=jnp.int32)
    scalars = [lm, qlo, qhi]

    # per grid step: t 2 + evk 4 + shoup 4 planes per digit + 4 out planes;
    # budget must cover Pallas DOUBLE-BUFFERING of every block (observed:
    # 6 MB of planes compiled to a 16.04 MB scoped allocation at the
    # logN=16 bootstrap shape, 40 KB over the 16 MB limit)
    budget = 4 << 20
    rb = max(8, budget // (LANES * 4 * (10 * beta + 4)) // 8 * 8)
    rb = min(rb, rows)
    while rows % rb:
        rb -= 8

    zero = np.int32(0)

    def t_map(l, r, lm_ref, *_):
        return (zero, l, r, zero)

    def k_map(l, r, lm_ref, *_):
        return (zero, zero, lm_ref[l], r, zero)

    def o_map(l, r, lm_ref, *_):
        return (zero, l, r, zero)

    t_spec = pl.BlockSpec((beta, 1, rb, LANES), t_map, memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec(
        (beta, 2, 1, rb, LANES), k_map, memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec((2, 1, rb, LANES), o_map, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(L, rows // rb),
        in_specs=[t_spec, t_spec, k_spec, k_spec, k_spec, k_spec],
        out_specs=[o_spec, o_spec],
    )
    out_shape = [jax.ShapeDtypeStruct((2, L, rows, LANES), jnp.uint32)] * 2
    olo, ohi = pl.pallas_call(
        partial(_kernel_shoup, beta=beta),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*scalars, tlo, thi, klo, khi, kslo, kshi)
    return W64(olo.reshape(2, L, n), ohi.reshape(2, L, n))


def key_inner_prod_shoup_pallas32(t, evk, evk_shoup32, limb_map, q_words):
    """q32 Shoup-form inner product: evk_shoup32 = floor(evk * 2^32 / q) as
    a u32 plane of the same shape as evk.lo."""
    from .w64 import W64

    beta, L, n = t.shape
    rows = n // LANES

    def planes(x):
        return x.reshape(x.shape[:-1] + (rows, LANES))

    tlo = planes(t.lo)
    klo = planes(evk.lo)
    kslo = planes(evk_shoup32)

    q = np.asarray(q_words, dtype=np.uint64).reshape(-1)
    lm = jnp.asarray(limb_map, dtype=jnp.int32)
    scalars = [lm, jnp.asarray(q.astype(np.uint32))]

    budget = 6 << 20
    rb = max(8, budget // (LANES * 4 * (5 * beta + 2)) // 8 * 8)
    rb = min(rb, rows)
    while rows % rb:
        rb -= 8

    zero = np.int32(0)

    def t_map(l, r, lm_ref, *_):
        return (zero, l, r, zero)

    def k_map(l, r, lm_ref, *_):
        return (zero, zero, lm_ref[l], r, zero)

    def o_map(l, r, lm_ref, *_):
        return (zero, l, r, zero)

    t_spec = pl.BlockSpec((beta, 1, rb, LANES), t_map, memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec(
        (beta, 2, 1, rb, LANES), k_map, memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec((2, 1, rb, LANES), o_map, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(L, rows // rb),
        in_specs=[t_spec, k_spec, k_spec],
        out_specs=o_spec,
    )
    olo = pl.pallas_call(
        partial(_kernel32_shoup, beta=beta),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, L, rows, LANES), jnp.uint32),
        interpret=_interpret(),
    )(*scalars, tlo, klo, kslo)
    olo = olo.reshape(2, L, n)
    return W64(olo, None)  # compact: q32 residues < 2^30


def key_inner_prod_pallas32(t, evk, limb_map, q_words):
    """q32 inner product: t (beta, L, N) and evk (dnum, 2, size_QP, N) carry
    residues < 2^30 in their lo planes; returns W64 (2, L, N) with zero hi.
    Same contract as key_inner_prod_pallas (the Barrett constants derive
    from q_words on host)."""
    from .w64 import W64

    beta, L, n = t.shape
    rows = n // LANES

    def planes(x):
        return x.reshape(x.shape[:-1] + (rows, LANES))

    tlo = planes(t.lo)
    klo = planes(evk.lo)

    q = np.asarray(q_words, dtype=np.uint64).reshape(-1)
    ws_one = ((np.uint64(1) << np.uint64(32)) * np.ones_like(q)) // q
    c32 = (np.uint64(1) << np.uint64(32)) % q
    c64 = np.array([(1 << 64) % int(m) for m in q], dtype=np.uint64)
    c32s = ((c32 << np.uint64(32)) // q)
    c64s = ((c64 << np.uint64(32)) // q)

    def u32arr(v):
        return jnp.asarray(v.astype(np.uint32))

    lm = jnp.asarray(limb_map, dtype=jnp.int32)
    scalars = [lm, u32arr(q), u32arr(ws_one), u32arr(c32), u32arr(c32s),
               u32arr(c64), u32arr(c64s)]

    budget = 6 << 20
    per_row = 2 * LANES * 4 * (2 * beta + 2)
    rb = max(8, budget // per_row // 8 * 8)
    rb = min(rb, rows)
    while rows % rb:
        rb -= 8

    zero = np.int32(0)

    def t_map(l, r, lm_ref, *_):
        return (zero, l, r, zero)

    def k_map(l, r, lm_ref, *_):
        return (zero, zero, lm_ref[l], r, zero)

    def o_map(l, r, lm_ref, *_):
        return (zero, l, r, zero)

    t_spec = pl.BlockSpec((beta, 1, rb, LANES), t_map, memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec(
        (beta, 2, 1, rb, LANES), k_map, memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec((2, 1, rb, LANES), o_map, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(L, rows // rb),
        in_specs=[t_spec, k_spec],
        out_specs=o_spec,
    )
    olo = pl.pallas_call(
        partial(_kernel32, beta=beta),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, L, rows, LANES), jnp.uint32),
        interpret=_interpret(),
    )(*scalars, tlo, klo)
    olo = olo.reshape(2, L, n)
    return W64(olo, None)  # compact: q32 residues < 2^30


def key_inner_prod_pallas(t, evk, limb_map, q_words, ratio_lo, ratio_hi):
    """t: W64 (beta, L, N); evk: W64 (dnum, 2, size_QP, N);
    limb_map: (L,) int32 indices into the evk limb axis (Ql ++ P slice);
    q_words/ratio_*: (L,) uint64 per-limb Barrett constants.
    Returns W64 (2, L, N)."""
    from .w64 import W64

    beta, L, n = t.shape
    rows = n // LANES

    def planes(x):
        return x.reshape(x.shape[:-1] + (rows, LANES))

    tlo, thi = planes(t.lo), planes(t.hi)
    klo, khi = planes(evk.lo), planes(evk.hi)

    def words(v):
        v = np.asarray(v, dtype=np.uint64).reshape(-1)
        return (
            jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((v >> np.uint64(32)).astype(np.uint32)),
        )

    qlo, qhi = words(q_words)
    r0lo, r0hi = words(ratio_lo)
    r1lo, r1hi = words(ratio_hi)
    lm = jnp.asarray(limb_map, dtype=jnp.int32)
    scalars = [lm, qlo, qhi, r0lo, r0hi, r1lo, r1hi]

    # tile the row axis so VMEM stays bounded at large beta/N: per grid
    # step ~ rows_b * 128 * 8 * (3*beta + 2) bytes, double-buffered
    budget = 6 << 20
    rb = max(8, budget // (2 * LANES * 8 * (3 * beta + 2)) // 8 * 8)
    rb = min(rb, rows)
    while rows % rb:
        rb -= 8

    zero = np.int32(0)

    def t_map(l, r, lm_ref, *_):
        return (zero, l, r, zero)

    def k_map(l, r, lm_ref, *_):
        return (zero, zero, lm_ref[l], r, zero)

    def o_map(l, r, lm_ref, *_):
        return (zero, l, r, zero)

    t_spec = pl.BlockSpec((beta, 1, rb, LANES), t_map, memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec(
        (beta, 2, 1, rb, LANES), k_map, memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec((2, 1, rb, LANES), o_map, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(L, rows // rb),
        in_specs=[t_spec, t_spec, k_spec, k_spec],
        out_specs=[o_spec, o_spec],
    )
    out_shape = [jax.ShapeDtypeStruct((2, L, rows, LANES), jnp.uint32)] * 2
    olo, ohi = pl.pallas_call(
        partial(_kernel, beta=beta),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*scalars, tlo, thi, klo, khi)
    return W64(olo.reshape(2, L, n), ohi.reshape(2, L, n))
