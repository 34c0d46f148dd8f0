"""Fused negacyclic NTT / iNTT as single Pallas TPU kernels.

One kernel invocation performs the FULL log2(N)-stage transform for one RNS
limb entirely in VMEM: one HBM read + one HBM write per limb instead of the
log2(N) round trips of the stage-by-stage XLA path (ops/ntt.py).  This is
the TPU-native counterpart of the reference's fused 2D NTT kernels
(src/ntt/fntt_2d.cu, src/ntt/intt_2d.cu): their N1 x N2 phase split maps
onto our (N/128, 128) matrix layout with a VMEM transpose between the
row-butterfly phase and the column-butterfly phase.

Key algebraic restructuring for the TPU vector unit (everything stays 2D,
no in-kernel reshapes):

  * data layout M[j1, j2], flat index i = j1*N2 + j2, N2 = 128 lanes.
  * phase 1 (gaps >= N2) pairs rows of M; phase 2 (gaps < N2) pairs rows of
    the VMEM-transposed T = M^T.
  * each butterfly stage is expressed with sublane ROLLS + a lane-parallel
    select, so the twiddle operand is a per-row column vector — never a
    lane-indexed tensor.
  * the phase-2 stage twiddles factor as
        roots[m + j1*G + g] = roots[m + g] * psi^(2*rev_N1(j1)*tt)
    and the column-dependent part accumulates LINEARLY over the stages
    (sum of tt over set bits of j2), so it collapses into one elementwise
    "twist" multiply by psi^(2*rev_N1(j1)*j2): applied before the phase-2
    stages of the forward DIT transform, and after the phase-A stages of
    the inverse GS transform (with psi^-1).  What remains per stage is a
    row-only twiddle vector.
  * Harvey lazy butterflies in [0, 4q) with Shoup multiplication on
    (lo, hi) uint32 pairs (the VPU is a 32-bit machine; see ops/u32pair.py),
    matching the reference's lazy forms (include/butterfly.cuh:10-109).
  * twiddles are packed per stage layout on the host once per key-level
    context (NTTPlan) and block-selected per limb through a scalar-prefetch
    limb map, so every modulus-chain level shares one plan.

Bit-exact: outputs match core/ntt_tables.golden_forward_ntt per limb.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import u32pair as u32

N2 = 128          # lane dimension of the in-kernel matrix layout
LOG_N2 = 7
MIN_N = 1024      # smallest ring the kernel layout supports (N1 >= 8)


def _mode() -> str:
    return os.environ.get("TPU_FHE_PALLAS", "auto")


def pallas_enabled() -> bool:
    mode = _mode()
    if mode == "never":
        return False
    if mode == "always":
        return True
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# host-side plan construction
# ---------------------------------------------------------------------------


def _split_u32(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    a = np.asarray(a, dtype=np.uint64)
    return (
        (a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (a >> np.uint64(32)).astype(np.uint32),
    )


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class NTTPlan:
    """Per-stage twiddle layouts for the fused kernel (leading limb axis L).

    s1 arrays (L, N1, S1): per row-phase stage k, column k holds the per-row
        twiddle vector W[r] = table[2^k + r // (2*s_k)].
    s2 arrays (L, N2, S2): per column-phase stage k', column k' holds the
        per-row (of T) twiddle vector W[j2] = table[m_k' + j2 // (2*tt_k')].
    twist arrays (L, N2, N1): psi^(+-2*rev_N1(j1)*j2) elementwise table.
    Scalars (L,): modulus words and n^{-1} (value + Shoup) words.
    Every 64-bit quantity is stored as _lo/_hi (+ _slo/_shi Shoup) uint32.
    """

    fw_s1: tuple
    fw_s2: tuple
    fw_tw: tuple
    iv_s1: tuple
    iv_s2: tuple
    iv_tw: tuple
    q_lo: jnp.ndarray
    q_hi: jnp.ndarray
    invn_lo: jnp.ndarray
    invn_hi: jnp.ndarray
    invn_slo: jnp.ndarray
    invn_shi: jnp.ndarray

    def tree_flatten(self):
        return tuple(getattr(self, f) for f in self.__dataclass_fields__), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n(self) -> int:
        return self.fw_tw[0].shape[-1] * N2

    @property
    def n1(self) -> int:
        return self.fw_tw[0].shape[-1]


def _np_shoup(vals: np.ndarray, q: int) -> np.ndarray:
    """Vectorized floor(w * 2^64 / q) (exact; native u128 when available)."""
    from .. import native

    fast = native.shoup_vec(vals, int(q))
    if fast is not None:
        return fast
    obj = (vals.astype(object) << 64) // q
    return obj.astype(np.uint64)


from functools import lru_cache


@lru_cache(maxsize=None)
def _limb_plan(t):
    """Per-limb plan pieces (cached: shared across contexts and rebuilds)."""
    n = t.n
    n1 = n // N2
    log_n = n.bit_length() - 1
    log_n1 = log_n - LOG_N2

    from ..core.numth import bit_reverse_perm

    rev_n1 = bit_reverse_perm(log_n1)
    j2_col = np.arange(N2)
    q = t.modulus.value
    roots = np.array(t.root_powers, dtype=np.uint64)
    iroots = np.array(t.inv_root_powers, dtype=np.uint64)

    # power tables psi^e, psi^-e for e in [0, 2n) (fast exact ints)
    psi_pow = np.zeros(2 * n, dtype=np.uint64)
    ipsi_pow = np.zeros(2 * n, dtype=np.uint64)
    p = pi = 1
    for e in range(2 * n):
        psi_pow[e] = p
        ipsi_pow[e] = pi
        p = (p * t.root) % q
        pi = (pi * t.inv_root) % q

    def quad(vals):
        return (*_split_u32(vals), *_split_u32(_np_shoup(vals, q)))

    # row-phase stage vectors (natural layout, rows j1)
    r_idx = np.arange(n1)
    s1f = np.zeros((n1, log_n1), dtype=np.uint64)
    s1i = np.zeros((n1, log_n1), dtype=np.uint64)
    for k in range(log_n1):
        m = 1 << k
        s = n1 >> (k + 1)
        s1f[:, k] = roots[m + r_idx // (2 * s)]
        s1i[:, k] = iroots[m + r_idx // (2 * s)]

    # column-phase stage vectors (transposed layout, rows j2)
    s2f = np.zeros((N2, LOG_N2), dtype=np.uint64)
    s2i = np.zeros((N2, LOG_N2), dtype=np.uint64)
    for kp in range(LOG_N2):
        m = n1 << kp
        tt = N2 >> (kp + 1)
        s2f[:, kp] = roots[m + j2_col // (2 * tt)]
        s2i[:, kp] = iroots[m + j2_col // (2 * tt)]

    # twist tables (transposed layout (N2, N1))
    exps = (2 * rev_n1[None, :] * j2_col[:, None]) % (2 * n)
    return dict(
        fw_s1=quad(s1f), iv_s1=quad(s1i),
        fw_s2=quad(s2f), iv_s2=quad(s2i),
        fw_tw=quad(psi_pow[exps]), iv_tw=quad(ipsi_pow[exps]),
        invn=(t.inv_degree, int(_np_shoup(np.array([t.inv_degree], dtype=np.uint64), q)[0])),
    )


def build_ntt_plan(tables) -> NTTPlan | None:
    """Build the kernel twiddle plan from host NTTTables (exact integers).

    All arrays stay HOST numpy: they reach the kernel as closed-over
    compile-time constants, so plan construction does no device work."""
    n = tables[0].n
    if n < MIN_N:
        return None
    L = len(tables)
    per = [_limb_plan(t) for t in tables]

    def stack(key):
        return tuple(
            np.stack([per[l][key][c] for l in range(L)], axis=0)
            for c in range(4)
        )

    q_words = np.array([t.modulus.value for t in tables], dtype=np.uint64)
    invn = np.array([per[l]["invn"][0] for l in range(L)], dtype=np.uint64)
    invn_s = np.array([per[l]["invn"][1] for l in range(L)], dtype=np.uint64)
    ql, qh = _split_u32(q_words)
    il, ih = _split_u32(invn)
    isl, ish = _split_u32(invn_s)
    return NTTPlan(
        fw_s1=stack("fw_s1"), fw_s2=stack("fw_s2"), fw_tw=stack("fw_tw"),
        iv_s1=stack("iv_s1"), iv_s2=stack("iv_s2"), iv_tw=stack("iv_tw"),
        q_lo=ql, q_hi=qh,
        invn_lo=il, invn_hi=ih, invn_slo=isl, invn_shi=ish,
    )


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------


def _roll_up(x, s):
    """out[r] = x[r + s] (cyclic) along the sublane axis."""
    return pltpu.roll(x, np.int32(x.shape[0] - s), 0)


def _roll_down(x, s):
    """out[r] = x[r - s] (cyclic) along the sublane axis."""
    return pltpu.roll(x, np.int32(s), 0)


SLICE_MIN_GAP = 8   # sublane-tile-aligned gap: use slice butterflies


def _dit_stages(xl, xh, w_ref, n_stages, rows, cols, qlo, qhi, q2lo, q2hi,
                first_stage_rowgap):
    """Forward (Cooley-Tukey DIT) stages along the sublane axis.

    Stage k pairs rows (r, r + s) with s = first_stage_rowgap >> k; the
    per-row twiddle vector lives in column k of w_ref's four planes.
    Values stay in Harvey-lazy [0, 4q).

    For tile-aligned gaps (s >= 8) the pairs form contiguous (a-block,
    b-block) row ranges sharing ONE twiddle, so the stage runs on static
    slices: the Shoup multiply touches only the b half (2x fewer multiplies
    than the roll formulation) and no rolls/selects are needed.
    """
    for k in range(n_stages):
        s = first_stage_rowgap >> k
        wl = w_ref[0][0, :, k:k + 1]
        wh = w_ref[1][0, :, k:k + 1]
        wsl = w_ref[2][0, :, k:k + 1]
        wsh = w_ref[3][0, :, k:k + 1]
        if s >= SLICE_MIN_GAP:
            pieces_l, pieces_h = [], []
            for base in range(0, rows, 2 * s):
                al, ah = u32.csub64(xl[base:base + s], xh[base:base + s],
                                    q2lo, q2hi)              # [0, 2q)
                bl = xl[base + s:base + 2 * s]
                bh = xh[base + s:base + 2 * s]
                vl, vh = u32.mul_mod_shoup64(
                    bl, bh, wl[base:base + s], wh[base:base + s],
                    wsl[base:base + s], wsh[base:base + s], qlo, qhi,
                    lazy=True)                               # [0, 2q)
                sl, sh = u32.add64(al, ah, vl, vh)           # [0, 4q)
                tl, th = u32.add64(al, ah, q2lo, q2hi)
                dl, dh = u32.sub64(tl, th, vl, vh)           # [0, 4q)
                pieces_l += [sl, dl]
                pieces_h += [sh, dh]
            xl = jnp.concatenate(pieces_l, axis=0)
            xh = jnp.concatenate(pieces_h, axis=0)
            continue
        row_id = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        is_a = (row_id & s) == 0
        al, ah = u32.csub64(xl, xh, q2lo, q2hi)             # [0, 2q)
        bl = _roll_up(xl, s)
        bh = _roll_up(xh, s)
        vl, vh = u32.mul_mod_shoup64(bl, bh, wl, wh, wsl, wsh, qlo, qhi,
                                     lazy=True)             # [0, 2q)
        sl, sh = u32.add64(al, ah, vl, vh)                  # [0, 4q)
        tl, th = u32.add64(al, ah, q2lo, q2hi)
        dl, dh = u32.sub64(tl, th, vl, vh)                  # [0, 4q)
        dl = _roll_down(dl, s)
        dh = _roll_down(dh, s)
        xl = jnp.where(is_a, sl, dl)
        xh = jnp.where(is_a, sh, dh)
    return xl, xh


def _gs_stages(xl, xh, w_ref, n_stages, rows, cols, qlo, qhi, q2lo, q2hi,
               first_stage_rowgap):
    """Inverse (Gentleman-Sande) roll-based stages along the sublane axis.

    Stage k pairs rows at gap s = first_stage_rowgap << ... runs smallest
    gap first: stage index k walks columns (n_stages-1 - k) of w_ref with
    s = 1 << k ... the caller passes first_stage_rowgap = 1 and the stage
    order is s = 1, 2, ..., 2^(n_stages-1).  Values stay in [0, 2q).
    """
    for k in range(n_stages):
        s = first_stage_rowgap << k
        col = n_stages - 1 - k
        wl = w_ref[0][0, :, col:col + 1]
        wh = w_ref[1][0, :, col:col + 1]
        wsl = w_ref[2][0, :, col:col + 1]
        wsh = w_ref[3][0, :, col:col + 1]
        if s >= SLICE_MIN_GAP:
            # contiguous (a-block, b-block) pairs share one twiddle: the
            # Shoup multiply runs on the difference half only (see
            # _dit_stages) and no rolls/selects are needed
            pieces_l, pieces_h = [], []
            for base in range(0, rows, 2 * s):
                al = xl[base:base + s]
                ah = xh[base:base + s]
                bl = xl[base + s:base + 2 * s]
                bh = xh[base + s:base + 2 * s]
                ul, uh = u32.add64(al, ah, bl, bh)          # [0, 4q)
                ul, uh = u32.csub64(ul, uh, q2lo, q2hi)     # [0, 2q)
                tl, th = u32.add64(al, ah, q2lo, q2hi)
                tl, th = u32.sub64(tl, th, bl, bh)          # [0, 4q)
                vl, vh = u32.mul_mod_shoup64(
                    tl, th, wl[base:base + s], wh[base:base + s],
                    wsl[base:base + s], wsh[base:base + s], qlo, qhi,
                    lazy=True)                              # [0, 2q)
                pieces_l += [ul, vl]
                pieces_h += [uh, vh]
            xl = jnp.concatenate(pieces_l, axis=0)
            xh = jnp.concatenate(pieces_h, axis=0)
            continue
        row_id = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        is_a = (row_id & s) == 0
        bl = _roll_up(xl, s)
        bh = _roll_up(xh, s)
        ul, uh = u32.add64(xl, xh, bl, bh)                  # [0, 4q)
        ul, uh = u32.csub64(ul, uh, q2lo, q2hi)             # [0, 2q)
        tl, th = u32.add64(xl, xh, q2lo, q2hi)
        tl, th = u32.sub64(tl, th, bl, bh)                  # [0, 4q)
        vl, vh = u32.mul_mod_shoup64(tl, th, wl, wh, wsl, wsh, qlo, qhi,
                                     lazy=True)             # [0, 2q)
        vl = _roll_down(vl, s)
        vh = _roll_down(vh, s)
        xl = jnp.where(is_a, ul, vl)
        xh = jnp.where(is_a, uh, vh)
    return xl, xh


def _fwd_kernel(lm_ref, qlo_ref, qhi_ref,
                xlo_ref, xhi_ref,
                s1lo, s1hi, s1slo, s1shi,
                s2lo, s2hi, s2slo, s2shi,
                twlo, twhi, twslo, twshi,
                olo_ref, ohi_ref,
                *, log_n1: int, n1: int):
    l = pl.program_id(0)
    qlo = qlo_ref[l]
    qhi = qhi_ref[l]
    q2lo = qlo + qlo
    q2hi = qhi + qhi + (q2lo < qlo).astype(jnp.uint32)

    xl = xlo_ref[0, 0]     # (N1, N2), [0, q)
    xh = xhi_ref[0, 0]

    # phase 1: row butterflies in natural layout, gaps N1/2 ... 1 rows
    xl, xh = _dit_stages(xl, xh, (s1lo, s1hi, s1slo, s1shi), log_n1,
                         n1, N2, qlo, qhi, q2lo, q2hi, n1 >> 1)

    # transpose; pairs of the remaining stages are sublane-adjacent in T
    xl = xl.T
    xh = xh.T

    # twist: elementwise * psi^(2*rev(j1)*j2)  -> [0, 2q)
    xl, xh = u32.mul_mod_shoup64(
        xl, xh, twlo[0], twhi[0], twslo[0], twshi[0], qlo, qhi, lazy=True)

    # phase 2: column stages (now row stages of T), gaps N2/2 ... 1
    xl, xh = _dit_stages(xl, xh, (s2lo, s2hi, s2slo, s2shi), LOG_N2,
                         N2, n1, qlo, qhi, q2lo, q2hi, N2 >> 1)

    # reduce [0,4q) -> [0,q) and restore natural layout
    xl, xh = u32.csub64(xl, xh, q2lo, q2hi)
    xl, xh = u32.csub64(xl, xh, qlo, qhi)
    olo_ref[0, 0] = xl.T
    ohi_ref[0, 0] = xh.T


def _fwd_sub_scale_kernel(lm_ref, qlo_ref, qhi_ref,
                          plo_ref, phi_ref, pslo_ref, pshi_ref,
                          elo_ref, ehi_ref, eslo_ref, eshi_ref,
                          xlo_ref, xhi_ref, sublo_ref, subhi_ref,
                          s1lo, s1hi, s1slo, s1shi,
                          s2lo, s2hi, s2slo, s2shi,
                          twlo, twhi, twslo, twshi,
                          olo_ref, ohi_ref,
                          *, log_n1: int, n1: int, has_pre: bool):
    """Forward NTT fused with the moddown/rescale landing:
    out = (sub - pre * NTT(x)) * post  (all mod q, per limb).

    pre (e*) is the BGV t factor (skipped when has_pre=False); post (p*)
    is P^{-1} (moddown) or q_last^{-1} (rescale).  Mirrors the reference's
    nwt_2d_radix8_forward_inplace_fuse_moddown (src/ntt/ntt_moddown.cu)
    which folds the same subtraction into the forward transform."""
    l = pl.program_id(0)
    qlo = qlo_ref[l]
    qhi = qhi_ref[l]
    q2lo = qlo + qlo
    q2hi = qhi + qhi + (q2lo < qlo).astype(jnp.uint32)

    xl = xlo_ref[0, 0]
    xh = xhi_ref[0, 0]
    xl, xh = _dit_stages(xl, xh, (s1lo, s1hi, s1slo, s1shi), log_n1,
                         n1, N2, qlo, qhi, q2lo, q2hi, n1 >> 1)
    xl = xl.T
    xh = xh.T
    xl, xh = u32.mul_mod_shoup64(
        xl, xh, twlo[0], twhi[0], twslo[0], twshi[0], qlo, qhi, lazy=True)
    xl, xh = _dit_stages(xl, xh, (s2lo, s2hi, s2slo, s2shi), LOG_N2,
                         N2, n1, qlo, qhi, q2lo, q2hi, N2 >> 1)
    xl, xh = u32.csub64(xl, xh, q2lo, q2hi)
    xl, xh = u32.csub64(xl, xh, qlo, qhi)
    xl = xl.T
    xh = xh.T

    if has_pre:
        xl, xh = u32.mul_mod_shoup64(
            xl, xh, elo_ref[l], ehi_ref[l], eslo_ref[l], eshi_ref[l],
            qlo, qhi)
    dl, dh = u32.sub_mod64(sublo_ref[0, 0], subhi_ref[0, 0], xl, xh, qlo, qhi)
    dl, dh = u32.mul_mod_shoup64(
        dl, dh, plo_ref[l], phi_ref[l], pslo_ref[l], pshi_ref[l], qlo, qhi)
    olo_ref[0, 0] = dl
    ohi_ref[0, 0] = dh


def _inv_kernel(lm_ref, qlo_ref, qhi_ref, slo_ref, shi_ref, sslo_ref, sshi_ref,
                xlo_ref, xhi_ref,
                s1lo, s1hi, s1slo, s1shi,
                s2lo, s2hi, s2slo, s2shi,
                twlo, twhi, twslo, twshi,
                olo_ref, ohi_ref,
                *, log_n1: int, n1: int):
    l = pl.program_id(0)
    qlo = qlo_ref[l]
    qhi = qhi_ref[l]
    q2lo = qlo + qlo
    q2hi = qhi + qhi + (q2lo < qlo).astype(jnp.uint32)

    xl = xlo_ref[0, 0].T    # (N2, N1): small-gap stages first
    xh = xhi_ref[0, 0].T

    # phase A: gaps 1 ... N2/2 along sublanes of T
    xl, xh = _gs_stages(xl, xh, (s2lo, s2hi, s2slo, s2shi), LOG_N2,
                        N2, n1, qlo, qhi, q2lo, q2hi, 1)

    # twist: elementwise * psi^(-2*rev(j1)*j2)
    xl, xh = u32.mul_mod_shoup64(
        xl, xh, twlo[0], twhi[0], twslo[0], twshi[0], qlo, qhi, lazy=True)

    xl = xl.T
    xh = xh.T

    # phase B: row stages in natural layout, gaps 1 ... N1/2 rows
    xl, xh = _gs_stages(xl, xh, (s1lo, s1hi, s1slo, s1shi), log_n1,
                        n1, N2, qlo, qhi, q2lo, q2hi, 1)

    # fused final scale (n^{-1}, possibly folded with a caller constant),
    # full reduction to [0, q)
    sl = slo_ref[l]
    sh = shi_ref[l]
    ssl = sslo_ref[l]
    ssh = sshi_ref[l]
    xl, xh = u32.mul_mod_shoup64(xl, xh, sl, sh, ssl, ssh, qlo, qhi)
    olo_ref[0, 0] = xl
    ohi_ref[0, 0] = xh


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------


def _call(x, plan: NTTPlan, limb_map, forward: bool, scale4=None):
    """x is a w64.W64 with shape (..., Lc, N); returns the same."""
    from .w64 import W64

    n = plan.n
    n1 = plan.n1
    log_n1 = n1.bit_length() - 1
    lead = x.shape[:-2]
    Lc = x.shape[-2]
    b = int(np.prod(lead)) if lead else 1
    xlo = x.lo.reshape(b, Lc, n1, N2)
    xhi = x.hi.reshape(b, Lc, n1, N2)

    lm = limb_map.astype(jnp.int32)
    q_lo = jnp.take(plan.q_lo, lm)
    q_hi = jnp.take(plan.q_hi, lm)
    scalars = [lm, q_lo, q_hi]
    if not forward:
        if scale4 is None:
            scale4 = (
                jnp.take(plan.invn_lo, lm), jnp.take(plan.invn_hi, lm),
                jnp.take(plan.invn_slo, lm), jnp.take(plan.invn_shi, lm),
            )
        scalars += list(scale4)

    if forward:
        tw = plan.fw_s1 + plan.fw_s2 + plan.fw_tw
        kernel = partial(_fwd_kernel, log_n1=log_n1, n1=n1)
    else:
        tw = plan.iv_s1 + plan.iv_s2 + plan.iv_tw
        kernel = partial(_inv_kernel, log_n1=log_n1, n1=n1)

    zero = np.int32(0)  # x64 mode would otherwise emit i64 block indices

    def data_map(l, bb, *_):
        return (bb, l, zero, zero)

    def tw_map(l, bb, lm_ref, *_):
        return (lm_ref[l], zero, zero)

    data_spec = pl.BlockSpec((1, 1, n1, N2), data_map, memory_space=pltpu.VMEM)
    s1_spec = pl.BlockSpec((1, n1, log_n1), tw_map, memory_space=pltpu.VMEM)
    s2_spec = pl.BlockSpec((1, N2, LOG_N2), tw_map, memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((1, N2, n1), tw_map, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(Lc, b),
        in_specs=[data_spec, data_spec] + [s1_spec] * 4 + [s2_spec] * 4
                 + [tw_spec] * 4,
        out_specs=[data_spec, data_spec],
    )
    out_shape = [jax.ShapeDtypeStruct((b, Lc, n1, N2), jnp.uint32)] * 2
    olo, ohi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*scalars, xlo, xhi, *tw)
    shape = lead + (Lc, n)
    return W64(olo.reshape(shape), ohi.reshape(shape))


def host_scale_quad(scale, q) -> tuple:
    """(lo, hi, shoup_lo, shoup_hi) device scalars from host per-limb
    uint64 scale values (exact Shoup via native u128 / bigint)."""
    q = np.asarray(q, dtype=np.uint64).reshape(-1)
    s = np.asarray(scale, dtype=np.uint64).reshape(-1)
    shoup = np.array(
        [_np_shoup(s[i : i + 1], int(q[i]))[0] for i in range(len(q))],
        dtype=np.uint64,
    )
    slo, shi = _split_u32(s)
    sslo, sshi = _split_u32(shoup)
    return (jnp.asarray(slo), jnp.asarray(shi),
            jnp.asarray(sslo), jnp.asarray(sshi))


def forward_ntt_sub_scale_pallas(x, sub, tables, post_quad, pre_quad=None):
    """out = (sub - pre * NTT(x)) * post, fused into one kernel pass.

    x, sub: W64 (..., L, N); post_quad/pre_quad: per-limb scale quads from
    host_scale_quad (pre omitted = no multiplier on the NTT result)."""
    from .w64 import W64

    plan = tables.plan
    n = plan.n
    n1 = plan.n1
    log_n1 = n1.bit_length() - 1
    lead = x.shape[:-2]
    Lc = x.shape[-2]
    b = int(np.prod(lead)) if lead else 1
    xlo = x.lo.reshape(b, Lc, n1, N2)
    xhi = x.hi.reshape(b, Lc, n1, N2)
    sublo = sub.lo.reshape(b, Lc, n1, N2)
    subhi = sub.hi.reshape(b, Lc, n1, N2)

    lm = tables.limb_map.astype(jnp.int32)
    q_lo = jnp.take(plan.q_lo, lm)
    q_hi = jnp.take(plan.q_hi, lm)
    has_pre = pre_quad is not None
    if pre_quad is None:
        pre_quad = post_quad  # placeholder refs (unread when has_pre=False)
    scalars = [lm, q_lo, q_hi, *post_quad, *pre_quad]

    tw = plan.fw_s1 + plan.fw_s2 + plan.fw_tw
    kernel = partial(_fwd_sub_scale_kernel, log_n1=log_n1, n1=n1,
                     has_pre=has_pre)

    zero = np.int32(0)

    def data_map(l, bb, *_):
        return (bb, l, zero, zero)

    def tw_map(l, bb, lm_ref, *_):
        return (lm_ref[l], zero, zero)

    data_spec = pl.BlockSpec((1, 1, n1, N2), data_map, memory_space=pltpu.VMEM)
    s1_spec = pl.BlockSpec((1, n1, log_n1), tw_map, memory_space=pltpu.VMEM)
    s2_spec = pl.BlockSpec((1, N2, LOG_N2), tw_map, memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((1, N2, n1), tw_map, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(Lc, b),
        in_specs=[data_spec] * 4 + [s1_spec] * 4 + [s2_spec] * 4
                 + [tw_spec] * 4,
        out_specs=[data_spec, data_spec],
    )
    out_shape = [jax.ShapeDtypeStruct((b, Lc, n1, N2), jnp.uint32)] * 2
    olo, ohi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*scalars, xlo, xhi, sublo, subhi, *tw)
    shape = lead + (Lc, n)
    return W64(olo.reshape(shape), ohi.reshape(shape))


def forward_ntt_pallas(x, tables) -> jnp.ndarray:
    """Fused forward NTT; drop-in for ops.ntt.forward_ntt on supported N."""
    if isinstance(tables.plan, NTTPlan32):
        return _call32(x, tables.plan, tables.limb_map, forward=True)
    return _call(x, tables.plan, tables.limb_map, forward=True)


def inverse_ntt_pallas(x, tables, scale4=None) -> jnp.ndarray:
    """Fused inverse NTT including the n^{-1} scale (or a caller-supplied
    fused per-limb scale quad (lo, hi, shoup_lo, shoup_hi) that must already
    include n^{-1}; on the q32 plan a (value, shoup32) pair)."""
    if isinstance(tables.plan, NTTPlan32):
        return _call32(x, tables.plan, tables.limb_map, forward=False,
                       scale2=scale4)
    return _call(x, tables.plan, tables.limb_map, forward=False, scale4=scale4)


# ---------------------------------------------------------------------------
# q32 fast path: all moduli < 2^30 -> one u32 plane carries a full residue
# ---------------------------------------------------------------------------
#
# The TPU VPU is a 32-bit machine; with 30-bit NTT primes every butterfly
# multiply collapses from ~28 widened 16-bit-half multiplies (u32-pair
# Shoup) to 6 native u32 multiplies (u32.mul_mod_shoup32).  Harvey's lazy
# [0, 4q) form fits one word exactly when q < 2^30.  This is the TPU-native
# parameter regime (composite scaling: pairs of ~30-bit primes replace one
# ~60-bit prime at identical security = identical total log Q); the 64-bit
# plan remains the default for reference-parity parameters.

Q32_BOUND = 1 << 30


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class NTTPlan32:
    """q32 twiddle plan: (value, shoup32) u32 pairs per stage layout."""

    fw_s1: tuple
    fw_s2: tuple
    fw_tw: tuple
    iv_s1: tuple
    iv_s2: tuple
    iv_tw: tuple
    q32: jnp.ndarray
    invn: jnp.ndarray
    invn_s: jnp.ndarray

    def tree_flatten(self):
        return tuple(getattr(self, f) for f in self.__dataclass_fields__), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n(self) -> int:
        return self.fw_tw[0].shape[-1] * N2

    @property
    def n1(self) -> int:
        return self.fw_tw[0].shape[-1]


def _shoup32_host(vals_u32: np.ndarray, q: int) -> np.ndarray:
    """floor(w * 2^32 / q) as u32 (exact in u64: w < 2^30)."""
    w = vals_u32.astype(np.uint64)
    return ((w << np.uint64(32)) // np.uint64(q)).astype(np.uint32)


def build_ntt_plan32(tables) -> "NTTPlan32 | None":
    """q32 plan from host NTTTables; requires every modulus < 2^30."""
    n = tables[0].n
    if n < MIN_N:
        return None
    if any(t.modulus.value >= Q32_BOUND for t in tables):
        return None
    per = [_limb_plan(t) for t in tables]
    qs = [int(t.modulus.value) for t in tables]

    def stack(key):
        vals = np.stack([per[l][key][0] for l in range(len(tables))], axis=0)
        shoup = np.stack(
            [_shoup32_host(per[l][key][0], qs[l]) for l in range(len(tables))],
            axis=0,
        )
        return (vals, shoup)

    invn = np.array([per[l]["invn"][0] for l in range(len(tables))],
                    dtype=np.uint32)
    invn_s = np.array(
        [_shoup32_host(invn[l:l + 1], qs[l])[0] for l in range(len(tables))],
        dtype=np.uint32,
    )
    return NTTPlan32(
        fw_s1=stack("fw_s1"), fw_s2=stack("fw_s2"), fw_tw=stack("fw_tw"),
        iv_s1=stack("iv_s1"), iv_s2=stack("iv_s2"), iv_tw=stack("iv_tw"),
        q32=np.array(qs, dtype=np.uint32), invn=invn, invn_s=invn_s,
    )


def _dit_stages32(x, wv_ref, ws_ref, n_stages, rows, cols, q, q2,
                  first_stage_rowgap):
    """Forward DIT stages, single u32 plane, invariant [0, 4q), q < 2^30."""
    for k in range(n_stages):
        s = first_stage_rowgap >> k
        wv = wv_ref[0, :, k:k + 1]
        ws = ws_ref[0, :, k:k + 1]
        if s >= SLICE_MIN_GAP:
            pieces = []
            for base in range(0, rows, 2 * s):
                a = u32.csub32(x[base:base + s], q2)           # [0, 2q)
                v = u32.mul_mod_shoup32(
                    x[base + s:base + 2 * s], wv[base:base + s],
                    ws[base:base + s], q, lazy=True)           # [0, 2q)
                pieces += [a + v, a + q2 - v]                  # [0, 4q)
            x = jnp.concatenate(pieces, axis=0)
            continue
        row_id = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        is_a = (row_id & s) == 0
        a = u32.csub32(x, q2)
        b = _roll_up(x, s)
        v = u32.mul_mod_shoup32(b, wv, ws, q, lazy=True)
        d = _roll_down(a + q2 - v, s)
        x = jnp.where(is_a, a + v, d)
    return x


def _gs_stages32(x, wv_ref, ws_ref, n_stages, rows, cols, q, q2,
                 first_stage_rowgap):
    """Inverse GS stages, single u32 plane, invariant [0, 2q), q < 2^30."""
    for k in range(n_stages):
        s = first_stage_rowgap << k
        col = n_stages - 1 - k
        wv = wv_ref[0, :, col:col + 1]
        ws = ws_ref[0, :, col:col + 1]
        if s >= SLICE_MIN_GAP:
            pieces = []
            for base in range(0, rows, 2 * s):
                a = x[base:base + s]
                b = x[base + s:base + 2 * s]
                u = u32.csub32(a + b, q2)                      # [0, 2q)
                v = u32.mul_mod_shoup32(
                    a + q2 - b, wv[base + s:base + 2 * s],
                    ws[base + s:base + 2 * s], q, lazy=True)   # [0, 2q)
                pieces += [u, v]
            x = jnp.concatenate(pieces, axis=0)
            continue
        row_id = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        is_a = (row_id & s) == 0
        b = _roll_up(x, s)
        u = u32.csub32(x + b, q2)
        t = _roll_down(x, s) + q2 - x
        v = u32.mul_mod_shoup32(t, wv, ws, q, lazy=True)
        x = jnp.where(is_a, u, v)
    return x


def _fwd_body32(x, q, q2, s1, s2, tw, log_n1, n1):
    x = _dit_stages32(x, s1[0], s1[1], log_n1, n1, N2, q, q2, n1 >> 1)
    x = x.T
    x = u32.mul_mod_shoup32(x, tw[0][0], tw[1][0], q, lazy=True)
    x = _dit_stages32(x, s2[0], s2[1], LOG_N2, N2, n1, q, q2, N2 >> 1)
    return u32.csub32(u32.csub32(x, q2), q)  # [0, q), transposed layout


def _fwd_kernel32(lm_ref, q_ref, xref, s1v, s1s, s2v, s2s, twv, tws, oref,
                  *, log_n1: int, n1: int):
    l = pl.program_id(0)
    q = q_ref[l]
    x = _fwd_body32(xref[0, 0], q, q + q, (s1v, s1s), (s2v, s2s), (twv, tws),
                    log_n1, n1)
    oref[0, 0] = x.T


def _fwd_sub_scale_kernel32(lm_ref, q_ref, pv_ref, ps_ref, ev_ref, es_ref,
                            xref, subref, s1v, s1s, s2v, s2s, twv, tws, oref,
                            *, log_n1: int, n1: int, has_pre: bool):
    l = pl.program_id(0)
    q = q_ref[l]
    x = _fwd_body32(xref[0, 0], q, q + q, (s1v, s1s), (s2v, s2s), (twv, tws),
                    log_n1, n1).T
    if has_pre:
        x = u32.mul_mod_shoup32(x, ev_ref[l], es_ref[l], q)
    d = u32.csub32(subref[0, 0] + q - x, q)
    oref[0, 0] = u32.mul_mod_shoup32(d, pv_ref[l], ps_ref[l], q)


def _inv_kernel32(lm_ref, q_ref, sv_ref, ss_ref, xref,
                  s1v, s1s, s2v, s2s, twv, tws, oref,
                  *, log_n1: int, n1: int):
    l = pl.program_id(0)
    q = q_ref[l]
    q2 = q + q
    x = xref[0, 0].T
    x = _gs_stages32(x, s2v, s2s, LOG_N2, N2, n1, q, q2, 1)
    x = u32.mul_mod_shoup32(x, twv[0], tws[0], q, lazy=True)
    x = x.T
    x = _gs_stages32(x, s1v, s1s, log_n1, n1, N2, q, q2, 1)
    oref[0, 0] = u32.mul_mod_shoup32(x, sv_ref[l], ss_ref[l], q)


def _call32(x, plan: NTTPlan32, limb_map, forward: bool, scale2=None,
            sub=None, post2=None, pre2=None):
    """q32 kernels over x.lo; hi planes are statically zero ([0, q), q<2^30).

    Without sub: plain forward/inverse transform.  With sub (forward only):
    the fused (sub - pre*NTT(x)) * post landing, post2/pre2 = (val, shoup32)
    per-limb u32 pairs."""
    from .w64 import W64

    n = plan.n
    n1 = plan.n1
    log_n1 = n1.bit_length() - 1
    lead = x.shape[:-2]
    Lc = x.shape[-2]
    b = int(np.prod(lead)) if lead else 1
    xlo = x.lo.reshape(b, Lc, n1, N2)

    lm = limb_map.astype(jnp.int32)
    q32 = jnp.take(plan.q32, lm)
    scalars = [lm, q32]
    data_refs = [xlo]
    if sub is not None:
        if pre2 is None:
            has_pre = False
            pre2 = post2
        else:
            has_pre = True
        scalars += [*post2, *pre2]
        data_refs.append(sub.lo.reshape(b, Lc, n1, N2))
        tw = plan.fw_s1 + plan.fw_s2 + plan.fw_tw
        kernel = partial(_fwd_sub_scale_kernel32, log_n1=log_n1, n1=n1,
                         has_pre=has_pre)
    elif forward:
        tw = plan.fw_s1 + plan.fw_s2 + plan.fw_tw
        kernel = partial(_fwd_kernel32, log_n1=log_n1, n1=n1)
    else:
        if scale2 is None:
            scale2 = (jnp.take(plan.invn, lm), jnp.take(plan.invn_s, lm))
        scalars += list(scale2)
        tw = plan.iv_s1 + plan.iv_s2 + plan.iv_tw
        kernel = partial(_inv_kernel32, log_n1=log_n1, n1=n1)

    zero = np.int32(0)

    def data_map(l, bb, *_):
        return (bb, l, zero, zero)

    def tw_map(l, bb, lm_ref, *_):
        return (lm_ref[l], zero, zero)

    data_spec = pl.BlockSpec((1, 1, n1, N2), data_map, memory_space=pltpu.VMEM)
    s1_spec = pl.BlockSpec((1, n1, log_n1), tw_map, memory_space=pltpu.VMEM)
    s2_spec = pl.BlockSpec((1, N2, LOG_N2), tw_map, memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((1, N2, n1), tw_map, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(Lc, b),
        in_specs=[data_spec] * len(data_refs)
                 + [s1_spec] * 2 + [s2_spec] * 2 + [tw_spec] * 2,
        out_specs=data_spec,
    )
    olo = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, Lc, n1, N2), jnp.uint32),
        interpret=_interpret(),
    )(*scalars, *data_refs, *tw)
    shape = lead + (Lc, n)
    olo = olo.reshape(shape)
    return W64(olo, None)  # compact: q32 residues < 2^30


def host_scale_pair32(scale, q) -> tuple:
    """(value, shoup32) device u32 pairs from host per-limb u64 scales."""
    q = np.asarray(q, dtype=np.uint64).reshape(-1)
    s = np.asarray(scale, dtype=np.uint64).reshape(-1).astype(np.uint32)
    shoup = np.array(
        [_shoup32_host(s[i:i + 1], int(q[i]))[0] for i in range(len(q))],
        dtype=np.uint32,
    )
    return jnp.asarray(s), jnp.asarray(shoup)


def forward_ntt_sub_scale_pallas32(x, sub, tables, post2, pre2=None):
    """q32 fused (sub - pre*NTT(x)) * post; pairs from host_scale_pair32."""
    return _call32(x, tables.plan, tables.limb_map, forward=True,
                   sub=sub, post2=post2, pre2=pre2)
