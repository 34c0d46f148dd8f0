"""RNS base-conversion matmul on the MXU via balanced int8 digit planes.

The base-conversion inner loop (reference bconv_matmul kernels,
/root/reference/src/rns_bconv.cu:107-166) is a modular matmul
``out[p, n] = sum_k M[p, k] * x[k, n] mod q_p`` with a HOST-KNOWN matrix M
and a small contraction dim (k_in <= ~60).  The VPU formulations
(ops/bconv.py in XLA, ops/bconv_pallas.py) are compute-bound on emulated
64-bit multiplies (~900 u32 ops per output element at k_in=15).

This module moves the multiplies to the MXU (the systolic array — the only
unit on a TPU with real integer-multiply throughput) while keeping the
arithmetic EXACT:

  * both operands are decomposed into balanced base-256 digits d_i in
    [-128, 127] (8 planes each for values < 2^61: the top byte is < 2^5,
    so balancing never carries into a 9th digit);
  * one s8 x s8 -> s32 ``dot_general`` computes every diagonal sum
      D_s[p, n] = sum_{i+j=s} sum_k Mdig_i[p, k] * xdig_j[k, n]
    exactly (|product| <= 2^14, K = 8*k_in <= 512 terms -> |D_s| < 2^23,
    far inside s32).  The 15 diagonals are stacked into the OUTPUT rows
    (M-dim = 15*k_out) and the digit planes into the contraction
    (K = 8*k_in), so a single matmul with good MXU utilisation does all
    the multiply work;
  * the 128-bit value sum_s D_s * 2^(8s) is reassembled with WRAPPING
    two's-complement u32-pair arithmetic (exact: the true row sum is
    < k_in * 2^122 < 2^128 for k_in < 64, and mod-2^128 arithmetic is a
    ring hom, so intermediate wraps cancel), then landed with the same
    two-word Barrett reduction the other paths use.

Per output element the VPU work drops to ~200 u32 ops (reassembly +
Barrett) from ~900; the multiplies ride the MXU at int8 rate.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from . import w64
from .w64 import W64

N_PLANES = 8          # balanced base-256 digits of a < 2^61 value
N_DIAG = 2 * N_PLANES - 1   # s = i + j diagonals


def _balanced_digits_host(m: np.ndarray) -> np.ndarray:
    """(..., ) u64 < 2^61  ->  (N_PLANES, ...) int8 balanced base-256."""
    v = np.asarray(m, dtype=np.uint64)
    digits = np.empty((N_PLANES,) + v.shape, dtype=np.int8)
    carry = np.zeros(v.shape, dtype=np.int64)
    for i in range(N_PLANES):
        b = ((v >> np.uint64(8 * i)) & np.uint64(0xFF)).astype(np.int64) + carry
        carry = (b >= 128).astype(np.int64)
        digits[i] = (b - (carry << 8)).astype(np.int8)
    if carry.any():
        raise ValueError("matrix entries must be < 2^61 for 8 balanced digits")
    return digits


def _balanced_digits_dev(x: W64) -> jnp.ndarray:
    """W64 (..., ) with values < 2^61  ->  (N_PLANES, ...) int8 (device)."""
    planes = []
    carry = jnp.zeros(x.shape, dtype=jnp.int32)
    for i in range(N_PLANES):
        word = x.lo if i < 4 else x.hi
        b = ((word >> np.uint32(8 * (i % 4))) & np.uint32(0xFF)).astype(jnp.int32)
        b = b + carry
        carry = (b >= 128).astype(jnp.int32)
        planes.append((b - (carry << 8)).astype(jnp.int8))
    return jnp.stack(planes)


@lru_cache(maxsize=None)
def _diag_matrix_cached(m_bytes: bytes, k_out: int, k_in: int) -> np.ndarray:
    """Host A_big[(s, p), (k, j)] = Mdig_{s-j}[p, k]  (int8)."""
    m = np.frombuffer(m_bytes, dtype=np.uint64).reshape(k_out, k_in)
    mdig = _balanced_digits_host(m)               # (8, k_out, k_in)
    a = np.zeros((N_DIAG, k_out, k_in, N_PLANES), dtype=np.int8)
    for s in range(N_DIAG):
        for j in range(N_PLANES):
            i = s - j
            if 0 <= i < N_PLANES:
                a[s, :, :, j] = mdig[i]
    return a.reshape(N_DIAG * k_out, k_in * N_PLANES)


def _shl64(lo, hi, k: int):
    """Wrapping left shift of a (lo, hi) u32 pair by k in [0, 32)."""
    if k == 0:
        return lo, hi
    return lo << k, (hi << k) | (lo >> (32 - k))


def _sext_shift(d: jnp.ndarray, r: int):
    """Sign-extend s32 d to a 64-bit (lo, hi) u32 pair, shifted left 8*r."""
    lo = d.astype(jnp.uint32)
    hi = (d >> 31).astype(jnp.uint32)   # arithmetic shift: 0 or 0xFFFFFFFF
    return _shl64(lo, hi, 8 * r)


def _add64w(alo, ahi, blo, bhi):
    lo = alo + blo
    hi = ahi + bhi + (lo < alo).astype(jnp.uint32)
    return lo, hi


def _reassemble_u128(diags: jnp.ndarray) -> tuple[W64, W64]:
    """(N_DIAG, ..., N) s32 diagonals -> (hi, lo) W64 of
    sum_s diags[s] << (8 s)  (mod 2^128, exact for true values < 2^128)."""
    # group four consecutive s into one signed 64-bit word-aligned term
    groups = []
    for w in range((N_DIAG + 3) // 4):
        glo = ghi = None
        for r in range(4):
            s = 4 * w + r
            if s >= N_DIAG:
                break
            tlo, thi = _sext_shift(diags[s], r)
            if glo is None:
                glo, ghi = tlo, thi
            else:
                glo, ghi = _add64w(glo, ghi, tlo, thi)
        groups.append((glo, ghi))
    # accumulate G_w << (32 w) into four wrapping u32 words
    w0 = w1 = w2 = w3 = None
    for w, (glo, ghi) in enumerate(groups):
        sext = (ghi.astype(jnp.int32) >> 31).astype(jnp.uint32)
        words = [jnp.zeros_like(glo)] * w + [glo, ghi, sext, sext]
        words = words[:4]
        while len(words) < 4:
            words.append(sext)
        if w0 is None:
            w0, w1, w2, w3 = words
        else:
            w0b = w0 + words[0]
            c0 = (w0b < w0).astype(jnp.uint32)
            w1b = w1 + words[1]
            c1 = (w1b < w1).astype(jnp.uint32)
            w1c = w1b + c0
            c1 += (w1c < w1b).astype(jnp.uint32)
            w2b = w2 + words[2]
            c2 = (w2b < w2).astype(jnp.uint32)
            w2c = w2b + c1
            c2 += (w2c < w2b).astype(jnp.uint32)
            w3b = w3 + words[3] + c2
            w0, w1, w2, w3 = w0b, w1c, w2c, w3b
    return W64(w2, w3), W64(w0, w1)


def bconv_matmul_mxu(scaled: W64, qhat_mod_p, p, p_rlo, p_rhi) -> W64:
    """Drop-in for ops.bconv.bconv_matmul: scaled (..., k_in, N) W64 with
    values < 2^61; qhat_mod_p (k_out, k_in) host u64; p/p_rlo/p_rhi
    (k_out, 1) Barrett constants.  Returns (..., k_out, N) W64 in [0, p)."""
    m = np.ascontiguousarray(np.asarray(qhat_mod_p, dtype=np.uint64))
    k_out, k_in = m.shape
    if k_in >= 64:
        raise ValueError("k_in must be < 64 for the 128-bit row-sum bound")
    lead = scaled.shape[:-2]
    n = scaled.shape[-1]
    a_big = _diag_matrix_cached(m.tobytes(), k_out, k_in)

    xdig = _balanced_digits_dev(scaled)            # (8, ..., k_in, N)
    # -> (..., k_in * 8, N)
    perm = tuple(range(1, 1 + len(lead))) + (1 + len(lead), 0, 2 + len(lead))
    xblk = jnp.transpose(xdig, perm).reshape(lead + (k_in * N_PLANES, n))

    d = jax.lax.dot_general(
        jnp.asarray(a_big), xblk,
        dimension_numbers=(((1,), (len(lead),)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (N_DIAG * k_out, *lead, N)
    d = d.reshape((N_DIAG, k_out) + lead + (n,))
    if lead:
        perm2 = (0,) + tuple(range(2, 2 + len(lead))) + (1, 2 + len(lead))
        d = jnp.transpose(d, perm2)                # (N_DIAG, ..., k_out, N)

    hi, lo = _reassemble_u128(d)
    return w64.barrett_reduce_u128(hi, lo, p, p_rlo, p_rhi)
