"""Gather-free NTT-domain automorphism via its bit-reversed affine form.

The NTT ordering of ops/ntt.py places f(psi^(2*br(i)+1)) at index i, so
sigma_elt acts as new[i] = old[perm[i]] with (verified identity)

    perm[i] = br( (elt * br(i) + (elt-1)/2) mod N ).

In bit-reversed index space the map is AFFINE: u -> elt*u + c (mod N).
Splitting u = u1*B + u2 (A = 2^a rows, B = 2^b lanes):

    source column  sigma2(u2) = (elt*u2 + c) mod B        (lanes only)
    source row     (elt*u1 + k(u2)) mod A,  k = carry     (per-column)

so the whole permutation decomposes into reshapes/transposes, two FIXED
row gathers (sublane axis — cheap), two fixed lane permutations, and a
per-column circular row shift applied as log2(A) masked rolls.  The lane
permutations can run either as small takes ('decomp') or as exact one-hot
int8 matmuls on the MXU ('decomp_mm') — a u32 value's four byte planes
pass through a permutation matmul unchanged.

This exists because XLA:TPU lowers the one-shot 65536-wide lane gather of
ops/galois.apply_galois_ntt opaquely; benchmarks/boot_micro.py A/Bs the
three implementations (the reference's counterpart is a CUDA gather,
src/galois.cu:104-120, which is cheap on GPU but not necessarily on TPU).
Select with TPU_FHE_GALOIS_IMPL = gather | decomp | decomp_mm.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..core import numth


@lru_cache(maxsize=None)
def _plan(n: int, elt: int):
    """Host index plan: (a, b, row1, lane1, roll_bits, row2, lane2).

    chain: x.reshape(2^b, 2^a).T -> [row gather row1] -> [lane perm lane1]
           -> masked rolls by roll_bits -> reshape(2^b, 2^a).T
           -> [row gather row2] -> [lane perm lane2] -> flat
    """
    k = n.bit_length() - 1
    a = k // 2
    b = k - a
    A, B = 1 << a, 1 << b
    c = (elt - 1) // 2

    rev_a = numth.bit_reverse_perm(a) if a else np.zeros(1, dtype=np.int64)
    rev_b = numth.bit_reverse_perm(b)

    # G_phi pieces
    u2 = np.arange(B, dtype=np.int64)
    s2 = (elt * u2 + c) % B                       # lane source sigma2
    kcar = ((elt * u2 + c) // B) % A              # row carry per column
    u1 = np.arange(A, dtype=np.int64)
    rho = (elt * u1) % A                          # fixed row stride map
    inv = pow(elt, -1, A) if A > 1 else 0
    roll = (inv * kcar) % A                       # per-column row shift

    # middle-segment composition (no roll between them):
    #   rows:  rev_a then rho      -> row1 = rev_a[rho]  (w=v[p]; z=w[q])
    #   lanes: rev_b then sigma2   -> lane1 = rev_b[s2]
    row1 = rev_a[rho]
    lane1 = rev_b[s2]
    # the per-column roll amount indexes the FINAL column u2 (post-perm)
    row2 = rev_a
    lane2 = rev_b
    return (a, b, np.asarray(row1), np.asarray(lane1), np.asarray(roll),
            np.asarray(row2), np.asarray(lane2))


@lru_cache(maxsize=None)
def _perm_mats(n: int, elt: int):
    """One-hot int8 lane-permutation matrices P with (x @ P)[j] = x[src[j]]."""
    a, b, row1, lane1, roll, row2, lane2 = _plan(n, elt)
    B = 1 << b

    def mat(src):
        p = np.zeros((B, B), dtype=np.int8)
        p[src, np.arange(B)] = 1
        return p

    return mat(lane1), mat(lane2)


def _lane_take(x, idx):
    return x[..., jnp.asarray(idx)]


def _lane_mm(x, pmat):
    """Exact u32 lane permutation via four int8 byte-plane matmuls."""
    shape = x.shape
    B = shape[-1]
    flat = x.reshape(-1, B)
    out = None
    for kk in range(4):
        plane = ((flat >> np.uint32(8 * kk)) & np.uint32(0xFF)).astype(jnp.int8)
        d = jax.lax.dot_general(
            plane, pmat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        word = (d & jnp.int32(0xFF)).astype(jnp.uint32) << np.uint32(8 * kk)
        out = word if out is None else out | word
    return out.reshape(shape)


def apply_galois_ntt_decomp(x_u32, elt: int, n: int, use_mm: bool):
    """Plain u32 plane(s) (..., N) -> automorphism applied, no lane gather."""
    a, b, row1, lane1, roll, row2, lane2 = _plan(n, elt)
    A, B = 1 << a, 1 << b
    lead = x_u32.shape[:-1]

    # G_R (to br-space, fused with G_phi's fixed maps)
    v = x_u32.reshape(lead + (B, A))
    v = jnp.swapaxes(v, -1, -2)                   # (A, B)
    if A > 1:
        v = v[..., jnp.asarray(row1), :]
    if use_mm:
        p1, p2 = _perm_mats(n, elt)
        v = _lane_mm(v, jnp.asarray(p1))
    else:
        v = _lane_take(v, lane1)

    # per-column circular row shift: y[u1, :] = v[(u1 + roll) mod A, :]
    if A > 1:
        rbits = jnp.asarray(roll)
        for t in range(a):
            mask = ((rbits >> t) & 1).astype(bool)[None, :]
            v = jnp.where(mask, jnp.roll(v, -(1 << t), axis=-2), v)

    # final G_R back from br-space
    v = v.reshape(lead + (B, A))
    v = jnp.swapaxes(v, -1, -2)
    if A > 1:
        v = v[..., jnp.asarray(row2), :]
    if use_mm:
        v = _lane_mm(v, jnp.asarray(p2))
    else:
        v = _lane_take(v, lane2)
    return v.reshape(lead + (A * B,))
