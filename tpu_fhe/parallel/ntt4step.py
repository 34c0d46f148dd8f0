"""Coefficient-sharded negacyclic NTT: the distributed ring-dimension path.

The reference's single-GPU 2D NTT (src/ntt/fntt_2d.cu: phase1 stride-N1
column pass + phase2 row pass) factorizes the transform exactly where a
device mesh wants to cut it (SURVEY.md sections 2.3/5.7): viewing the
degree-N polynomial as an N1 x N2 matrix,

  phase 1 (stages m < N1)  pairs elements ACROSS rows, with twiddles that
      depend only on the row block  ->  local when COLUMNS are sharded;
  phase 2 (stages m >= N1) pairs elements WITHIN rows, with twiddles that
      depend on (row, block)        ->  local when ROWS are sharded;

so one resharding between the phases — an all-to-all over the `coeff` mesh
axis, inserted by GSPMD from sharding constraints — distributes the whole
transform.  The stage math is the same Harvey loop as ops/ntt.py (same
bit-reversed twiddle tables, same lazy Shoup butterflies), so outputs are
bit-identical to the single-chip transform.

Forward: input columns-sharded, output rows-sharded.  Inverse consumes the
rows-sharded output and returns columns-sharded — a forward/inverse pair
costs exactly two all-to-alls.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import w64
from ..ops.ntt import DeviceNTTTables
from ..ops.w64 import W64


def _constrain(x: W64, mesh: Mesh, spec: P) -> W64:
    sh = NamedSharding(mesh, spec)
    return W64(
        jax.lax.with_sharding_constraint(x.lo, sh),
        jax.lax.with_sharding_constraint(x.hi, sh),
    )


def _split_n(n: int, n1: int | None) -> tuple[int, int]:
    if n1 is None:
        log_n = n.bit_length() - 1
        n1 = 1 << (log_n // 2)
    n2 = n // n1
    if n1 * n2 != n or n1 < 2 or n2 < 2:
        raise ValueError(f"invalid N1 x N2 split {n1} x {n2} for N={n}")
    return n1, n2


COLS = P(None, None, "coeff")   # (L, N1, N2): shard the column axis
ROWS = P(None, "coeff", None)   # (L, N1, N2): shard the row axis


def forward_ntt_4step(
    x: W64, t: DeviceNTTTables, mesh: Mesh, n1: int | None = None
) -> W64:
    """(L, N) [0,q) -> NTT form, bit-identical to ops.ntt.forward_ntt.

    Returns (L, N) flat; internally columns-sharded for phase 1 and
    rows-sharded for phase 2 (output remains rows-sharded as (L, N1*N2))."""
    n = t.n
    n1, n2 = _split_n(n, n1)
    L = x.shape[-2]
    lead = x.shape[:-2]
    roots = np.asarray(t.roots)
    roots_shoup = np.asarray(t.roots_shoup)
    q = np.asarray(t.q)  # (L, 1)

    x3 = x.reshape(lead + (L, n1, n2))
    x3 = _constrain(x3, mesh, COLS)

    def butterfly(a, b, wv, wsv, qb):
        v = w64.mul_mod_shoup_lazy(b, wv, wsv, qb)
        v = w64.csub(v, qb)
        return w64.add_mod(a, v, qb), w64.sub_mod(a, v, qb)

    # phase 1: column stages m = 1 .. n1/2 (pairs across rows)
    m = 1
    while m < n1:
        ttr = n1 // (2 * m)  # row gap
        xr = x3.reshape(lead + (L, m, 2, ttr, n2))
        wv = roots[:, m:2 * m].reshape(L, m, 1, 1)
        wsv = roots_shoup[:, m:2 * m].reshape(L, m, 1, 1)
        qb = q.reshape(L, 1, 1, 1)
        a, b = xr[..., 0, :, :], xr[..., 1, :, :]
        a2, b2 = butterfly(a, b, w64.as_w64(wv), w64.as_w64(wsv), qb)
        x3 = w64.stack([a2, b2], axis=-3).reshape(lead + (L, n1, n2))
        x3 = _constrain(x3, mesh, COLS)
        m <<= 1

    # the transpose: GSPMD lowers this resharding to an all-to-all over ICI
    x3 = _constrain(x3, mesh, ROWS)

    # phase 2: row stages m = n1 .. n/2 (pairs within rows)
    while m < n:
        m2 = m // n1
        tt = n2 // (2 * m2)
        xr = x3.reshape(lead + (L, n1, m2, 2, tt))
        wv = roots[:, m:2 * m].reshape(L, n1, m2, 1)
        wsv = roots_shoup[:, m:2 * m].reshape(L, n1, m2, 1)
        qb = q.reshape(L, 1, 1, 1)
        a, b = xr[..., 0, :], xr[..., 1, :]
        a2, b2 = butterfly(a, b, w64.as_w64(wv), w64.as_w64(wsv), qb)
        x3 = w64.stack([a2, b2], axis=-2).reshape(lead + (L, n1, n2))
        x3 = _constrain(x3, mesh, ROWS)
        m <<= 1

    return x3.reshape(lead + (L, n))


def inverse_ntt_4step(
    x: W64, t: DeviceNTTTables, mesh: Mesh, n1: int | None = None
) -> W64:
    """Inverse of forward_ntt_4step (includes the 1/n scale); consumes the
    rows-sharded layout and returns columns-sharded."""
    n = t.n
    n1, n2 = _split_n(n, n1)
    L = x.shape[-2]
    lead = x.shape[:-2]
    inv_roots = np.asarray(t.inv_roots)
    inv_roots_shoup = np.asarray(t.inv_roots_shoup)
    q = np.asarray(t.q)

    x3 = x.reshape(lead + (L, n1, n2))
    x3 = _constrain(x3, mesh, ROWS)

    # row stages first: h = n/2 .. n1 (tt = 1 .. n2/2)
    m = n
    tt = 1
    while m > n1:
        h = m >> 1
        h2 = h // n1
        xr = x3.reshape(lead + (L, n1, h2, 2, tt))
        wv = inv_roots[:, h:m].reshape(L, n1, h2, 1)
        wsv = inv_roots_shoup[:, h:m].reshape(L, n1, h2, 1)
        qb = q.reshape(L, 1, 1, 1)
        a, b = xr[..., 0, :], xr[..., 1, :]
        u = w64.add_mod(a, b, qb)
        d = w64.sub_mod(a, b, qb)
        v = w64.mul_mod_shoup(d, w64.as_w64(wv), w64.as_w64(wsv), qb)
        x3 = w64.stack([u, v], axis=-2).reshape(lead + (L, n1, n2))
        x3 = _constrain(x3, mesh, ROWS)
        tt <<= 1
        m = h

    # the transpose back (all-to-all)
    x3 = _constrain(x3, mesh, COLS)

    # column stages: h = n1/2 .. 1
    while m > 1:
        h = m >> 1
        ttr = n1 // m  # = n1 / (2h)
        xr = x3.reshape(lead + (L, h, 2, ttr, n2))
        wv = inv_roots[:, h:m].reshape(L, h, 1, 1)
        wsv = inv_roots_shoup[:, h:m].reshape(L, h, 1, 1)
        qb = q.reshape(L, 1, 1, 1)
        a, b = xr[..., 0, :, :], xr[..., 1, :, :]
        u = w64.add_mod(a, b, qb)
        d = w64.sub_mod(a, b, qb)
        v = w64.mul_mod_shoup(d, w64.as_w64(wv), w64.as_w64(wsv), qb)
        x3 = w64.stack([u, v], axis=-3).reshape(lead + (L, n1, n2))
        x3 = _constrain(x3, mesh, COLS)
        m = h

    out = x3.reshape(lead + (L, n))
    inv_n = np.asarray(t.inv_degree)
    inv_n_shoup = np.asarray(t.inv_degree_shoup)
    return w64.mul_mod_shoup(
        out, w64.as_w64(inv_n), w64.as_w64(inv_n_shoup), q
    )
