"""Fused RNS base-conversion matmul as a Pallas TPU kernel.

TPU-native counterpart of the reference's bconv_matmul kernels
(/root/reference/src/rns_bconv.cu:107-166): for each output limb p_j,
accumulate sum_i s[i] * qhat_mod_p[j, i] in an explicit 128-bit (four
uint32 plane) accumulator and land one Barrett reduction.

Same motivation as ops/ks_pallas.py: the XLA W64 version materializes the
128-bit accumulator chain between fusions (measured ~2.5x above compute
bound at the keyswitch bench shape); here the whole (i, j) double loop
runs in VMEM per (batch, row-block), with the small scalar table in SMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import u32pair as u32
from .ks_pallas import _add128

LANES = 128
MAX_ROW_BLOCK = 32   # (k_in + k_out) * Rb * 128 * 8B stays well under VMEM


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


N_ACC = 4  # independent 128-bit accumulators (break the carry-chain
           # dependency between consecutive terms; combined once per output)


def _kernel(mlo_ref, mhi_ref, qlo_ref, qhi_ref,
            r0lo_ref, r0hi_ref, r1lo_ref, r1hi_ref,
            xlo_ref, xhi_ref, olo_ref, ohi_ref,
            *, k_in: int, k_out: int):
    xs = [(xlo_ref[0, i], xhi_ref[0, i]) for i in range(k_in)]
    for j in range(k_out):
        accs = [None] * N_ACC
        for i in range(k_in):
            sl, sh = xs[i]
            prod = u32.mul64_full(sl, sh, mlo_ref[j * k_in + i],
                                  mhi_ref[j * k_in + i])
            a = i % N_ACC
            accs[a] = prod if accs[a] is None else _add128(accs[a], prod)
        acc = accs[0]
        for a in accs[1:]:
            if a is not None:
                acc = _add128(acc, a)
        w0, w1, w2, w3 = acc
        rlo, rhi = u32.barrett_reduce128(
            w0, w1, w2, w3, qlo_ref[j], qhi_ref[j],
            r0lo_ref[j], r0hi_ref[j], r1lo_ref[j], r1hi_ref[j],
        )
        olo_ref[0, j] = rlo
        ohi_ref[0, j] = rhi


def _words(v) -> tuple[jnp.ndarray, jnp.ndarray]:
    v = np.asarray(v, dtype=np.uint64).reshape(-1)
    return (
        jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((v >> np.uint64(32)).astype(np.uint32)),
    )


def bconv_matmul_pallas(scaled, qhat_mod_p, p, p_rlo, p_rhi):
    """scaled: W64 (..., k_in, N); qhat_mod_p: (k_out, k_in) u64 host table;
    p/p_rlo/p_rhi: (k_out, 1).  Returns W64 (..., k_out, N)."""
    from .w64 import W64

    lead = scaled.shape[:-2]
    k_in = scaled.shape[-2]
    n = scaled.shape[-1]
    k_out = np.asarray(qhat_mod_p).shape[0]
    b = int(np.prod(lead)) if lead else 1
    rows = n // LANES
    rb = rows
    while rb > MAX_ROW_BLOCK or rows % rb or rb % 8:
        rb -= 1

    xlo = scaled.lo.reshape(b, k_in, rows, LANES)
    xhi = scaled.hi.reshape(b, k_in, rows, LANES)

    mlo, mhi = _words(np.asarray(qhat_mod_p, dtype=np.uint64))
    qlo, qhi = _words(p)
    r0lo, r0hi = _words(p_rlo)
    r1lo, r1hi = _words(p_rhi)
    scalars = [mlo, mhi, qlo, qhi, r0lo, r0hi, r1lo, r1hi]

    zero = np.int32(0)

    def in_map(bb, rblk, *_):
        return (bb, zero, rblk, zero)

    in_spec = pl.BlockSpec((1, k_in, rb, LANES), in_map, memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, k_out, rb, LANES), in_map, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(b, rows // rb),
        in_specs=[in_spec, in_spec],
        out_specs=[out_spec, out_spec],
    )
    out_shape = [jax.ShapeDtypeStruct((b, k_out, rows, LANES), jnp.uint32)] * 2
    olo, ohi = pl.pallas_call(
        partial(_kernel, k_in=k_in, k_out=k_out),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*scalars, xlo, xhi)
    shape = lead + (k_out, n)
    return W64(olo.reshape(shape), ohi.reshape(shape))
