"""Negacyclic NTT / inverse NTT over RNS limbs (jnp, fully vectorized).

TPU-first design: each radix-2 stage is a reshape + broadcast butterfly over
the whole (L, N) limb plane — no gathers, no data-dependent control flow, so
XLA fuses each stage into one vector pass.  The stage structure (Harvey
iteration with bit-reversed twiddles, lazy Shoup multiplication) matches the
reference's 1D/2D kernels semantically (src/ntt/*.cu) while the N1xN2
phase decomposition lives in the Pallas kernel and the sharded (multi-chip)
path in tpu_fhe.parallel.

All transforms are exact: tested bit-identical per limb against the Python
golden NTT (core/ntt_tables.golden_forward_ntt).

Twiddle table layout per limb (shape (L, N) each):
  roots[l, m + i]      = psi_l^{reverse_bits(m+i)}  (SEAL layout)
  roots_shoup[l, ...]  = floor(roots * 2^64 / q_l)
The same bit-reversed layout means stage m consumes the contiguous slice
[m, 2m) — no reordering needed on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.ntt_tables import NTTTables, compute_shoup
from . import modmath as mm


class _LazyRows:
    """Deferred numpy row-slice of a big host table.

    slice_limbs on every chain level / keyswitch digit would copy gigabytes
    of twiddle tables that the Pallas path never reads (it uses the shared
    NTTPlan + limb_map).  This wrapper materializes (and caches) the slice
    only when the CPU fallback actually touches it; numpy/jax consume it
    transparently through __array__."""

    __slots__ = ("_parent", "_idx", "_mat")

    def __init__(self, parent, idx):
        self._parent = parent
        self._idx = np.asarray(idx)
        self._mat = None

    @property
    def shape(self):
        return (len(self._idx),) + tuple(self._parent.shape[1:])

    @property
    def ndim(self):
        return len(self.shape)

    @property
    def dtype(self):
        return self._parent.dtype

    def _m(self) -> np.ndarray:
        if self._mat is None:
            self._mat = np.asarray(self._parent)[self._idx]
        return self._mat

    def __array__(self, dtype=None, copy=None):
        a = self._m()
        return np.asarray(a, dtype) if dtype is not None else a

    def __getitem__(self, k):
        return self._m()[k]

    def reshape(self, *s):
        return self._m().reshape(*s)

    @staticmethod
    def make(parent, idx):
        if isinstance(parent, _LazyRows):
            return _LazyRows(parent._parent, parent._idx[np.asarray(idx)])
        return _LazyRows(parent, idx)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DeviceNTTTables:
    """Per-limb twiddle tables resident on device.

    All arrays have leading limb axis L; data polys are (..., L, N).

    `plan` is the fused Pallas kernel's twiddle plan (ops/ntt_pallas.NTTPlan)
    built once at the KEY level and shared by every chain level; `limb_map`
    maps this table's limb axis into the plan's key-level limb axis, so
    slice_limbs/concat never duplicate twiddle storage.
    """

    q: jnp.ndarray            # (L, 1) uint64 modulus values
    ratio_lo: jnp.ndarray     # (L, 1) Barrett floor(2^128/q) low word
    ratio_hi: jnp.ndarray     # (L, 1) Barrett high word
    roots: jnp.ndarray        # (L, N) forward twiddles, bit-reversed order
    roots_shoup: jnp.ndarray  # (L, N)
    inv_roots: jnp.ndarray    # (L, N) inverse twiddles, bit-reversed order
    inv_roots_shoup: jnp.ndarray
    inv_degree: jnp.ndarray   # (L, 1) n^{-1} mod q
    inv_degree_shoup: jnp.ndarray
    plan: "object | None" = None        # NTTPlan pytree or None
    limb_map: jnp.ndarray | None = None  # (L,) int32 indices into plan limbs

    def tree_flatten(self):
        children = (
            self.q, self.ratio_lo, self.ratio_hi, self.roots, self.roots_shoup,
            self.inv_roots, self.inv_roots_shoup, self.inv_degree,
            self.inv_degree_shoup, self.plan, self.limb_map,
        )
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n(self) -> int:
        return self.roots.shape[-1]

    @property
    def num_limbs(self) -> int:
        return self.roots.shape[0]

    @staticmethod
    def concat(a: "DeviceNTTTables", b: "DeviceNTTTables") -> "DeviceNTTTables":
        from ..utils.device import host_np

        flat_a = a.tree_flatten()[0][:9]
        flat_b = b.tree_flatten()[0][:9]
        # host mirrors: the flats include the (L, N) twiddle planes, and a
        # naive np.asarray on a tunneled TPU array is a multi-MB D2H RPC
        merged = [
            np.concatenate([host_np(x), host_np(y)], axis=0)
            for x, y in zip(flat_a, flat_b)
        ]
        # both sides must be views of the same key-level plan
        plan = a.plan if a.plan is not None else b.plan
        lm = None
        if a.limb_map is not None and b.limb_map is not None:
            lm = np.concatenate([a.limb_map, b.limb_map])
        return DeviceNTTTables(*merged, plan=plan, limb_map=lm)

    def to_device(self) -> "DeviceNTTTables":
        """One batched H2D transfer of this table's plan + scalars (see
        utils/device.py); flat fallback twiddles stay host-side."""
        from ..utils.device import ship_to_device

        return ship_to_device([self])[0]

    def slice_limbs(self, indices: list[int]) -> "DeviceNTTTables":
        # host_np: scalar companions may live on device after
        # ship_to_device; np.asarray on a tunneled TPU array is a blocking
        # D2H RPC, and rescale_composite calls this on the bootstrap hot
        # path (host mirrors are recorded at ship time, so this is a pure
        # host operation)
        from ..utils.device import host_np

        idx = np.asarray(indices)
        return DeviceNTTTables(
            q=host_np(self.q)[idx],
            ratio_lo=host_np(self.ratio_lo)[idx],
            ratio_hi=host_np(self.ratio_hi)[idx],
            roots=_LazyRows.make(self.roots, idx),
            roots_shoup=_LazyRows.make(self.roots_shoup, idx),
            inv_roots=_LazyRows.make(self.inv_roots, idx),
            inv_roots_shoup=_LazyRows.make(self.inv_roots_shoup, idx),
            inv_degree=host_np(self.inv_degree)[idx],
            inv_degree_shoup=host_np(self.inv_degree_shoup)[idx],
            plan=self.plan,
            limb_map=None if self.limb_map is None else
            host_np(self.limb_map)[idx],
        )


def build_device_ntt_tables(tables: list[NTTTables]) -> DeviceNTTTables:
    """Pack host twiddle tables (one per RNS limb).

    Flat tables are kept as HOST numpy arrays: consumers close over them
    inside jit, so they become compile-time constants transferred once per
    compiled program — a context build enqueues no device work (the slow
    path on a tunneled TPU was hundreds of tiny H2D transfers)."""
    n = tables[0].n
    qs = [t.modulus.value for t in tables]

    def arr2(vals):
        return np.asarray(vals, dtype=np.uint64).reshape(len(tables), -1)

    from .ntt_pallas import (
        Q32_BOUND, _np_shoup, build_ntt_plan, build_ntt_plan32,
    )

    roots = np.array([t.root_powers for t in tables], dtype=np.uint64)
    inv_roots = np.array([t.inv_root_powers for t in tables], dtype=np.uint64)
    roots_shoup = np.stack(
        [_np_shoup(roots[i], t.modulus.value) for i, t in enumerate(tables)]
    )
    inv_roots_shoup = np.stack(
        [_np_shoup(inv_roots[i], t.modulus.value) for i, t in enumerate(tables)]
    )

    # all-moduli-under-2^30 contexts get the single-word kernel plan (the
    # TPU-native composite-scaling regime); otherwise the u32-pair plan
    if all(t.modulus.value < Q32_BOUND for t in tables):
        plan = build_ntt_plan32(tables)
    else:
        plan = build_ntt_plan(tables)
    return DeviceNTTTables(
        q=arr2([[q] for q in qs]),
        ratio_lo=arr2([[t.modulus.const_ratio[0]] for t in tables]),
        ratio_hi=arr2([[t.modulus.const_ratio[1]] for t in tables]),
        roots=roots,
        roots_shoup=roots_shoup,
        inv_roots=inv_roots,
        inv_roots_shoup=inv_roots_shoup,
        inv_degree=arr2([[t.inv_degree] for t in tables]),
        inv_degree_shoup=arr2(
            [[compute_shoup(t.inv_degree, t.modulus.value)] for t in tables]
        ),
        plan=plan,
        limb_map=None if plan is None else np.arange(len(tables), dtype=np.int32),
    )


def _pallas_ok(t: DeviceNTTTables) -> bool:
    from . import ntt_pallas

    return (
        t.plan is not None
        and t.limb_map is not None
        and ntt_pallas.pallas_enabled()
    )


def forward_ntt(x, t: DeviceNTTTables):
    """Forward negacyclic NTT over the last axis.

    x: (..., L, N) W64 (or uint64 array) in [0, q).  Returns the same type;
    ordering matches the golden transform (evaluation at psi^(2*br(i)+1)).
    """
    from .w64 import W64

    if isinstance(x, W64):
        if _pallas_ok(t):
            from .ntt_pallas import forward_ntt_pallas

            return forward_ntt_pallas(x, t)
        return W64.from_u64(forward_ntt(x.to_u64(), t))
    n = t.n
    log_n = n.bit_length() - 1
    lead = x.shape[:-1]  # (..., L)
    roots = np.asarray(t.roots)
    roots_shoup = np.asarray(t.roots_shoup)
    q = np.asarray(t.q).reshape((1,) * (len(lead) - 1) + (t.num_limbs, 1))
    two_q = q * 2

    m = 1
    tt = n
    while m < n:
        tt >>= 1
        # twiddles for this stage: slice [m, 2m) of bit-reversed table
        w = roots[:, m:2 * m]
        ws = roots_shoup[:, m:2 * m]
        w = w.reshape((1,) * (len(lead) - 1) + (t.num_limbs, m, 1, 1))
        ws = ws.reshape(w.shape)
        xr = x.reshape(lead + (m, 2, tt))
        a = xr[..., 0, :]
        b = xr[..., 1, :]
        qb = q.reshape((1,) * (len(lead) - 1) + (t.num_limbs, 1, 1))
        v = mm.mul_mod_shoup_lazy(b, w[..., 0, :], ws[..., 0, :], qb)  # [0,2q)
        v = mm.csub(v, qb)
        a_new = mm.add_mod(a, v, qb)
        b_new = mm.sub_mod(a, v, qb)
        x = jnp.stack([a_new, b_new], axis=-2).reshape(lead + (n,))
        m <<= 1
    return x


def inverse_ntt_scaled(x, t: DeviceNTTTables, scale, scale_shoup):
    """iNTT followed by a per-limb Shoup scale (scale: (L,1) host uint64).

    On the Pallas path the scale folds into the kernel's fused final
    multiply (the n^{-1} landing), saving one full elementwise pass —
    the TPU counterpart of the reference's nwt_2d_radix8_backward_scale
    fusion (src/ntt/ntt_modup.cu:222+).
    """
    from .w64 import W64

    if isinstance(x, W64) and _pallas_ok(t):
        from .ntt_pallas import (
            NTTPlan32, _np_shoup, _split_u32, host_scale_pair32,
            inverse_ntt_pallas,
        )
        from ..utils.device import host_np

        q = host_np(t.q, dtype=np.uint64).reshape(-1)
        invn = host_np(t.inv_degree, dtype=np.uint64).reshape(-1)
        s = host_np(scale, dtype=np.uint64).reshape(-1)
        fused = (
            (s.astype(object) * invn.astype(object)) % q.astype(object)
        ).astype(np.uint64)
        if isinstance(t.plan, NTTPlan32):
            return inverse_ntt_pallas(
                x, t, scale4=host_scale_pair32(fused, q)
            )
        fused_shoup = np.array(
            [_np_shoup(fused[i : i + 1], int(q[i]))[0] for i in range(len(q))],
            dtype=np.uint64,
        )
        slo, shi = _split_u32(fused)
        sslo, sshi = _split_u32(fused_shoup)
        quad = (
            jnp.asarray(slo), jnp.asarray(shi),
            jnp.asarray(sslo), jnp.asarray(sshi),
        )
        return inverse_ntt_pallas(x, t, scale4=quad)
    from . import w64 as _w64mod

    y = inverse_ntt(x, t)
    if isinstance(y, W64):
        return _w64mod.mul_mod_shoup(y, scale, scale_shoup, np.asarray(t.q))
    return mm.mul_mod_shoup(
        y, np.asarray(scale), np.asarray(scale_shoup), np.asarray(t.q)
    )


def forward_ntt_sub_scale(x, sub, t: DeviceNTTTables, scale, scale_shoup,
                          pre=None, pre_shoup=None):
    """(sub - pre*NTT(x)) * scale mod q, per limb (host (L,1) uint64 scales).

    Pallas path: one fused kernel (the moddown/rescale landing rides the
    forward transform, like the reference's forward_inplace_fuse_moddown).
    Fallback: plain composition."""
    from . import w64 as _w64mod
    from .w64 import W64

    if isinstance(x, W64) and _pallas_ok(t):
        from .ntt_pallas import (
            NTTPlan32, forward_ntt_sub_scale_pallas,
            forward_ntt_sub_scale_pallas32, host_scale_pair32,
            host_scale_quad,
        )
        from ..utils.device import host_np

        q = host_np(t.q, dtype=np.uint64)
        if isinstance(t.plan, NTTPlan32):
            post2 = host_scale_pair32(host_np(scale, dtype=np.uint64), q)
            pre2 = (None if pre is None
                    else host_scale_pair32(host_np(pre, dtype=np.uint64), q))
            return forward_ntt_sub_scale_pallas32(x, sub, t, post2, pre2)
        post_quad = host_scale_quad(host_np(scale, dtype=np.uint64), q)
        pre_quad = (None if pre is None
                    else host_scale_quad(host_np(pre, dtype=np.uint64), q))
        return forward_ntt_sub_scale_pallas(x, sub, t, post_quad, pre_quad)

    y = forward_ntt(x, t)
    q = np.asarray(t.q)
    mod = _w64mod if isinstance(y, W64) else mm
    if pre is not None:
        y = mod.mul_mod_shoup(y, pre, pre_shoup, q)
    d = mod.sub_mod(sub, y, q)
    return mod.mul_mod_shoup(d, scale, scale_shoup, q)


def inverse_ntt(x, t: DeviceNTTTables):
    """Inverse negacyclic NTT over the last axis (includes the 1/n scale)."""
    from .w64 import W64

    if isinstance(x, W64):
        if _pallas_ok(t):
            from .ntt_pallas import inverse_ntt_pallas

            return inverse_ntt_pallas(x, t)
        return W64.from_u64(inverse_ntt(x.to_u64(), t))
    n = t.n
    lead = x.shape[:-1]
    inv_roots = np.asarray(t.inv_roots)
    inv_roots_shoup = np.asarray(t.inv_roots_shoup)
    q = np.asarray(t.q).reshape((1,) * (len(lead) - 1) + (t.num_limbs, 1))

    m = n
    tt = 1
    while m > 1:
        h = m >> 1
        w = inv_roots[:, h:m]
        ws = inv_roots_shoup[:, h:m]
        w = w.reshape((1,) * (len(lead) - 1) + (t.num_limbs, h, 1, 1))
        ws = ws.reshape(w.shape)
        xr = x.reshape(lead + (h, 2, tt))
        a = xr[..., 0, :]
        b = xr[..., 1, :]
        qb = q.reshape((1,) * (len(lead) - 1) + (t.num_limbs, 1, 1))
        u = mm.add_mod(a, b, qb)
        d = mm.sub_mod(a, b, qb)
        v = mm.mul_mod_shoup(d, w[..., 0, :], ws[..., 0, :], qb)
        x = jnp.stack([u, v], axis=-2).reshape(lead + (n,))
        tt <<= 1
        m = h
    inv_n = np.asarray(t.inv_degree).reshape((1,) * (len(lead) - 1) + (t.num_limbs, 1))
    inv_n_shoup = np.asarray(t.inv_degree_shoup).reshape(inv_n.shape)
    return mm.mul_mod_shoup(x, inv_n, inv_n_shoup, q)
