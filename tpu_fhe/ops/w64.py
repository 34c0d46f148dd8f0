"""W64: 64-bit values as (lo, hi) uint32 plane pairs — the canonical
on-device representation for all big polynomial data.

XLA's uint64 emulation on TPU is ~20-50x off roofline for the modular
arithmetic mix FHE needs (measured: a full u32-pair Shoup mulmod runs ~7x
faster than a single u64 split+merge round trip).  The framework therefore
carries every ciphertext/key polynomial as two uint32 planes and performs
all modular arithmetic with explicit 32-bit formulas (ops/u32pair.py), which
XLA fuses into near-roofline vector code and which Pallas kernels consume
with zero boundary conversion.

API mirrors ops/modmath.py (the uint64 reference implementation, kept for
the CPU NTT fallback and tests).  Operand polymorphism keeps call sites
small: any operand may be a W64 or a uint64 jnp/np array (typically the
small per-limb precompute tables, shape (L, 1), split on the fly); data
outputs are always W64.  Behavioural contract matches the reference device
layer (include/uintmodmath.cuh): Barrett 128->64 reduction with the
two-word const_ratio, Shoup multiplication, lazy [0, 2q) variants.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import u32pair as u

_MASK32 = jnp.uint64(0xFFFFFFFF)


class _At:
    """`w.at[idx].set(v)` forwarding to both planes."""

    def __init__(self, w: "W64", idx):
        self._w = w
        self._idx = idx

    def set(self, value) -> "W64":
        v = as_w64(value)
        return W64(
            self._w.lo.at[self._idx].set(v.lo),
            self._w.hi.at[self._idx].set(v.hi),
        )


class _AtProxy:
    def __init__(self, w: "W64"):
        self._w = w

    def __getitem__(self, idx) -> _At:
        return _At(self._w, idx)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class W64:
    """A 64-bit array as two equally-shaped uint32 planes.

    COMPACT FORM (q32 regime): `hi_` may be None, meaning an implicitly
    zero hi plane.  Every prime < 2^30 keeps residues (and their lazy
    [0,4q) forms) inside the lo plane, so q32 ciphertexts/plaintexts at
    rest carry a structurally-zero hi plane at 2x the bytes — the
    identified cause of the full-scale ResNet OOM (r04).  Reading `.hi`
    materializes zeros (XLA folds them in-program); structural ops
    (`[]`, reshape) preserve compactness; arithmetic outputs are full
    W64 pairs and are re-compacted at program boundaries by
    `compact_q32` when the context is q32.
    """

    lo: jnp.ndarray
    hi_: "jnp.ndarray | None"

    @property
    def hi(self) -> jnp.ndarray:
        if self.hi_ is None:
            return jnp.zeros_like(self.lo)
        return self.hi_

    @property
    def is_compact(self) -> bool:
        return self.hi_ is None

    def tree_flatten(self):
        return (self.lo, self.hi_), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- numpy-ish surface -------------------------------------------------
    @property
    def shape(self):
        return self.lo.shape

    @property
    def ndim(self):
        return self.lo.ndim

    def __getitem__(self, idx) -> "W64":
        return W64(self.lo[idx],
                   None if self.hi_ is None else self.hi_[idx])

    @property
    def at(self) -> _AtProxy:
        return _AtProxy(self)

    def reshape(self, *shape) -> "W64":
        return W64(self.lo.reshape(*shape),
                   None if self.hi_ is None else self.hi_.reshape(*shape))

    # -- conversions -------------------------------------------------------
    @staticmethod
    def from_u64(x) -> "W64":
        x = jnp.asarray(x, dtype=jnp.uint64)
        return W64((x & _MASK32).astype(jnp.uint32),
                   (x >> jnp.uint64(32)).astype(jnp.uint32))

    @staticmethod
    def from_np(x: np.ndarray) -> "W64":
        """Host-side split (no u64 device ops)."""
        x = np.asarray(x, dtype=np.uint64)
        return W64(
            jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
        )

    def to_u64(self) -> jnp.ndarray:
        return self.lo.astype(jnp.uint64) | (self.hi.astype(jnp.uint64) << jnp.uint64(32))

    def to_np(self) -> np.ndarray:
        lo = np.asarray(self.lo).astype(np.uint64)
        if self.hi_ is None:
            return lo
        return lo | (np.asarray(self.hi_).astype(np.uint64) << np.uint64(32))


def as_w64(x) -> W64:
    if isinstance(x, W64):
        return x
    if isinstance(x, np.ndarray):
        return W64.from_np(x)
    return W64.from_u64(x)


def compact(w: W64) -> W64:
    """Compact form: drop the hi plane (caller asserts values < 2^32)."""
    return W64(w.lo, None)


def compact_tree(x):
    """Replace every W64 in a pytree with its compact (hi=None) form.

    q32 program-boundary policy: outputs are canonical residues < 2^30,
    so the hi planes are structurally zero — dropping them halves the
    at-rest HBM of every ciphertext/plaintext (keys already store bare
    u32, scheme/keys.py)."""
    return jax.tree_util.tree_map(
        lambda w: W64(w.lo, None) if isinstance(w, W64) else w,
        x, is_leaf=lambda o: isinstance(o, W64),
    )


# -- array manipulation helpers ---------------------------------------------

def _in_mesh_context() -> bool:
    """True when tracing under an active device mesh (GSPMD partitioning).

    The XLA:CPU dynamic-update-slice concat lowering below MISCOMPILES
    under the SPMD partitioner (observed: vmapped keyswitch on a
    (batch, limb) CPU mesh corrupts exactly the limbs at shard boundaries,
    2026-08-18) — sharded programs must use the native concatenate."""
    try:
        from jax._src import mesh as _mesh_lib

        if not _mesh_lib.thread_resources.env.physical_mesh.empty:
            return True
    except Exception:  # pragma: no cover - private API moved
        pass
    try:
        m = jax.sharding.get_abstract_mesh()
        return bool(getattr(m, "shape_tuple", ()))
    except Exception:  # pragma: no cover
        return False


def _concat_planes(planes, axis: int):
    """Concatenate u32 planes.

    XLA:CPU lowers `concatenate` of certain producer graphs (e.g. the
    keyswitch output) catastrophically — measured 16s vs 10ms at N=2048,
    and an optimization barrier does NOT help — so on CPU the concat is
    built from dynamic-update-slice copies instead.  TPU keeps the native
    concatenate (fuses fine), and so do sharded (mesh) programs — the DUS
    form is wrong under the SPMD partitioner (see _in_mesh_context)."""
    if jax.default_backend() != "cpu" or _in_mesh_context():
        return jnp.concatenate(planes, axis=axis)
    axis = axis % planes[0].ndim
    out_shape = list(planes[0].shape)
    out_shape[axis] = sum(p.shape[axis] for p in planes)
    out = jnp.zeros(out_shape, planes[0].dtype)
    off = 0
    for p in planes:
        out = jax.lax.dynamic_update_slice_in_dim(out, p, off, axis)
        off += p.shape[axis]
    return out


def stack(ws, axis: int = 0) -> W64:
    ws = [as_w64(w) for w in ws]
    axis = axis % (ws[0].ndim + 1) if axis < 0 else axis
    los = [jnp.expand_dims(w.lo, axis) for w in ws]
    if all(w.hi_ is None for w in ws):
        return W64(_concat_planes(los, axis), None)
    his = [jnp.expand_dims(w.hi, axis) for w in ws]
    return W64(_concat_planes(los, axis), _concat_planes(his, axis))


def concat(ws, axis: int = 0) -> W64:
    ws = [as_w64(w) for w in ws]
    if all(w.hi_ is None for w in ws):
        return W64(_concat_planes([w.lo for w in ws], axis), None)
    return W64(_concat_planes([w.lo for w in ws], axis),
               _concat_planes([w.hi for w in ws], axis))


def zeros(shape) -> W64:
    z = jnp.zeros(shape, dtype=jnp.uint32)
    return W64(z, z)


def zeros_like(w: W64) -> W64:
    return zeros(w.shape)


def where(cond, a, b) -> W64:
    a, b = as_w64(a), as_w64(b)
    return W64(jnp.where(cond, a.lo, b.lo), jnp.where(cond, a.hi, b.hi))


def broadcast_to(w, shape) -> W64:
    w = as_w64(w)
    return W64(jnp.broadcast_to(w.lo, shape), jnp.broadcast_to(w.hi, shape))


def full_like_scalar(shape, value: int) -> W64:
    return W64(jnp.full(shape, value & 0xFFFFFFFF, dtype=jnp.uint32),
               jnp.full(shape, (value >> 32) & 0xFFFFFFFF, dtype=jnp.uint32))


# -- comparisons -------------------------------------------------------------

def eq(a, b):
    a, b = as_w64(a), as_w64(b)
    return (a.lo == b.lo) & (a.hi == b.hi)


def gt(a, b):
    a, b = as_w64(a), as_w64(b)
    return (a.hi > b.hi) | ((a.hi == b.hi) & (a.lo > b.lo))


def geq(a, b):
    a, b = as_w64(a), as_w64(b)
    return (a.hi > b.hi) | ((a.hi == b.hi) & (a.lo >= b.lo))


def is_zero(a):
    a = as_w64(a)
    return (a.lo == 0) & (a.hi == 0)


# -- plain 64-bit arithmetic (wrapping) --------------------------------------

def add(a, b) -> W64:
    a, b = as_w64(a), as_w64(b)
    return W64(*u.add64(a.lo, a.hi, b.lo, b.hi))


def sub(a, b) -> W64:
    a, b = as_w64(a), as_w64(b)
    return W64(*u.sub64(a.lo, a.hi, b.lo, b.hi))


def shift_right(a, k: int) -> W64:
    a = as_w64(a)
    if k == 0:
        return a
    if k < 32:
        return W64((a.lo >> k) | (a.hi << (32 - k)), a.hi >> k)
    return W64(a.hi >> (k - 32), jnp.zeros_like(a.hi))


def mul_u64_full(a, b) -> tuple[W64, W64]:
    """Full 64x64 -> 128-bit product as (hi, lo) W64 pair (modmath order)."""
    a, b = as_w64(a), as_w64(b)
    w0, w1, w2, w3 = u.mul64_full(a.lo, a.hi, b.lo, b.hi)
    return W64(w2, w3), W64(w0, w1)


def mul_u64_hi(a, b) -> W64:
    a, b = as_w64(a), as_w64(b)
    return W64(*u.mul64_hi(a.lo, a.hi, b.lo, b.hi))


def mul_u64_lo(a, b) -> W64:
    a, b = as_w64(a), as_w64(b)
    return W64(*u.mul64_lo(a.lo, a.hi, b.lo, b.hi))


def add_u128(a_hi, a_lo, b_hi, b_lo) -> tuple[W64, W64]:
    """(a_hi:a_lo) + (b_hi:b_lo) mod 2^128 as (hi, lo) W64s."""
    a_hi, a_lo, b_hi, b_lo = map(as_w64, (a_hi, a_lo, b_hi, b_lo))
    lo = add(a_lo, b_lo)
    carry_lo = gt(a_lo, lo).astype(jnp.uint32)  # 64-bit sum wrapped
    hi = add(add(a_hi, b_hi), W64(carry_lo, jnp.zeros_like(carry_lo)))
    return hi, lo


# -- modular arithmetic ------------------------------------------------------

def csub(a, q) -> W64:
    a, q = as_w64(a), as_w64(q)
    return W64(*u.csub64(a.lo, a.hi, q.lo, q.hi))


def add_mod(a, b, q) -> W64:
    a, b, q = as_w64(a), as_w64(b), as_w64(q)
    return W64(*u.add_mod64(a.lo, a.hi, b.lo, b.hi, q.lo, q.hi))


def sub_mod(a, b, q) -> W64:
    a, b, q = as_w64(a), as_w64(b), as_w64(q)
    return W64(*u.sub_mod64(a.lo, a.hi, b.lo, b.hi, q.lo, q.hi))


def neg_mod(a, q) -> W64:
    a, q = as_w64(a), as_w64(q)
    d = sub(q, a)
    return where(is_zero(a), a, d)


def mul_mod_shoup_lazy(a, w, w_shoup, q) -> W64:
    a, w, ws, q = as_w64(a), as_w64(w), as_w64(w_shoup), as_w64(q)
    return W64(*u.mul_mod_shoup64(a.lo, a.hi, w.lo, w.hi, ws.lo, ws.hi,
                                  q.lo, q.hi, lazy=True))


def mul_mod_shoup(a, w, w_shoup, q) -> W64:
    a, w, ws, q = as_w64(a), as_w64(w), as_w64(w_shoup), as_w64(q)
    return W64(*u.mul_mod_shoup64(a.lo, a.hi, w.lo, w.hi, ws.lo, ws.hi,
                                  q.lo, q.hi))


def barrett_reduce_u128(x_hi, x_lo, q, ratio_lo, ratio_hi) -> W64:
    """Reduce a 128-bit (hi, lo) value mod q (q < 2^61) via the two-word
    Barrett ratio (mirrors barrett_reduce_uint128_uint64,
    include/uintmodmath.cuh:96-136)."""
    x_hi, x_lo = as_w64(x_hi), as_w64(x_lo)
    q, r0, r1 = as_w64(q), as_w64(ratio_lo), as_w64(ratio_hi)
    return W64(*u.barrett_reduce128(
        x_lo.lo, x_lo.hi, x_hi.lo, x_hi.hi,
        q.lo, q.hi, r0.lo, r0.hi, r1.lo, r1.hi,
    ))


def barrett_reduce_u64(x, q, ratio_hi) -> W64:
    """Reduce a 64-bit value mod q using ratio_hi = floor(2^128/q) >> 64."""
    x, q, rh = as_w64(x), as_w64(q), as_w64(ratio_hi)
    tmp = mul_u64_hi(x, rh)
    res = sub(x, mul_u64_lo(tmp, q))
    return csub(res, q)


def mul_mod(a, b, q, ratio_lo, ratio_hi) -> W64:
    """a*b mod q via full product + Barrett (both operands variable)."""
    hi, lo = mul_u64_full(a, b)
    return barrett_reduce_u128(hi, lo, q, ratio_lo, ratio_hi)


def q32_mul_consts(q_vals: "np.ndarray"):
    """Host constants for mul_mod_q32: (q, floor(2^32/q), 2^32 mod q and
    its 32-bit Shoup word) as (L, 1) uint32 arrays."""
    q = np.asarray(q_vals, dtype=np.uint64).reshape(-1, 1)
    ws_one = ((np.uint64(1) << np.uint64(32)) * np.ones_like(q)) // q
    c32 = (np.uint64(1) << np.uint64(32)) % q
    c32s = (c32 << np.uint64(32)) // q

    def u32c(v):
        # HOST arrays on purpose: these are cached across jit traces
        # (jnp constants created inside one trace would leak tracers)
        return v.astype(np.uint32)

    return u32c(q), u32c(ws_one), u32c(c32), u32c(c32s)


def mul_mod_q32(a, b, consts) -> W64:
    """a*b mod q for the q32 regime (every residue and modulus < 2^30):
    single u32-plane arithmetic — the 64-bit product folds as
    lo + 2^32*hi with one plain Barrett and one Shoup-32 multiply
    (u32pair formulas at XLA level).  ~4x fewer VPU ops than the
    W64-pair Barrett path the generic mul_mod takes; returns compact.

    consts = q32_mul_consts(q_vals); a/b may be compact or not (only the
    lo planes are read — caller guarantees canonical residues)."""
    from . import u32pair as u32c

    q, ws_one, c32, c32s = consts
    lo, hi = u32c.mul32(a.lo, b.lo)
    s0 = u32c.csub32(lo - u32c.mulhi32(lo, ws_one) * q, q)       # [0, q)
    s1 = u32c.mul_mod_shoup32(hi, c32, c32s, q, lazy=True)       # [0, 2q)
    return W64(u32c.csub32(u32c.csub32(s0 + s1, q), q), None)


def shoup_of(w, q, ratio_lo, ratio_hi) -> W64:
    """Exact floor(w * 2^64 / q) on device for w < q (the Shoup companion
    word of a device-resident multiplier, e.g. evaluation-key limbs).

    Uses the Barrett ratio r = floor(2^128/q) = (ratio_hi : ratio_lo):
    e = floor(w*r / 2^64) = w*ratio_hi + mulhi(w, ratio_lo) is the true
    value or one less (w*rem/(q*2^64) < 1 with rem = 2^128 mod q), so one
    correction step decides: e+1 is right iff (e+1)*q <= w*2^64."""
    w, q = as_w64(w), as_w64(q)
    e = add(mul_u64_lo(w, ratio_hi), mul_u64_hi(w, ratio_lo))
    one = full_like_scalar(e.shape, 1)
    e1 = add(e, one)
    p_hi, p_lo = mul_u64_full(e1, q)
    # (p_hi : p_lo) <= (w : 0)  <=>  p_hi < w  or  (p_hi == w and p_lo == 0)
    cond = gt(w, p_hi) | (eq(p_hi, w) & is_zero(p_lo))
    return where(cond, e1, e)


def shoup32_of(w32, q_vals: np.ndarray):
    """Exact floor(w * 2^32 / q) as a u32 array, for device-resident w < q
    with q < 2^30 (the q32 Shoup companion of evaluation-key limbs).

    w32: uint32 array (..., k, N); q_vals: host (k,) or (k, 1) uint64.
    Same estimate-and-correct scheme as shoup_of with the 96-bit ratio
    r = floor(2^96/q): e = floor(w*r/2^64) is exact or one less."""
    q_host = np.asarray(q_vals, dtype=np.uint64).reshape(-1, 1)
    r = np.array([(1 << 96) // int(v) for v in q_host[:, 0]], dtype=object)
    r_hi = np.array([int(v) >> 64 for v in r], dtype=np.uint64).reshape(-1, 1)
    r_lo = np.array(
        [int(v) & 0xFFFFFFFFFFFFFFFF for v in r], dtype=np.uint64
    ).reshape(-1, 1)
    w = W64(w32, jnp.zeros_like(w32))
    e = add(mul_u64_lo(w, as_w64(r_hi)), mul_u64_hi(w, as_w64(r_lo)))
    e1 = add(e, full_like_scalar(e.shape, 1))
    p_hi, p_lo = mul_u64_full(e1, as_w64(q_host))
    w32_shifted = W64(jnp.zeros_like(w32), w32)         # value w * 2^32
    cond = is_zero(p_hi) & geq(w32_shifted, p_lo)
    return where(cond, e1, e).lo
