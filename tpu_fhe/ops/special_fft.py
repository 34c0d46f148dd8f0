"""On-device CKKS "special FFT" over the 5^j rotation group.

TPU-native counterpart of the reference's device encoder transform
(src/fft.cu:106-817, special_fft_forward/backward over DCKKSEncoderInfo
twiddle + mul_group tables; ct/gs complex butterflies).  The reference
runs it in CUDA double-complex; the TPU has no fast f64, so every
complex value here is a **double-double of float32** (two-float /
Dekker arithmetic): a value x is carried as (hi, lo) with x = hi + lo
and |lo| <= ulp(hi)/2, giving ~48 effective mantissa bits — more than
the f64 host path needs for any practical CKKS scale, and enough that
the transform error (~2^-45 relative after log2(n) stages) sits far
below the scheme's own rounding noise.

Algorithm (HEAAN/SEAL special FFT, same butterfly/twiddle indexing the
reference kernels implement with on-the-fly psiIdx = group[brev(k<<lp)]
<< lp mod M, src/fft.cu:275-322,547-599):

  inverse (encode direction), slots w -> packed coefficients:
    for length = n, n/2, ..., 2:
        u = a[i+j] + a[i+j+lenh]
        v = (a[i+j] - a[i+j+lenh]) * ksi[(lenq - 5^j mod lenq) * M/lenq]
    bit-reverse, scale by 1/n (exact: n is a power of two)
    coefficients = [Re(a); Im(a)]  (length 2n = N)

  forward (decode direction) mirrors with ct butterflies and
  ksi[(5^j mod lenq) * M/lenq].

Stages are vectorized: each stage is one reshape to (groups, length)
plus elementwise dd arithmetic with a per-j twiddle row — no
data-dependent control flow, so the whole transform jits into a single
XLA program (the Python stage loop unrolls over the static log2(n)
stage count).

Exactness requirement: Dekker two-sum/two-prod assume IEEE f32
round-to-nearest add/mul evaluated exactly once per value.  XLA's
*fusion* pass violates the "once" part: a producer feeding several
consumers is duplicated into each consumer's fused loop, and the
copies may contract mul+add pairs differently (FMA vs two roundings),
so the SAME intermediate takes two slightly different values in one
program — two_sum's s and its error term then disagree about what was
summed and the compensated arithmetic collapses to ~f32 accuracy
(measured: 2^-23-level transform error under jit vs 2^-45 eagerly;
bit-identical regardless of split formulation, which is how the
duplication — not the split — was identified).  Fix: these programs
are AOT-compiled with the fusion pass disabled
(compiler_options={"xla_disable_hlo_passes": "fusion"}), restoring
full dd accuracy (~1e-15 at n=512 vs the f64 reference).  This is the
same class of hazard the reference documents with load-bearing
`volatile` in include/uintmodmath.cuh:79-81.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# -- double-double scalar kernels (elementwise on f32 arrays) -----------

def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    """Requires |a| >= |b| (holds for normalized dd outputs)."""
    s = a + b
    err = b - (s - a)
    return s, err


def _split(a):
    """Split a into hi (<=12 significant bits) + lo (<=12 bits), exactly.

    NOT the classic Veltkamp multiply-split (t = (2^12+1)*a; hi =
    t-(t-a)): a compiler may contract `t - a` with the producing
    multiply into an FMA, which silently destroys the split (hi comes
    back with a full 24-bit mantissa and every downstream "exact"
    product is then inexact).  Integer mantissa rounding has no
    contractable float pattern: add half an ulp-at-12-bits and mask,
    with the carry naturally propagating into the exponent field."""
    bits = jax.lax.bitcast_convert_type(jnp.asarray(a, jnp.float32),
                                        jnp.uint32)
    bits = (bits + jnp.uint32(0x1000)) & jnp.uint32(0xFFFFE000)
    hi = jax.lax.bitcast_convert_type(bits, jnp.float32)
    lo = a - hi  # exact: <=12-bit remainder (Sterbenz)
    return hi, lo


def _two_prod(a, b):
    """Exact product: p + err == a*b.  With the masked split every
    partial product below is exact in f32, so FMA contraction of any
    mul+add pair cannot change the result — the whole scheme is
    fast-math-contraction-proof by construction."""
    p = a * b
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    err = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, err


def dd_add(ahi, alo, bhi, blo):
    """Accurate (Knuth) dd addition.  The sloppy variant
    (e += alo + blo in one step) loses up to 2^-24 relative under
    cancellation — FFT butterflies cancel constantly, so the accurate
    form is required to keep the transform at ~2^-45."""
    s1, s2 = _two_sum(ahi, bhi)
    t1, t2 = _two_sum(alo, blo)
    s2 = s2 + t1
    s1, s2 = _quick_two_sum(s1, s2)
    s2 = s2 + t2
    return _quick_two_sum(s1, s2)


def dd_sub(ahi, alo, bhi, blo):
    return dd_add(ahi, alo, -bhi, -blo)


def dd_mul(ahi, alo, bhi, blo):
    p, e = _two_prod(ahi, bhi)
    e = e + (ahi * blo + alo * bhi)
    return _quick_two_sum(p, e)


def dd_scale_pow2(ahi, alo, s):
    """Multiply by an exact power of two (error-free)."""
    return ahi * s, alo * s


# -- dd complex helpers: z = (re_hi, re_lo, im_hi, im_lo) ---------------

def _c_add(a, b):
    rh, rl = dd_add(a[0], a[1], b[0], b[1])
    ih, il = dd_add(a[2], a[3], b[2], b[3])
    return rh, rl, ih, il


def _c_sub(a, b):
    rh, rl = dd_sub(a[0], a[1], b[0], b[1])
    ih, il = dd_sub(a[2], a[3], b[2], b[3])
    return rh, rl, ih, il


def _c_mul(a, b):
    # (ar + i ai)(br + i bi) = (ar br - ai bi) + i (ar bi + ai br)
    t0 = dd_mul(a[0], a[1], b[0], b[1])
    t1 = dd_mul(a[2], a[3], b[2], b[3])
    t2 = dd_mul(a[0], a[1], b[2], b[3])
    t3 = dd_mul(a[2], a[3], b[0], b[1])
    rh, rl = dd_sub(t0[0], t0[1], t1[0], t1[1])
    ih, il = dd_add(t2[0], t2[1], t3[0], t3[1])
    return rh, rl, ih, il


# -- host-side helpers --------------------------------------------------

def to_dd(x: np.ndarray):
    """float64/complex128 array -> dd plane tuple (f32 np arrays)."""
    x = np.asarray(x)
    if np.iscomplexobj(x):
        rh, rl = to_dd(x.real)[:2]
        ih, il = to_dd(x.imag)[:2]
        return rh, rl, ih, il
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def from_dd(planes) -> np.ndarray:
    """dd planes -> float64 (2 planes) or complex128 (4 planes)."""
    arrs = [np.asarray(p, dtype=np.float64) for p in planes]
    if len(arrs) == 2:
        return arrs[0] + arrs[1]
    return (arrs[0] + arrs[1]) + 1j * (arrs[2] + arrs[3])


def _host_special_ifft_oracle(emb, v: np.ndarray) -> np.ndarray:
    """complex128 host evaluation of the same inverse transform (same
    stages/twiddles as DeviceEmbedding._inv_fn); accuracy oracle only."""
    n = emb.n
    x = np.asarray(v, np.complex128).copy()
    length = n
    while length >= 2:
        s = length.bit_length() - 2
        lenh = length >> 1
        t = emb._tw_inv[s]
        tw = (np.asarray(t[0], np.float64) + np.asarray(t[1], np.float64)
              + 1j * (np.asarray(t[2], np.float64)
                      + np.asarray(t[3], np.float64)))
        x = x.reshape(n // length, length)
        u, w = x[:, :lenh], x[:, lenh:]
        x = np.concatenate([u + w, (u - w) * tw], axis=1).reshape(n)
        length >>= 1
    return x[emb._perm] / n


def _bit_reverse_perm(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


class DeviceEmbedding:
    """Per-ring-degree jitted special FFT (forward + inverse).

    ``n`` is the slot count (N/2).  Twiddle stages are precomputed on
    the host in f64 and shipped once as dd planes; both transforms are
    single jitted XLA programs operating on (..., n) dd plane stacks.
    """

    def __init__(self, n: int):
        if n & (n - 1) or n < 2:
            raise ValueError("slot count must be a power of two >= 2")
        self.n = n
        m = 4 * n  # = 2N
        rot = np.empty(n, dtype=np.int64)
        cur = 1
        for j in range(n):
            rot[j] = cur
            cur = (cur * 5) % m
        self._perm = _bit_reverse_perm(n)
        # per-stage twiddle rows, f64 -> dd
        fwd, inv = [], []
        length = 2
        while length <= n:
            lenh, lenq = length >> 1, length << 2
            idx_f = (rot[:lenh] % lenq) * (m // lenq) % m
            idx_i = (lenq - (rot[:lenh] % lenq)) * (m // lenq) % m
            ang = 2.0 * np.pi / m
            fwd.append(to_dd(np.exp(1j * ang * idx_f)))
            inv.append(to_dd(np.exp(1j * ang * idx_i)))
            length <<= 1
        self._tw_fwd = fwd   # index s: stage length = 2^(s+1)
        self._tw_inv = inv

    # stage core: x is a tuple of 4 (..., g, length) arrays
    @staticmethod
    def _butterfly_ct(x, tw, lenh):
        u = tuple(p[..., :lenh] for p in x)
        v = tuple(p[..., lenh:] for p in x)
        vt = _c_mul(v, tw)
        a = _c_add(u, vt)
        b = _c_sub(u, vt)
        return tuple(jnp.concatenate([pa, pb], axis=-1)
                     for pa, pb in zip(a, b))

    @staticmethod
    def _butterfly_gs(x, tw, lenh):
        u = tuple(p[..., :lenh] for p in x)
        v = tuple(p[..., lenh:] for p in x)
        a = _c_add(u, v)
        d = _c_sub(u, v)
        b = _c_mul(d, tw)
        return tuple(jnp.concatenate([pa, pb], axis=-1)
                     for pa, pb in zip(a, b))

    @functools.cached_property
    def _fwd_fn(self):
        n, perm = self.n, jnp.asarray(self._perm)
        tws = [tuple(jnp.asarray(p) for p in t) for t in self._tw_fwd]

        def fn(planes):
            x = tuple(p[..., perm] for p in planes)
            length, s = 2, 0
            while length <= n:
                lenh = length >> 1
                shape = x[0].shape[:-1] + (n // length, length)
                x = tuple(p.reshape(shape) for p in x)
                x = self._butterfly_ct(x, tws[s], lenh)
                x = tuple(p.reshape(p.shape[:-2] + (n,)) for p in x)
                length <<= 1
                s += 1
            return x

        return fn

    @functools.cached_property
    def _inv_fn(self):
        n, perm = self.n, jnp.asarray(self._perm)
        tws = [tuple(jnp.asarray(p) for p in t) for t in self._tw_inv]
        scale = np.float32(1.0 / n)  # exact power of two

        def fn(planes):
            x = planes
            length = n
            while length >= 2:
                s = length.bit_length() - 2
                lenh = length >> 1
                shape = x[0].shape[:-1] + (n // length, length)
                x = tuple(p.reshape(shape) for p in x)
                x = self._butterfly_gs(x, tws[s], lenh)
                x = tuple(p.reshape(p.shape[:-2] + (n,)) for p in x)
                length >>= 1
            x = tuple(p[..., perm] for p in x)
            return tuple(p * scale for p in x)

        return fn

    def _compiled(self, which, planes):
        """Per-shape AOT compile with the XLA fusion pass disabled —
        fusion's producer duplication breaks the error-free transforms
        (module docstring).  Falls back to plain jit on backends that
        reject the option (the unit tests then police accuracy)."""
        cache = self.__dict__.setdefault("_aot_cache", {})
        key = (which, tuple(p.shape for p in planes))
        got = cache.get(key)
        if got is None:
            fn = self._inv_fn if which == "inv" else self._fwd_fn
            try:
                got = jax.jit(fn).lower(planes).compile(
                    compiler_options={"xla_disable_hlo_passes": "fusion"})
            except Exception:
                got = jax.jit(fn)
                self._check_fallback_accuracy()
            cache[key] = got
        return got

    def _check_fallback_accuracy(self):
        """One-shot numeric self-check for backends that reject
        xla_disable_hlo_passes: if XLA's fusion duplication collapses the
        double-double transforms to ~f32 accuracy, say so loudly instead
        of silently injecting encode noise."""
        if self.__dict__.get("_fallback_checked"):
            return
        self._fallback_checked = True
        import warnings
        rng = np.random.default_rng(7)
        v = rng.standard_normal(self.n) + 1j * rng.standard_normal(self.n)
        planes = to_dd(v)
        out = jax.jit(self._inv_fn)(planes)
        rh, rl, ih, il = (np.asarray(p, np.float64) for p in out)
        got = np.concatenate([rh + rl, ih + il], axis=-1)
        refc = _host_special_ifft_oracle(self, v)
        ref = np.concatenate([refc.real, refc.imag], axis=-1)
        err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-300)
        if err > 2.0 ** -40:
            warnings.warn(
                "DeviceEmbedding: backend rejected xla_disable_hlo_passes "
                f"and the plain-jit fallback loses accuracy (rel err "
                f"{err:.2e} > 2^-40); device encode/decode will inject "
                "noise — prefer host embedding on this backend",
                RuntimeWarning, stacklevel=3)

    # -- public API -----------------------------------------------------
    def embed_inverse(self, values: np.ndarray) -> np.ndarray:
        """complex slots (..., n) -> real coefficients (..., 2n).

        Same semantics as CkksEncoder._embed_inverse (the full-pack
        canonical embedding): coefficients = [Re(w); Im(w)] with
        w = specialIFFT(values)."""
        values = np.asarray(values, dtype=np.complex128)
        planes = to_dd(values)
        out = self._compiled("inv", planes)(planes)
        rh, rl, ih, il = (np.asarray(p, np.float64) for p in out)
        return np.concatenate([rh + rl, ih + il], axis=-1)

    def embed_forward(self, coeffs: np.ndarray) -> np.ndarray:
        """real coefficients (..., 2n) -> complex slots (..., n)."""
        coeffs = np.asarray(coeffs, dtype=np.float64)
        n = self.n
        re, im = coeffs[..., :n], coeffs[..., n:]
        planes = to_dd(re)[:2] + to_dd(im)[:2]
        out = self._compiled("fwd", planes)(planes)
        rh, rl, ih, il = (np.asarray(p, np.float64) for p in out)
        return (rh + rl) + 1j * (ih + il)

    # raw device-side entry points (dd planes in/out)
    def embed_inverse_dd(self, planes):
        return self._compiled("inv", planes)(planes)

    def embed_forward_dd(self, planes):
        return self._compiled("fwd", planes)(planes)
