"""CKKS encoder: canonical embedding over the 5^j rotation group.

Functional mirror of the reference's PhantomCKKSEncoder (src/ckks.cu,
src/fft.cu "special FFT"): slots live at the primitive 2N-th roots
zeta^{5^j}; encode = inverse embedding -> scaled real coefficients ->
RNS decompose -> forward NTT; decode is the inverse chain.

TPU-first deviation (SURVEY.md section 7): the complex transform runs on the
host in float64 via an FFT of size 2N (f64 is emulated/slow on TPU and
encode/decode are not hot: bootstrap plaintexts are precomputed).  The FFT
evaluates m(zeta^k) for all k at once; the 5^j orbit is a host-side gather.
Sparse packing (slots < N/2) replicates the slot vector across the full
slot set, which yields exactly the stride-replicated coefficient layout of
the reference's encode_sparse (src/ckks.cu:19-43).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.rns import RNSBase
from ..ops.ntt import forward_ntt, inverse_ntt
from ..ops.w64 import W64
from .ciphertext import Plaintext
from .context import FheContext


class CkksEncoder:
    def __init__(self, context: FheContext, device_embed: bool | None = None):
        self.context = context
        self.n = context.n
        self.slots = self.n // 2
        if device_embed is None:
            import os

            device_embed = os.environ.get("TPU_FHE_DEVICE_EMBED", "") == "1"
        self.device_embed = device_embed and self.slots >= 2
        self._dev_embedding = None
        two_n = 2 * self.n
        # rotation-group exponents: e_j = 5^j mod 2N for j in [0, N/2)
        e = np.empty(self.slots, dtype=np.int64)
        cur = 1
        for j in range(self.slots):
            e[j] = cur
            cur = (cur * 5) % two_n
        self.rot_group = e

    # -- embedding ------------------------------------------------------
    @property
    def device_embedding(self):
        """On-device special FFT (ops/special_fft.py): the TPU-native
        counterpart of the reference's src/fft.cu encoder kernels, in
        double-double f32.  Built lazily; enabled for encode/decode by
        device_embed=True (or TPU_FHE_DEVICE_EMBED=1)."""
        if self._dev_embedding is None:
            from ..ops.special_fft import DeviceEmbedding

            self._dev_embedding = DeviceEmbedding(self.slots)
        return self._dev_embedding

    def _embed_inverse_slots(self, values: np.ndarray, slots: int) -> np.ndarray:
        """Sparse-packing fast path (reference encode_sparse +
        extend_sparse_ckks, src/ckks.cu:19-43): the embedding of a slot
        vector tiled to the full slot set equals the ring-degree-2m
        embedding of the m-slot vector scattered at coefficient stride
        N/(2m) (verified exact: the tiled spectrum is nonzero only on
        the 5^j orbit of the subring).  For m << N/2 (DNN conv masks,
        ResNet w*w packing) this is a ~N/(2m)-fold smaller transform
        than tiling first."""
        if slots > self.slots:
            raise ValueError(
                f"too many values for ring degree: {slots} slots > "
                f"{self.slots} available (N={self.n})")
        if slots == self.slots or slots < 2:
            reps = self.slots // max(slots, 1)
            return self._embed_inverse(np.tile(values, reps))
        gap = self.n // (2 * slots)
        if self.device_embed:
            small = self.device_embedding_for(slots).embed_inverse(values)
        else:
            small = _host_embed_inverse(values, 2 * slots,
                                        self._rot_group_for(2 * slots))
        out = np.zeros(values.shape[:-1] + (self.n,), dtype=np.float64)
        out[..., ::gap] = small
        return out

    def _rot_group_for(self, n_ring: int) -> np.ndarray:
        cache = self.__dict__.setdefault("_rot_cache", {})
        got = cache.get(n_ring)
        if got is None:
            two_n = 2 * n_ring
            e = np.empty(n_ring // 2, dtype=np.int64)
            cur = 1
            for j in range(n_ring // 2):
                e[j] = cur
                cur = (cur * 5) % two_n
            got = cache[n_ring] = e
        return got

    def device_embedding_for(self, slots: int):
        cache = self.__dict__.setdefault("_dev_cache", {})
        got = cache.get(slots)
        if got is None:
            from ..ops.special_fft import DeviceEmbedding

            got = cache[slots] = DeviceEmbedding(slots)
        return got

    def _embed_inverse(self, values: np.ndarray) -> np.ndarray:
        """slots (complex, len N/2) -> real coefficient vector (len N)."""
        if self.device_embed:
            return self.device_embedding.embed_inverse(values)
        n, two_n = self.n, 2 * self.n
        # m_t = (1/N) * sum_j [ z_j * zeta^{-e_j t} + conj(z_j) zeta^{e_j t} ]
        #     = (2/N) * Re( sum_j z_j * zeta^{-e_j t} )
        # Evaluate S(t) = sum_j z_j w^{e_j t} with w = zeta^{-1} = exp(-i pi/N)
        # via a size-2N inverse-FFT-style matrix: scatter z_j at frequency
        # e_j then one FFT.
        spec = np.zeros(two_n, dtype=np.complex128)
        np.add.at(spec, self.rot_group % two_n, values)
        # sum_k spec[k] * exp(-2pi i k t / 2N) = np.fft.fft(spec)[t]
        s = np.fft.fft(spec)[:n]
        return (2.0 / n) * s.real

    def _embed_forward(self, coeffs: np.ndarray) -> np.ndarray:
        """real coefficients (len N) -> slot values (complex, len N/2)."""
        if self.device_embed:
            return self.device_embedding.embed_forward(coeffs)
        two_n = 2 * self.n
        padded = np.zeros(two_n, dtype=np.complex128)
        padded[: self.n] = coeffs
        # m(zeta^k) for all k: zeta = exp(i pi / N) = exp(2 pi i / 2N)
        evals = np.fft.ifft(padded) * two_n  # sum_t m_t exp(+2pi i k t/2N)
        return evals[self.rot_group % two_n]

    def _ext_tables(self, chain_index: int):
        """Per-level cache of (QlP RNS base, QlP NTT tables) for encode_ext:
        both are expensive to rebuild (the table concat touches the (L, N)
        twiddle planes) and bootstrap setup encodes ~dozens of plaintexts
        per level."""
        cache = self.__dict__.setdefault("_ext_cache", {})
        got = cache.get(chain_index)
        if got is None:
            from ..ops.ntt import DeviceNTTTables

            ctx = self.context
            level = ctx.level(chain_index)
            got = (
                level.base.extend(ctx.base_P),
                DeviceNTTTables.concat(level.ntt, level.ks.p_ntt),
            )
            cache[chain_index] = got
        return got

    def _maybe_compact(self, poly):
        """q32 regime: residues < 2^30 fit the lo plane — store extended
        (QlP) plaintexts as bare u32.  Bootstrap BSGS plaintext sets are
        GBs at logN=16; W64-pair storage doubles that for structurally
        zero hi planes (hoisting.eval_mult_ext re-wraps in-program)."""
        if self.context.is_q32:
            import jax

            return jax.jit(lambda d: d.lo)(poly)
        return poly

    # -- public API -------------------------------------------------------
    def encode(
        self,
        values,
        scale: float,
        chain_index: int | None = None,
        slots: int | None = None,
    ) -> Plaintext:
        """Encode complex/real values (len <= N/2) at the given scale/level."""
        ctx = self.context
        if chain_index is None:
            chain_index = 1
        level = ctx.level(chain_index)
        values = np.asarray(values, dtype=np.complex128).ravel()
        slots = slots if slots is not None else len(values)
        if len(values) < slots:
            values = np.pad(values, (0, slots - len(values)))
        if slots & (slots - 1):
            raise ValueError("slot count must be a power of two")
        if slots > self.slots:
            raise ValueError("too many values for ring degree")

        coeffs = self._embed_inverse_slots(values, slots) * scale
        # bound check before the exact round+decompose (float -> int is
        # exact at any magnitude; the fast path uses vector int64, the
        # fallback object ints — never float modulo, which would corrupt
        # residues for q > 2^52)
        amax = float(np.max(np.abs(coeffs))) if coeffs.size else 0.0
        if int(amax).bit_length() + 2 >= level.base.big_modulus.bit_length():
            raise ValueError("encoded values are too large for the modulus")

        data = _round_decompose(coeffs, level.base)
        poly = forward_ntt(W64.from_np(data), level.ntt)
        if ctx.is_q32:
            from ..ops import w64 as w64_mod

            poly = w64_mod.compact(poly)  # residues < 2^30
        return Plaintext(
            data=poly, chain_index=chain_index, scale=scale, is_ntt_form=True
        )

    def encode_ext(
        self,
        values,
        scale: float,
        chain_index: int = 1,
        slots: int | None = None,
        noise_scale_deg: int = 1,
    ) -> Plaintext:
        """Encode at the extended basis QlP (reference encode_ext,
        include/ckks.h:190-224) — plaintexts that multiply hoisted
        ciphertexts living at QlP."""
        ctx = self.context
        level = ctx.level(chain_index)
        ks = level.ks
        ext_base, ext_ntt = self._ext_tables(chain_index)
        values = np.asarray(values, dtype=np.complex128).ravel()
        slots = slots if slots is not None else len(values)
        if slots & (slots - 1):
            raise ValueError("slot count must be a power of two")
        coeffs = self._embed_inverse_slots(values, slots) * scale
        data = _round_decompose(coeffs, ext_base)
        poly = self._maybe_compact(forward_ntt(W64.from_np(data), ext_ntt))
        return Plaintext(
            data=poly, chain_index=chain_index, scale=scale,
            noise_scale_deg=noise_scale_deg, is_ntt_form=True,
        )

    def encode_ext_batch(
        self,
        values_list,
        scale: float,
        chain_index: int = 1,
        slots: int | None = None,
        noise_scale_deg: int = 1,
    ) -> list[Plaintext]:
        """Batched encode_ext: ONE host->device transfer and ONE batched
        forward NTT for a whole list of slot vectors.  Bootstrap setup
        encodes hundreds of BSGS plaintexts per level; per-call device
        round trips dominate on a tunneled TPU."""
        ctx = self.context
        level = ctx.level(chain_index)
        ext_base, ext_ntt = self._ext_tables(chain_index)
        planes = []
        for values in values_list:
            values = np.asarray(values, dtype=np.complex128).ravel()
            s = slots if slots is not None else len(values)
            if s & (s - 1):
                raise ValueError("slot count must be a power of two")
            coeffs = self._embed_inverse_slots(values, s) * scale
            planes.append(_round_decompose(coeffs, ext_base))
        batch = np.stack(planes)                     # (B, L, N)
        poly = self._maybe_compact(forward_ntt(W64.from_np(batch), ext_ntt))
        return [
            Plaintext(
                data=poly[i], chain_index=chain_index, scale=scale,
                noise_scale_deg=noise_scale_deg, is_ntt_form=True,
            )
            for i in range(len(planes))
        ]

    def embed_for_slots(self, values, slots: int) -> np.ndarray:
        """Tile a slot vector to the full slot set and apply the inverse
        embedding, UNSCALED.  The embedding is linear, so the result can be
        cached and reused across scales and scalar weights:
        encode(w * v, s) == round(embed_for_slots(v) * (w * s)) — the DNN
        conv layer caches one embedding per boundary mask instead of
        re-running the FFT for every (in_ch, out_ch, tap) weight
        (the reference builds conv masks on device per tap,
        src/dnn.cu:82-150; host-encoding each one was the round-2
        bottleneck)."""
        values = np.asarray(values, dtype=np.complex128).ravel()
        if len(values) < slots:
            values = np.pad(values, (0, slots - len(values)))
        if slots & (slots - 1):
            raise ValueError("slot count must be a power of two")
        if slots > self.slots:
            raise ValueError("too many values for ring degree")
        return self._embed_inverse_slots(values, slots)

    def encode_coeff_rows(
        self,
        rows,
        scale: float,
        chain_index: int,
        ext: bool = False,
        noise_scale_deg: int = 1,
        max_batch: int = 128,
    ) -> list[Plaintext]:
        """Encode pre-embedded coefficient rows (embed_for_slots outputs,
        optionally already weight-multiplied): scale, round, RNS-decompose,
        and forward-NTT in device batches of max_batch — one transfer and
        one batched transform per chunk instead of per plaintext.  With
        ext=True the plaintexts live at the extended basis QlP
        (encode_ext semantics, for multiplying hoisted ciphertexts)."""
        ctx = self.context
        level = ctx.level(chain_index)
        if ext:
            base, ntt = self._ext_tables(chain_index)
        else:
            base, ntt = level.base, level.ntt
        out: list[Plaintext] = []
        rows = list(rows)
        for start in range(0, len(rows), max_batch):
            chunk = rows[start:start + max_batch]
            planes = np.stack(
                [_round_decompose(np.asarray(r) * scale, base) for r in chunk]
            )
            poly = forward_ntt(W64.from_np(planes), ntt)
            if ext:
                poly = self._maybe_compact(poly)
            elif ctx.is_q32:
                from ..ops import w64 as w64_mod

                poly = w64_mod.compact(poly)  # residues < 2^30
            out.extend(
                Plaintext(
                    data=poly[i], chain_index=chain_index, scale=scale,
                    noise_scale_deg=noise_scale_deg, is_ntt_form=True,
                )
                for i in range(len(chunk))
            )
        return out

    def decode(self, pt: Plaintext, slots: int | None = None) -> np.ndarray:
        ctx = self.context
        level = ctx.level(pt.chain_index)
        data = pt.data
        if pt.is_ntt_form:
            data = inverse_ntt(data, level.ntt)
        residues = data.to_np()
        coeffs = _compose_signed(residues, level.base)
        vals = self._embed_forward(np.asarray(coeffs, dtype=np.float64) / pt.scale)
        if slots is not None:
            vals = vals[:slots]
        return vals


def _host_embed_inverse(values: np.ndarray, n_ring: int,
                        rot_group: np.ndarray) -> np.ndarray:
    """Ring-degree-parametric host inverse embedding (same math as
    CkksEncoder._embed_inverse, reused for sparse sub-rings)."""
    two_n = 2 * n_ring
    spec = np.zeros(two_n, dtype=np.complex128)
    np.add.at(spec, rot_group % two_n, np.asarray(values, np.complex128))
    s = np.fft.fft(spec)[:n_ring]
    return (2.0 / n_ring) * s.real


def _round_decompose(coeffs: np.ndarray, base: RNSBase) -> np.ndarray:
    """round(float64 coeffs) -> (L, N) residue planes, fast when possible.

    A float64's integer value is exact (<= 52 significant bits), so for
    |c| < 2^62 the round lands exactly in int64 and the per-limb reduction
    is pure vector int64 arithmetic; larger coefficients take the exact
    big-int path."""
    amax = float(np.max(np.abs(coeffs))) if coeffs.size else 0.0
    if amax < float(1 << 62):
        ri = np.rint(coeffs).astype(np.int64)
        out = np.empty((len(base), len(ri)), dtype=np.uint64)
        for i, q in enumerate(base.values):
            out[i] = (ri % np.int64(q)).astype(np.uint64)
        return out
    rounded = np.array([int(round(float(c))) for c in coeffs], dtype=object)
    return _decompose_signed(rounded, base)


def _decompose_signed(coeffs, base: RNSBase) -> np.ndarray:
    """Signed big ints -> (L, N) uint64 residue planes.

    Coefficients below 2^126 take the native 128-bit path
    (tpu_fhe/native); larger ones (deep chains, huge scales) fall back to
    exact object-int arithmetic."""
    from .. import native

    n = len(coeffs)
    ints = [int(c) for c in coeffs]
    if all(-(1 << 126) < v < (1 << 126) for v in ints):
        lo = np.empty(n, dtype=np.uint64)
        hi = np.empty(n, dtype=np.int64)
        mask = 0xFFFFFFFFFFFFFFFF
        for i, v in enumerate(ints):
            lo[i] = v & mask
            hi[i] = v >> 64
        fast = native.decompose_i128(lo, hi, list(base.values))
        if fast is not None:
            return fast
    arr = np.asarray(ints, dtype=object)
    out = np.empty((len(base), n), dtype=np.uint64)
    for i, q in enumerate(base.values):
        out[i] = (arr % q).astype(np.uint64)
    return out


def _compose_signed(residues: np.ndarray, base: RNSBase):
    """(L, N) residues -> centered big ints (python objects)."""
    big_q = base.big_modulus
    half = big_q // 2
    n = residues.shape[1]
    acc = np.zeros(n, dtype=object)
    for i in range(len(base)):
        mult = (base.q_hat_inv_mod_q[i] * base.punctured_products[i]) % big_q
        acc = (acc + residues[i].astype(object) * mult) % big_q
    return [int(v) - big_q if v > half else int(v) for v in acc]
