"""BGV scheme tools: encrypt/decrypt with t-scaled noise, exact mod-t decode.

TPU-native counterpart of the reference's BGV plumbing: plaintexts sit in
the low bits (c0 = b + m with noise t*e), decryption reduces the centered
value of [c0 + c1 s]_Q modulo t exactly (reference decrypt_mod_t /
exact_convert_array, src/rns.cu), and a multiplicative correction factor
rides on the ciphertext metadata (include/ciphertext.h correction_factor),
updated by modulus switching and multiplication and balanced on addition.

The exact conversion runs fully on device: the CRT overshoot alpha in
sum(xhat_i * qhat_i) = X + alpha*Q is recovered by ROUNDING the 128-bit
fixed-point sum of xhat_i * floor(2^128/q_i) / 2^64 — rounding (not floor)
makes the result the CENTERED residue, exactly what BGV needs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..core import numth
from ..core.ntt_tables import compute_shoup
from ..core.rns import BaseConverter, RNSBase
from ..ops import w64
from ..ops.bconv import bconv_matmul
from ..ops.ntt import forward_ntt, inverse_ntt
from ..ops.w64 import W64
from .bfv import _col, _mod_arrays, _scalar_w64, _shoup_col
from .ciphertext import Ciphertext, Plaintext
from .context import ContextLevel, FheContext
from .keys import SecretKey, PublicKey, encrypt_asymmetric


@dataclass(frozen=True)
class BgvLevelTables:
    """Per-level host tables for BGV encode/decrypt/rescale."""

    qhatinv_mod_q: np.ndarray         # (k, 1) + Shoup
    qhatinv_mod_q_shoup: np.ndarray
    qhat_mod_t: np.ndarray            # (1, k)
    q_mod_t: int
    # centered plain lift: c < (t+1)/2 ? c : c + (q_i - t)
    plain_upper_half_threshold: int
    plain_upper_half_increment: np.ndarray  # (k, 1)
    # rescale (t-preserving divide by q_last)
    inv_t_mod_q_last: int | None      # [t^{-1}]_{q_last}
    t_mod_rest: np.ndarray | None     # (k-1, 1) t mod q_i
    t_q_last_mod_rest: np.ndarray | None  # (k-1, 1) [t*q_last]_{q_i}


class BgvTools:
    """Owns BGV-specific lazy per-level tables for one context."""

    def __init__(self, context: FheContext):
        if context.params.plain_modulus is None:
            raise ValueError("BGV requires a plain modulus")
        self.context = context
        self.t = context.params.plain_modulus
        self._tables: dict[int, BgvLevelTables] = {}
        self._jit_cache: dict = {}

    def level_tables(self, chain_index: int) -> BgvLevelTables:
        tab = self._tables.get(chain_index)
        if tab is None:
            tab = self._build(chain_index)
            self._tables[chain_index] = tab
        return tab

    def _build(self, chain_index: int) -> BgvLevelTables:
        level = self.context.level(chain_index)
        t = self.t.value
        qs = level.base.values
        conv = BaseConverter(level.base, RNSBase((self.t,)))
        if len(qs) > 1:
            q_last = qs[-1]
            inv_t_mod_q_last = numth.invert_mod(t % q_last, q_last)
            t_mod_rest = _col([t % q for q in qs[:-1]])
            t_q_last_mod_rest = _col([(t * q_last) % q for q in qs[:-1]])
        else:
            inv_t_mod_q_last = None
            t_mod_rest = t_q_last_mod_rest = None
        return BgvLevelTables(
            qhatinv_mod_q=_col(level.base.q_hat_inv_mod_q),
            qhatinv_mod_q_shoup=_shoup_col(level.base.q_hat_inv_mod_q, qs),
            qhat_mod_t=np.asarray(conv.q_hat_mod_p, dtype=np.uint64),
            q_mod_t=level.base.big_modulus % t,
            plain_upper_half_threshold=(t + 1) >> 1,
            plain_upper_half_increment=_col([q - t for q in qs]),
            inv_t_mod_q_last=inv_t_mod_q_last,
            t_mod_rest=t_mod_rest,
            t_q_last_mod_rest=t_q_last_mod_rest,
        )

    # -- plaintext lift ------------------------------------------------------
    def lift_plain_to_q(self, level: ContextLevel, m: W64) -> W64:
        """Centered lift m (1, N) mod t -> (k, N) mod q_i."""
        tab = self.level_tables(level.chain_index)
        thr = _scalar_w64(tab.plain_upper_half_threshold)
        inc = w64.as_w64(tab.plain_upper_half_increment)
        shape = (level.size, m.shape[-1])
        mb = w64.broadcast_to(m, shape)
        lifted = w64.add(mb, w64.broadcast_to(inc, shape))
        return w64.where(w64.geq(mb, thr), lifted, mb)

    # -- exact centered RNS -> t conversion (device) --------------------------
    def exact_convert_to_t(self, level: ContextLevel, x: W64) -> W64:
        """[X]_t for the centered X = CRT(x), X in (-Q/2, Q/2]
        (reference exact_convert_array, src/rns.cu; rounding recovers both
        the fast-conversion overshoot and the centered representative)."""
        tab = self.level_tables(level.chain_index)
        q, rlo, rhi = level.mod.q, level.mod.ratio_lo, level.mod.ratio_hi
        t_q, t_rlo, t_rhi = _mod_arrays(self.t)
        xhat = w64.mul_mod_shoup(
            x, tab.qhatinv_mod_q, tab.qhatinv_mod_q_shoup, q
        )  # (..., k, N)
        k = xhat.shape[-2]
        # alpha' = round(sum_i xhat_i / q_i) via 64.64 fixed point:
        # s_i = floor(xhat_i * floor(2^128/q_i) / 2^64) < 2^65
        shape = xhat.shape[:-2] + (1, xhat.shape[-1])
        acc_hi = w64.zeros(shape)
        acc_lo = w64.zeros(shape)
        rlo_h = np.asarray(rlo)
        rhi_h = np.asarray(rhi)
        for i in range(k):
            xi = xhat[..., i:i + 1, :]
            h1, l1 = w64.mul_u64_full(xi, w64.as_w64(rhi_h[i:i + 1]))
            cross = w64.mul_u64_hi(xi, w64.as_w64(rlo_h[i:i + 1]))
            acc_hi, acc_lo = w64.add_u128(acc_hi, acc_lo, h1, l1)
            acc_hi, acc_lo = w64.add_u128(
                acc_hi, acc_lo, w64.zeros(shape), cross
            )
        acc_hi, _ = w64.add_u128(
            acc_hi, acc_lo, w64.zeros(shape), _full_half(shape)
        )
        alpha = acc_hi  # (..., 1, N), < k
        conv = bconv_matmul(xhat, tab.qhat_mod_t, t_q, t_rlo, t_rhi)
        corr = w64.mul_mod(
            alpha, _scalar_w64(tab.q_mod_t), t_q, t_rlo, t_rhi
        )
        return w64.sub_mod(conv, corr, t_q)

    # -- encryption ------------------------------------------------------------
    def encrypt_symmetric(self, sk: SecretKey, m: Plaintext) -> Ciphertext:
        level = self.context.level(m.chain_index)
        fn = self._jit(("lift", m.chain_index), self._lift_ntt, level)
        pt = Plaintext(
            data=fn(m.data), chain_index=m.chain_index, is_ntt_form=True
        )
        return sk.encrypt_symmetric(pt)

    def encrypt_asymmetric(self, pk: PublicKey, m: Plaintext, rng_key) -> Ciphertext:
        level = self.context.level(m.chain_index)
        fn = self._jit(("lift", m.chain_index), self._lift_ntt, level)
        pt = Plaintext(
            data=fn(m.data), chain_index=m.chain_index, is_ntt_form=True
        )
        return encrypt_asymmetric(self.context, pk, pt, rng_key)

    def _lift_ntt(self, level: ContextLevel, m: W64) -> W64:
        return forward_ntt(self.lift_plain_to_q(level, m), level.ntt)

    # -- decryption --------------------------------------------------------------
    def decrypt(self, sk: SecretKey, ct: Ciphertext) -> Plaintext:
        level = self.context.level(ct.chain_index)
        fn = self._jit(
            ("dec", ct.chain_index, ct.size), self._decrypt_impl, level
        )
        cf_inv = numth.invert_mod(
            ct.correction_factor % self.t.value, self.t.value
        )
        data = fn(ct.data, sk.s_ntt, w64.as_w64(np.asarray([[cf_inv]], np.uint64)))
        return Plaintext(data=data, chain_index=ct.chain_index, is_ntt_form=False)

    def _decrypt_impl(
        self, level: ContextLevel, ct_data: W64, s_ntt: W64, cf_inv: W64
    ) -> W64:
        idx = jnp.asarray(list(level.limb_indices))
        s = s_ntt[idx]
        q, rlo, rhi = level.mod.q, level.mod.ratio_lo, level.mod.ratio_hi
        size = ct_data.shape[0]
        acc = ct_data[size - 1]
        for i in range(size - 2, -1, -1):
            acc = w64.mul_mod(acc, s, q, rlo, rhi)
            acc = w64.add_mod(acc, ct_data[i], q)
        x = inverse_ntt(acc, level.ntt)
        m = self.exact_convert_to_t(level, x)
        t_q, t_rlo, t_rhi = _mod_arrays(self.t)
        return w64.mul_mod(m, cf_inv, t_q, t_rlo, t_rhi)

    # -- jit cache ------------------------------------------------------------------
    def _jit(self, key, fn, level: ContextLevel):
        cached = self._jit_cache.get(key)
        if cached is None:
            cached = jax.jit(lambda *args: fn(level, *args))
            self._jit_cache[key] = cached
        return cached


def _full_half(shape) -> W64:
    """2^63 as a W64 constant of the given shape."""
    return W64(
        jnp.zeros(shape, dtype=jnp.uint32),
        jnp.full(shape, 1 << 31, dtype=jnp.uint32),
    )
