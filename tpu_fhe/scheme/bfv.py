"""BFV scheme tools: Delta-scaling encryption, BEHZ decrypt, noise budget.

TPU-native counterpart of the reference's BFV plumbing:
  * encrypt adds Delta*m + fix to c0 (multiply_add_plain_with_scaling_variant,
    /root/reference/src/scalingvariant.cu:10-34) with the exact rounding
    correction fix = round(m*(Q mod t)/t) computed modularly (no division);
  * decrypt computes x = [c0 + c1 s]_Q then scale&rounds by t/Q via the
    BEHZ {t, gamma} correction (behz_decrypt_scale_and_round,
    /root/reference/src/rns.cu; SEAL heritage) entirely on device;
  * invariant_noise_budget mirrors /root/reference/src/secretkey.cu:865-953
    (host CRT compose of t*x, centered norm).

BFV ciphertexts are coefficient-form (is_ntt_form=False); all device math
is u32-pair (W64) exactly like the CKKS path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..core import numth
from ..core.modulus import Modulus
from ..core.ntt_tables import compute_shoup, make_ntt_tables
from ..core.rns import BaseConverter, RNSBase
from ..ops import w64
from ..ops.ntt import build_device_ntt_tables, forward_ntt, inverse_ntt
from ..ops.w64 import W64
from .ciphertext import Ciphertext, Plaintext
from .context import ContextLevel, FheContext
from .keys import SecretKey, PublicKey, encrypt_asymmetric


def _col(values) -> np.ndarray:
    return np.asarray([[int(v)] for v in values], dtype=np.uint64)


def _shoup_col(values, mods) -> np.ndarray:
    return _col([compute_shoup(int(v), int(m)) for v, m in zip(values, mods)])


@dataclass(frozen=True)
class BfvLevelTables:
    """Per-level Delta/plain-lift tables (host numpy; consumed as jit consts).

    Mirrors the reference context's coeff_div_plain / plain upper-half
    tables (src/context.cu:43-113)."""

    # floor(Q/t) mod q_i, (k, 1) + Shoup
    coeff_div_plain: np.ndarray
    coeff_div_plain_shoup: np.ndarray
    q_mod_t: int                      # Q mod t
    negQ_mod_t: int                   # (-Q) mod t  (BGV decrypt correction)
    inv_q_mod_t: int                  # Q^{-1} mod t (BGV)
    inv_t_mod_q: np.ndarray           # t^{-1} mod q_i, (k, 1) + Shoup
    inv_t_mod_q_shoup: np.ndarray
    t_mod_q: np.ndarray               # t mod q_i, (k, 1) + Shoup
    t_mod_q_shoup: np.ndarray
    # plain lift: c < (t+1)/2 ? c : c + (q_i - t)
    plain_upper_half_threshold: int
    plain_upper_half_increment: np.ndarray  # (k, 1) q_i - t
    # decrypt {t, gamma} tables
    qhatinv_mod_q: np.ndarray         # (k, 1) qhat_i^{-1} mod q_i + Shoup
    qhatinv_mod_q_shoup: np.ndarray
    gamma: Modulus
    gamma_t_mod_q: np.ndarray         # (k,1) gamma*t mod q_i + Shoup
    gamma_t_mod_q_shoup: np.ndarray
    qhat_mod_t: np.ndarray            # (1, k)
    qhat_mod_gamma: np.ndarray        # (1, k)
    neg_inv_q_mod_t: int
    neg_inv_q_mod_gamma: int
    inv_gamma_mod_t: int


@dataclass(frozen=True)
class BehzTables:
    """Per-level BEHZ multiplication bases/tables (base B, m_sk, m_tilde).

    Mirrors the reference DRNSTool BEHZ members (include/rns.cuh:14-148)."""

    base_B: RNSBase
    m_sk: Modulus
    base_Bsk: RNSBase                 # B + m_sk
    bsk_ntt: object                   # DeviceNTTTables for Bsk
    bsk_q: np.ndarray                 # (kb, 1) moduli + Barrett ratios
    bsk_rlo: np.ndarray
    bsk_rhi: np.ndarray
    # q -> Bsk U {m_tilde}
    mtilde_qhatinv_mod_q: np.ndarray  # (k,1) [m_tilde * qhat_i^{-1}]_{q_i} + Shoup
    mtilde_qhatinv_mod_q_shoup: np.ndarray
    qhat_mod_bsk: np.ndarray          # (kb, k)
    qhat_mod_mtilde: np.ndarray       # (k,) uint32
    neg_inv_q_mod_mtilde: np.uint32
    q_mod_bsk: np.ndarray             # (kb, 1) Q mod b + Shoup-free
    inv_mtilde_mod_bsk: np.ndarray    # (kb, 1) + Shoup
    inv_mtilde_mod_bsk_shoup: np.ndarray
    # fast floor
    qhatinv_mod_q: np.ndarray         # (k,1) qhat_i^{-1} mod q_i + Shoup
    qhatinv_mod_q_shoup: np.ndarray
    inv_q_mod_bsk: np.ndarray         # (kb, 1) + Shoup
    inv_q_mod_bsk_shoup: np.ndarray
    t_mod_bsk: np.ndarray             # (kb, 1) + Shoup
    t_mod_bsk_shoup: np.ndarray
    # fastbconv_sk: B -> q via m_sk
    bhatinv_mod_b: np.ndarray         # (k, 1) + Shoup
    bhatinv_mod_b_shoup: np.ndarray
    bhat_mod_q: np.ndarray            # (k_out=k, k_in=k)
    bhat_mod_msk: np.ndarray          # (1, k)
    inv_b_mod_msk: int
    b_mod_q: np.ndarray               # (k, 1) prod(B) mod q_i
    b_msk_mod_q: np.ndarray           # (k, 1) prod(B)*m_sk mod q_i


@dataclass(frozen=True)
class HpsConv:
    """Exact (centered) HPS base conversion ibase -> obase
    (reference bConv_HPS tables: QHatInvModq, QHatModp, alphaQModp, qiInv
    — include/host/rns.h BaseConverter + src/rns_bconv.cu:354-372).  The
    f64 qiInv of the reference is carried as 128-bit fixed point."""

    qhatinv: np.ndarray          # (k, 1) [qhat_i^{-1}]_{q_i} + Shoup
    qhatinv_shoup: np.ndarray
    q: np.ndarray                # (k, 1) input moduli
    qinv_hi: np.ndarray          # (k, 1) fixed-point words of 1/q_i
    qinv_lo: np.ndarray
    qhat_mod_p: np.ndarray       # (m, k)
    alpha_q_mod_p: np.ndarray    # (k+1, m) [v*Q]_{p_j}
    p: np.ndarray                # (m, 1) output moduli + Barrett ratios
    p_rlo: np.ndarray
    p_rhi: np.ndarray

    def apply(self, x):
        from ..ops.bconv import bconv_hps

        return bconv_hps(
            x, self.qhatinv, self.qhatinv_shoup, self.q,
            self.qinv_hi, self.qinv_lo, self.qhat_mod_p,
            self.alpha_q_mod_p, self.p, self.p_rlo, self.p_rhi,
        )


@dataclass(frozen=True)
class SRTables:
    """One scaleAndRound_HPS_* table set: out_j = sum_i a_i*cross[j,i]
    + b_j*diag[j] + round(sum_i a_i*frac_i) over the output base."""

    cross: np.ndarray            # (m, k)
    diag: np.ndarray             # (m, 1)
    frac_hi: np.ndarray          # (k, 1)
    frac_lo: np.ndarray
    p: np.ndarray                # (m, 1) + ratios
    p_rlo: np.ndarray
    p_rhi: np.ndarray

    def apply(self, x_a, x_b):
        from ..ops.bconv import scale_and_round_hps

        return scale_and_round_hps(
            x_a, x_b, self.cross, self.diag, self.frac_hi, self.frac_lo,
            self.p, self.p_rlo, self.p_rhi,
        )


@dataclass(frozen=True)
class HpsTables:
    """Per-(level, levelsDropped) HPS multiplication tables (reference
    DRNSTool HPS members, src/rns.cu:686-981)."""

    levels_dropped: int
    base_ql: RNSBase
    base_rl: RNSBase
    ql_ntt: object               # DeviceNTTTables for Ql (tensor base prefix)
    qlrl_ntt: object             # DeviceNTTTables for Ql ++ Rl
    qlrl_q: np.ndarray           # (k+m, 1) + ratios
    qlrl_rlo: np.ndarray
    qlrl_rhi: np.ndarray
    ql_to_rl: HpsConv
    rl_to_ql: HpsConv
    # t/Q (hps: QR->R) or t/Rl (overq: QlRl->Ql) scale&round
    sr: SRTables
    # overq ct2 lift (bConv_BEHZ_var1: negPQHatInvModq scale + QInvModp matmul)
    var1_scale: np.ndarray | None       # (k_src, 1) + Shoup
    var1_scale_shoup: np.ndarray | None
    var1_matrix: np.ndarray | None      # (m, k_src) q_i^{-1} mod r_j
    var1_q: np.ndarray | None           # (k_src, 1) source moduli
    # leveled: Q -> Ql scale&round + CRT re-expansion
    qq_sr: SRTables | None
    expand_mod_ql: np.ndarray | None    # (k, 1) [QlDrop]_{q_i} + Shoup
    expand_mod_ql_shoup: np.ndarray | None


def _fix128(num: int, den: int) -> tuple[int, int]:
    """(hi, lo) u64 words of floor(num/den * 2^128) for 0 <= num < den."""
    v = (num << 128) // den
    return v >> 64, v & ((1 << 64) - 1)


def _fix_cols(nums, dens) -> tuple[np.ndarray, np.ndarray]:
    pairs = [_fix128(int(n), int(d)) for n, d in zip(nums, dens)]
    return (_col([p[0] for p in pairs]), _col([p[1] for p in pairs]))


class BfvTools:
    """Owns BFV-specific lazy per-level tables for one context."""

    def __init__(self, context: FheContext):
        if context.params.plain_modulus is None:
            raise ValueError("BFV requires a plain modulus")
        self.context = context
        self.t = context.params.plain_modulus
        self._level_tables: dict[int, BfvLevelTables] = {}
        self._behz: dict[int, BehzTables] = {}
        self._hps: dict[tuple[int, int], HpsTables] = {}
        self._jit_cache: dict = {}

    # -- table builders ---------------------------------------------------
    def level_tables(self, chain_index: int) -> BfvLevelTables:
        tab = self._level_tables.get(chain_index)
        if tab is None:
            tab = self._build_level_tables(chain_index)
            self._level_tables[chain_index] = tab
        return tab

    def _build_level_tables(self, chain_index: int) -> BfvLevelTables:
        level = self.context.level(chain_index)
        t = self.t.value
        qs = level.base.values
        big_q = level.base.big_modulus
        delta = big_q // t
        # gamma: word-size prime coprime to t and every q_i (not on the NTT
        # chain; only used for the decrypt correction, no transform needed)
        gamma = Modulus(_find_coprime_prime(61, exclude=set(qs) | {t}))
        g = gamma.value
        conv = BaseConverter(level.base, RNSBase((self.t, gamma)))
        qhat_mod_tg = np.asarray(conv.q_hat_mod_p, dtype=np.uint64)  # (2, k)
        return BfvLevelTables(
            coeff_div_plain=_col([delta % q for q in qs]),
            coeff_div_plain_shoup=_shoup_col([delta % q for q in qs], qs),
            q_mod_t=big_q % t,
            negQ_mod_t=(-big_q) % t,
            inv_q_mod_t=numth.invert_mod(big_q % t, t),
            inv_t_mod_q=_col([numth.invert_mod(t % q, q) for q in qs]),
            inv_t_mod_q_shoup=_shoup_col(
                [numth.invert_mod(t % q, q) for q in qs], qs
            ),
            t_mod_q=_col([t % q for q in qs]),
            t_mod_q_shoup=_shoup_col([t % q for q in qs], qs),
            plain_upper_half_threshold=(t + 1) >> 1,
            plain_upper_half_increment=_col([q - t for q in qs]),
            qhatinv_mod_q=_col(level.base.q_hat_inv_mod_q),
            qhatinv_mod_q_shoup=_shoup_col(level.base.q_hat_inv_mod_q, qs),
            gamma=gamma,
            gamma_t_mod_q=_col([(g * t) % q for q in qs]),
            gamma_t_mod_q_shoup=_shoup_col([(g * t) % q for q in qs], qs),
            qhat_mod_t=qhat_mod_tg[0:1],
            qhat_mod_gamma=qhat_mod_tg[1:2],
            neg_inv_q_mod_t=(-numth.invert_mod(big_q % t, t)) % t,
            neg_inv_q_mod_gamma=(-numth.invert_mod(big_q % g, g)) % g,
            inv_gamma_mod_t=numth.invert_mod(g % t, t),
        )

    def behz(self, chain_index: int) -> BehzTables:
        tab = self._behz.get(chain_index)
        if tab is None:
            tab = self._build_behz(chain_index)
            self._behz[chain_index] = tab
        return tab

    def _build_behz(self, chain_index: int) -> BehzTables:
        ctx = self.context
        level = ctx.level(chain_index)
        n = ctx.n
        t = self.t.value
        qs = level.base.values
        k = len(qs)
        big_q = level.base.big_modulus
        m_tilde = 1 << 32

        # base B: k NTT-friendly 60-bit primes disjoint from QP and t;
        # m_sk: one more (reference picks them the same way, SEAL heritage).
        exclude = {m.value for m in ctx.key_modulus} | {t}
        extra = _find_ntt_primes(n, 60, k + 1, exclude)
        base_B = RNSBase(tuple(Modulus(p) for p in extra[:k]))
        m_sk = Modulus(extra[k])
        base_Bsk = base_B.extend(m_sk)
        bsk_vals = base_Bsk.values
        big_b = base_B.big_modulus

        host_ntt = [make_ntt_tables(ctx.params.log_n, p) for p in bsk_vals]
        bsk_ntt = build_device_ntt_tables(host_ntt).to_device()

        conv_q_bsk = BaseConverter(level.base, base_Bsk)
        conv_b_q = BaseConverter(base_B, level.base)
        conv_b_msk = BaseConverter(base_B, RNSBase((m_sk,)))

        qhatinv = level.base.q_hat_inv_mod_q
        mtilde_qhatinv = [(m_tilde * v) % q for v, q in zip(qhatinv, qs)]
        inv_q_mod_bsk = [numth.invert_mod(big_q % b, b) for b in bsk_vals]
        inv_mtilde_mod_bsk = [numth.invert_mod(m_tilde % b, b) for b in bsk_vals]

        bsk_mods = base_Bsk.base
        return BehzTables(
            base_B=base_B,
            m_sk=m_sk,
            base_Bsk=base_Bsk,
            bsk_ntt=bsk_ntt,
            bsk_q=_col(bsk_vals),
            bsk_rlo=_col([m.const_ratio[0] for m in bsk_mods]),
            bsk_rhi=_col([m.const_ratio[1] for m in bsk_mods]),
            mtilde_qhatinv_mod_q=_col(mtilde_qhatinv),
            mtilde_qhatinv_mod_q_shoup=_shoup_col(mtilde_qhatinv, qs),
            qhat_mod_bsk=np.asarray(conv_q_bsk.q_hat_mod_p, dtype=np.uint64),
            qhat_mod_mtilde=np.asarray(
                [qh % m_tilde for qh in level.base.punctured_products],
                dtype=np.uint32,
            ),
            neg_inv_q_mod_mtilde=np.uint32(
                (-numth.invert_mod(big_q % m_tilde, m_tilde)) % m_tilde
            ),
            q_mod_bsk=_col([big_q % b for b in bsk_vals]),
            inv_mtilde_mod_bsk=_col(inv_mtilde_mod_bsk),
            inv_mtilde_mod_bsk_shoup=_shoup_col(inv_mtilde_mod_bsk, bsk_vals),
            qhatinv_mod_q=_col(qhatinv),
            qhatinv_mod_q_shoup=_shoup_col(qhatinv, qs),
            inv_q_mod_bsk=_col(inv_q_mod_bsk),
            inv_q_mod_bsk_shoup=_shoup_col(inv_q_mod_bsk, bsk_vals),
            t_mod_bsk=_col([t % b for b in bsk_vals]),
            t_mod_bsk_shoup=_shoup_col([t % b for b in bsk_vals], bsk_vals),
            bhatinv_mod_b=_col(base_B.q_hat_inv_mod_q),
            bhatinv_mod_b_shoup=_shoup_col(base_B.q_hat_inv_mod_q, base_B.values),
            bhat_mod_q=np.asarray(conv_b_q.q_hat_mod_p, dtype=np.uint64),
            bhat_mod_msk=np.asarray(conv_b_msk.q_hat_mod_p, dtype=np.uint64),
            inv_b_mod_msk=numth.invert_mod(big_b % m_sk.value, m_sk.value),
            b_mod_q=_col([big_b % q for q in qs]),
            b_msk_mod_q=_col([(big_b * m_sk.value) % q for q in qs]),
        )

    # -- HPS multiplication tables ------------------------------------------
    def hps(self, chain_index: int, levels_dropped: int = 0) -> HpsTables:
        key = (chain_index, levels_dropped)
        tab = self._hps.get(key)
        if tab is None:
            tab = self._build_hps(chain_index, levels_dropped)
            self._hps[key] = tab
        return tab

    def _hps_conv(self, ib: RNSBase, ob: RNSBase) -> HpsConv:
        conv = BaseConverter(ib, ob)
        ob_mods = ob.base
        return HpsConv(
            qhatinv=_col(ib.q_hat_inv_mod_q),
            qhatinv_shoup=_shoup_col(ib.q_hat_inv_mod_q, ib.values),
            q=_col(ib.values),
            qinv_hi=_fix_cols([1] * len(ib), ib.values)[0],
            qinv_lo=_fix_cols([1] * len(ib), ib.values)[1],
            qhat_mod_p=np.asarray(conv.q_hat_mod_p, dtype=np.uint64),
            alpha_q_mod_p=np.asarray(conv.alpha_q_mod_p, dtype=np.uint64),
            p=_col(ob.values),
            p_rlo=_col([m.const_ratio[0] for m in ob_mods]),
            p_rhi=_col([m.const_ratio[1] for m in ob_mods]),
        )

    @staticmethod
    def _scale_round_tables(s_base: RNSBase, mult: int,
                            a_idx: list[int], b_idx: list[int]) -> SRTables:
        """Tables for out_j = round(mult/prod(a) * x) over base {s_b}:
        num_i = mult * (S/s_i)^{-1} mod s_i-free big product; see
        scaleAndRound_HPS kernels (src/rns.cu:1700-1810)."""
        s = s_base.values
        nums = [mult * s_base.q_hat_inv_mod_q[i] for i in range(len(s))]
        cross = [
            [(nums[i] // s[i]) % s[j] for i in a_idx]
            for j in b_idx
        ]
        diag = [(nums[j] // s[j]) % s[j] for j in b_idx]
        fh, fl = _fix_cols([nums[i] % s[i] for i in a_idx],
                           [s[i] for i in a_idx])
        ob = [s_base.base[j] for j in b_idx]
        return SRTables(
            cross=np.asarray(cross, dtype=np.uint64),
            diag=_col(diag),
            frac_hi=fh, frac_lo=fl,
            p=_col([m.value for m in ob]),
            p_rlo=_col([m.const_ratio[0] for m in ob]),
            p_rhi=_col([m.const_ratio[1] for m in ob]),
        )

    def _build_hps(self, chain_index: int, levels_dropped: int) -> HpsTables:
        """HPS/HPSOverQ(Leveled) tables (reference src/rns.cu:686-981)."""
        from ..core.params import MulTech

        ctx = self.context
        mul_tech = ctx.params.mul_tech
        level = ctx.level(chain_index)
        base_q = level.base                       # full data base Q
        size_q = len(base_q)
        size_ql = size_q - levels_dropped
        if size_ql < 1:
            raise ValueError("levels_dropped leaves no data prime")
        base_ql = RNSBase(tuple(base_q.base[:size_ql]))
        t = self.t.value

        # Rl: NTT primes strictly below min(Q); size k+1 for plain HPS
        # (t/Q scale&round needs R > Q), k for the overQ variants.
        size_rl = size_ql + 1 if mul_tech == MulTech.hps else size_ql
        min_q = min(base_q.values)
        rl_vals = numth.get_primes_below(ctx.n, min_q, size_rl)
        base_rl = RNSBase(tuple(Modulus(p) for p in rl_vals))
        qlrl_vals = list(base_ql.values) + rl_vals
        qlrl_mods = list(base_ql.base) + list(base_rl.base)

        log_n = ctx.params.log_n
        host_ntt = [make_ntt_tables(log_n, p) for p in qlrl_vals]
        qlrl_ntt = build_device_ntt_tables(host_ntt).to_device()
        ql_ntt = build_device_ntt_tables(host_ntt[:size_ql]).to_device()

        base_qlrl = RNSBase(tuple(qlrl_mods))
        if mul_tech == MulTech.hps:
            # t/Q scale&round: S = Ql ++ Rl, a = Ql limbs, b = Rl limbs
            sr = self._scale_round_tables(
                base_qlrl, t * base_rl.big_modulus,
                list(range(size_ql)), list(range(size_ql, size_ql + size_rl)),
            )
        else:
            # t/Rl scale&round: a = Rl limbs, b = Ql limbs
            sr = self._scale_round_tables(
                base_qlrl, t * base_ql.big_modulus,
                list(range(size_ql, size_ql + size_rl)), list(range(size_ql)),
            )

        var1_scale = var1_shoup = var1_matrix = var1_q = None
        if mul_tech in (MulTech.hps_overq, MulTech.hps_overq_leveled):
            # ct2 lift source base: full Q when levels were dropped
            src = base_q if levels_dropped else base_ql
            p_big = base_rl.big_modulus
            scale = [
                (q - (p_big * hinv) % q) % q
                for hinv, q in zip(src.q_hat_inv_mod_q, src.values)
            ]
            var1_scale = _col(scale)
            var1_shoup = _shoup_col(scale, src.values)
            var1_matrix = np.asarray(
                [[numth.invert_mod(q % r, r) for q in src.values]
                 for r in rl_vals], dtype=np.uint64)
            var1_q = _col(src.values)

        qq_sr = expand = expand_shoup = None
        if levels_dropped:
            # Ql/Q scale&round over base Q (a = dropped limbs, b = Ql limbs)
            qq_sr = self._scale_round_tables(
                base_q, base_ql.big_modulus,
                list(range(size_ql, size_q)), list(range(size_ql)),
            )
            drop_big = 1
            for v in base_q.values[size_ql:]:
                drop_big *= v
            exp = [drop_big % q for q in base_ql.values]
            expand = _col(exp)
            expand_shoup = _shoup_col(exp, base_ql.values)

        return HpsTables(
            levels_dropped=levels_dropped,
            base_ql=base_ql,
            base_rl=base_rl,
            ql_ntt=ql_ntt,
            qlrl_ntt=qlrl_ntt,
            qlrl_q=_col(qlrl_vals),
            qlrl_rlo=_col([m.const_ratio[0] for m in qlrl_mods]),
            qlrl_rhi=_col([m.const_ratio[1] for m in qlrl_mods]),
            ql_to_rl=self._hps_conv(base_ql, base_rl),
            rl_to_ql=self._hps_conv(base_rl, base_ql),
            sr=sr,
            var1_scale=var1_scale,
            var1_scale_shoup=var1_shoup,
            var1_matrix=var1_matrix,
            var1_q=var1_q,
            qq_sr=qq_sr,
            expand_mod_ql=expand,
            expand_mod_ql_shoup=expand_shoup,
        )

    def find_levels_to_drop(self, mult_depth: int, is_keyswitch: bool,
                            is_asymmetric: bool) -> int:
        """Noise-model heuristic for hps_overq_leveled
        (reference FindLevelsToDrop, src/evaluate.cu:638-743)."""
        import math

        ctx = self.context
        n = ctx.n
        level = ctx.level(1)
        size_q = len(level.base)
        size_p = ctx.params.special_modulus_size
        num_part_q = -(-size_q // size_p)         # keyswitch digit count beta
        dcrt_bits = max(v.bit_length() for v in level.base.values)

        sigma = 3.2
        assurance = 36.0
        p = float(self.t.value)
        b_key = 1.0
        b_err = sigma * math.sqrt(assurance)
        delta = 2.0 * math.sqrt(n)

        def vnorm():
            if is_asymmetric:
                return (1.0 + delta * b_key) / 2.0
            return b_err * (1.0 + 2.0 * delta * b_key)

        def noise_ks():
            return size_p * (num_part_q * delta * b_err + delta * b_key + 1.0) / 2.0

        c1 = delta * delta * p * b_key
        c2 = delta * delta * b_key * b_key / 2.0 + noise_ks()

        def logq_bfv():
            if mult_depth > 0:
                return (math.log(4 * p) + (mult_depth - 1) * math.log(c1)
                        + math.log(c1 * vnorm() + mult_depth * c2))
            return math.log(p * 4.0 * vnorm())

        logq_prev = 6.0 * math.log(10)
        logq = logq_bfv()
        while abs(logq - logq_prev) > math.log(1.001):
            logq_prev = logq
            logq = logq_bfv()

        loge = logq / math.log(2) - 2 - math.log2(p)
        log_extra = (math.log2(noise_ks()) if is_keyswitch
                     else math.log2(delta))
        levels = math.floor((loge - 2 * mult_depth - 16 - log_extra) / dcrt_bits)
        return max(0, min(levels, size_q - 1))

    # -- plaintext scaling (Delta * m + fix) -------------------------------
    def scale_plain_to_q(self, level: ContextLevel, m: W64) -> W64:
        """m (1, N) mod t -> (k, N) residues of round(m * Q / t) mod q_i.

        round(mQ/t) = m*floor(Q/t) + fix, fix = floor((m*(Q mod t) + t/2)/t)
        computed exactly via fix mod q = (x - [x]_t) * t^{-1} mod q."""
        tab = self.level_tables(level.chain_index)
        q, rlo, rhi = level.mod.q, level.mod.ratio_lo, level.mod.ratio_hi
        prod = w64.mul_mod_shoup(
            m, tab.coeff_div_plain, tab.coeff_div_plain_shoup, q
        )  # (k, N)
        # x = m * (Q mod t) + floor(t/2), a 128-bit quantity
        hi, lo = w64.mul_u64_full(m, _scalar_w64(tab.q_mod_t))
        half_t = self.t.value >> 1
        hi, lo = w64.add_u128(hi, lo, w64.zeros(lo.shape), _full_w64(lo.shape, half_t))
        x_mod_q = w64.barrett_reduce_u128(hi, lo, q, rlo, rhi)       # (k, N)
        t_q, t_rlo, t_rhi = _mod_arrays(self.t)
        x_mod_t = w64.barrett_reduce_u128(hi, lo, t_q, t_rlo, t_rhi)  # (1, N)
        # reduce x_mod_t into each q_i (t may exceed a small q_i)
        x_mod_t_q = w64.barrett_reduce_u64(x_mod_t, q, rhi)
        fix = w64.mul_mod_shoup(
            w64.sub_mod(x_mod_q, x_mod_t_q, q),
            tab.inv_t_mod_q, tab.inv_t_mod_q_shoup, q,
        )
        return w64.add_mod(prod, fix, q)

    def lift_plain_to_q(self, level: ContextLevel, m: W64) -> W64:
        """Centered lift m (1, N) mod t -> (k, N) mod q_i: coefficients
        above t/2 map to q_i - (t - c) (plain_upper_half lift)."""
        tab = self.level_tables(level.chain_index)
        thr = _scalar_w64(tab.plain_upper_half_threshold)
        inc = w64.as_w64(tab.plain_upper_half_increment)
        shape = (level.size, m.shape[-1])
        mb = w64.broadcast_to(m, shape)
        lifted = w64.add(mb, w64.broadcast_to(inc, shape))
        return w64.where(w64.geq(mb, thr), lifted, mb)

    # -- encryption ---------------------------------------------------------
    def encrypt_symmetric(self, sk: SecretKey, pt: Plaintext) -> Ciphertext:
        """BFV symmetric encryption: coefficient-form (Delta m + b, a)."""
        level = self.context.level(pt.chain_index)
        zero = sk.encrypt_zero_symmetric(pt.chain_index)
        fn = self._jit(("enc", pt.chain_index), self._finish_encrypt, level)
        return zero.with_data(fn(zero.data, pt.data))

    def encrypt_asymmetric(
        self, pk: PublicKey, pt: Plaintext, rng_key
    ) -> Ciphertext:
        level = self.context.level(pt.chain_index)
        zero_pt = Plaintext(
            data=w64.zeros((level.size, self.context.n)),
            chain_index=pt.chain_index, is_ntt_form=True,
        )
        zero = encrypt_asymmetric(self.context, pk, zero_pt, rng_key)
        fn = self._jit(("enc", pt.chain_index), self._finish_encrypt, level)
        ct = zero.with_data(fn(zero.data, pt.data))
        return ct

    def _finish_encrypt(self, level: ContextLevel, zero_ntt: W64, m: W64) -> W64:
        zero_coeff = inverse_ntt(zero_ntt, level.ntt)
        dm = self.scale_plain_to_q(level, m)
        c0 = w64.add_mod(zero_coeff[0], dm, level.mod.q)
        return w64.concat([c0[None], zero_coeff[1:]], axis=0)

    # -- decryption ----------------------------------------------------------
    def decrypt(self, sk: SecretKey, ct: Ciphertext) -> Plaintext:
        level = self.context.level(ct.chain_index)
        fn = self._jit(
            ("dec", ct.chain_index, ct.size), self._decrypt_impl, level
        )
        data = fn(ct.data, sk.s_ntt)
        return Plaintext(
            data=data, chain_index=ct.chain_index, is_ntt_form=False
        )

    def _dot_with_secret(self, level: ContextLevel, ct_data: W64, s_ntt: W64) -> W64:
        """x = [c0 + c1 s + c2 s^2 ...]_Q in coefficient form, (k, N)."""
        idx = jnp.asarray(list(level.limb_indices))
        s = s_ntt[idx]
        q, rlo, rhi = level.mod.q, level.mod.ratio_lo, level.mod.ratio_hi
        size = ct_data.shape[0]
        acc = forward_ntt(ct_data[size - 1], level.ntt)
        for i in range(size - 2, -1, -1):
            acc = w64.mul_mod(acc, s, q, rlo, rhi)
            acc = w64.add_mod(acc, forward_ntt(ct_data[i], level.ntt), q)
        return inverse_ntt(acc, level.ntt)

    def _decrypt_impl(self, level: ContextLevel, ct_data: W64, s_ntt: W64) -> W64:
        x = self._dot_with_secret(level, ct_data, s_ntt)
        return self.scale_and_round_to_t(level, x)

    def scale_and_round_to_t(self, level: ContextLevel, x: W64) -> W64:
        """[round(t/Q * x)]_t via the BEHZ {t, gamma} correction, on device.

        Mirrors behz_decrypt_scale_and_round (/root/reference/src/rns.cu):
        convert [gamma t x]_Q to base {t, gamma}, multiply by -Q^{-1}, then
        remove the gamma factor with a centered correction."""
        tab = self.level_tables(level.chain_index)
        q = level.mod.q
        g = tab.gamma.value
        t_q, t_rlo, t_rhi = _mod_arrays(self.t)
        g_q, g_rlo, g_rhi = _mod_arrays(tab.gamma)

        y = w64.mul_mod_shoup(x, tab.gamma_t_mod_q, tab.gamma_t_mod_q_shoup, q)
        scaled = w64.mul_mod_shoup(
            y, tab.qhatinv_mod_q, tab.qhatinv_mod_q_shoup, q
        )
        conv_t = _matmul_mod(scaled, tab.qhat_mod_t, t_q, t_rlo, t_rhi)
        conv_g = _matmul_mod(scaled, tab.qhat_mod_gamma, g_q, g_rlo, g_rhi)
        temp_t = w64.mul_mod(
            conv_t, _scalar_w64(tab.neg_inv_q_mod_t), t_q, t_rlo, t_rhi
        )
        temp_g = w64.mul_mod(
            conv_g, _scalar_w64(tab.neg_inv_q_mod_gamma), g_q, g_rlo, g_rhi
        )
        # centered gamma correction
        g_div_2 = _scalar_w64(g >> 1)
        # (gamma - temp_g) mod t  and  temp_g mod t
        g_minus = w64.sub(_full_w64(temp_g.shape, g), temp_g)
        g_minus_t = w64.barrett_reduce_u64(g_minus, t_q, t_rhi)
        temp_g_t = w64.barrett_reduce_u64(temp_g, t_q, t_rhi)
        hi_branch = w64.add_mod(temp_t, g_minus_t, t_q)
        lo_branch = w64.sub_mod(temp_t, temp_g_t, t_q)
        corrected = w64.where(w64.gt(temp_g, g_div_2), hi_branch, lo_branch)
        return w64.mul_mod(
            corrected, _scalar_w64(tab.inv_gamma_mod_t), t_q, t_rlo, t_rhi
        )

    # -- noise budget (host CRT compose; debug metric) ----------------------
    def invariant_noise_budget(self, sk: SecretKey, ct: Ciphertext) -> int:
        """log2(Q / 2|v|) where v = [t * (c0 + c1 s)]_Q centered
        (reference: invariant_noise_budget, src/secretkey.cu:865-953)."""
        ctx = self.context
        level = ctx.level(ct.chain_index)
        t = self.t.value
        fn = self._jit(
            ("noise", ct.chain_index, ct.size),
            lambda lvl, data, s: w64.mul_mod_shoup(
                self._dot_with_secret(lvl, data, s),
                self.level_tables(lvl.chain_index).t_mod_q,
                self.level_tables(lvl.chain_index).t_mod_q_shoup,
                lvl.mod.q,
            ),
            level,
        )
        tx = np.asarray(fn(ct.data, sk.s_ntt).to_u64())   # (k, N)
        base = level.base
        big_q = base.big_modulus
        max_abs = 0
        for j in range(tx.shape[1]):
            v = base.compose([int(tx[i, j]) for i in range(tx.shape[0])])
            if v > big_q // 2:
                v = big_q - v
            if v > max_abs:
                max_abs = v
        if max_abs == 0:
            max_abs = 1
        return max(0, big_q.bit_length() - max_abs.bit_length() - 1)

    # -- jit cache -----------------------------------------------------------
    def _jit(self, key, fn, level: ContextLevel):
        cached = self._jit_cache.get(key)
        if cached is None:
            cached = jax.jit(lambda *args: fn(level, *args))
            self._jit_cache[key] = cached
        return cached


# -- helpers ------------------------------------------------------------------

def _scalar_w64(v: int) -> W64:
    return w64.as_w64(np.asarray([[v]], dtype=np.uint64))


def _full_w64(shape, v: int) -> W64:
    return w64.full_like_scalar(shape, v)


def _mod_arrays(m: Modulus):
    return (
        np.asarray([[m.value]], dtype=np.uint64),
        np.asarray([[m.const_ratio[0]]], dtype=np.uint64),
        np.asarray([[m.const_ratio[1]]], dtype=np.uint64),
    )


def _matmul_mod(scaled: W64, table: np.ndarray, p, p_rlo, p_rhi) -> W64:
    from ..ops.bconv import bconv_matmul

    return bconv_matmul(scaled, table, p, p_rlo, p_rhi)


def _find_coprime_prime(bit_size: int, exclude: set[int]) -> int:
    """Largest prime below 2^bit_size not in `exclude` (no NTT constraint)."""
    v = (1 << bit_size) - 1
    while v > 1 << (bit_size - 1):
        if v not in exclude and numth.is_prime(v):
            return v
        v -= 2
    raise RuntimeError("no qualifying prime found")


def _find_ntt_primes(n: int, bit_size: int, count: int, exclude: set[int]) -> list[int]:
    """NTT-friendly primes (= 1 mod 2n) of `bit_size` bits avoiding `exclude`."""
    from .. import native

    fast = native.find_ntt_primes(n, bit_size, count, exclude)
    if fast is not None:
        return fast
    factor = 2 * n
    value = (1 << bit_size) - factor + 1
    out: list[int] = []
    while len(out) < count and value > 1 << (bit_size - 1):
        if value not in exclude and numth.is_prime(value):
            out.append(value)
        value -= factor
    if len(out) < count:
        raise RuntimeError("failed to find enough auxiliary primes")
    return out
