"""FHE context: modulus chain, per-level device tables, Galois tool.

TPU-native counterpart of the reference's PhantomContext/ContextData/DRNSTool
(src/context.cu:16-232, include/rns.cuh:14-205), redesigned as frozen pytrees
of device arrays: chain index 0 is the key level (full Q U P), index 1 the
first data level (all of Q), each subsequent level drops one data prime.
All precompute happens on host with exact integers and is packed once into
uint64 device arrays; every evaluator function takes the ContextLevel it
operates at, so each level jit-compiles its own static-shape program.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import numpy as np
import jax.numpy as jnp

from ..core import numth
from ..core.modulus import Modulus
from ..core.ntt_tables import NTTTables, compute_shoup, make_ntt_tables
from ..core.params import EncryptionParameters, SchemeType
from ..core.rns import BaseConverter, KeySwitchDigits, RNSBase
from ..ops.ntt import DeviceNTTTables, build_device_ntt_tables


def _u64(x) -> np.ndarray:
    # Tables are BUILT in host numpy (device traffic during construction on
    # a tunneled TPU costs ~100ms per array) and then shipped in ONE batched
    # jax.device_put at the end of FheContext.__init__ (_device_all), so
    # jitted consumers close over device arrays — hidden executable
    # parameters — instead of numpy constants inlined into the HLO.
    return np.asarray(x, dtype=np.uint64)


from ..utils.device import _ship_to_device  # noqa: E402


@dataclass(frozen=True)
class ModulusVec:
    """Per-limb modulus constants shaped (k, 1), host numpy (see _u64)."""

    q: np.ndarray
    ratio_lo: np.ndarray
    ratio_hi: np.ndarray

    @staticmethod
    def from_moduli(mods: tuple[Modulus, ...]) -> "ModulusVec":
        return ModulusVec(
            q=_u64([[m.value] for m in mods]),
            ratio_lo=_u64([[m.const_ratio[0]] for m in mods]),
            ratio_hi=_u64([[m.const_ratio[1]] for m in mods]),
        )


@dataclass(frozen=True)
class DigitTables:
    """Device tables for one modup digit (hybrid KS digit decomposition)."""

    start: int                    # first Ql limb index of this digit
    end: int                      # one past last
    qhat_mod_p: jnp.ndarray       # (comp_size, digit_size)
    comp_mod: ModulusVec          # complement base (Ql minus digit) + P
    comp_ntt: DeviceNTTTables     # twiddles for the complement limbs


@dataclass(frozen=True)
class KeySwitchTables:
    """Per-level hybrid keyswitch tables (modup + moddown)."""

    alpha: int
    beta: int
    # concat over digits of [part-Qhat^{-1} mod q_i] per Ql limb, (size_Ql,1)
    part_qhatinv: jnp.ndarray
    part_qhatinv_shoup: jnp.ndarray
    digits: tuple[DigitTables, ...]
    # moddown: P -> Ql conversion and P^{-1} scaling
    p_hatinv: jnp.ndarray         # (size_P, 1) [ (P/p_j)^{-1} ]_{p_j}
    p_hatinv_shoup: jnp.ndarray
    p_hat_mod_q: jnp.ndarray      # (size_Ql, size_P)
    p_mod: ModulusVec             # the P base
    p_ntt: DeviceNTTTables
    big_pinv_mod_q: jnp.ndarray   # (size_Ql, 1)
    big_pinv_mod_q_shoup: jnp.ndarray
    big_p_mod_q: jnp.ndarray      # (size_Ql, 1)
    big_p_mod_q_shoup: jnp.ndarray
    # BGV correction: P -> t conversion + P^{-1} mod t
    p_hat_mod_t: jnp.ndarray | None = None       # (1, size_P)
    big_pinv_mod_t: int | None = None
    big_p_inv_mod_t_shoup: int | None = None
    # BGV t-preserving moddown: [t^{-1} * Phat_j^{-1}]_{p_j} and t mod q_i
    tinv_p_hatinv: jnp.ndarray | None = None     # (size_P, 1) + Shoup
    tinv_p_hatinv_shoup: jnp.ndarray | None = None
    t_mod_q: jnp.ndarray | None = None           # (size_Ql, 1) + Shoup
    t_mod_q_shoup: jnp.ndarray | None = None


@dataclass(frozen=True)
class ContextLevel:
    """One node of the modulus chain."""

    chain_index: int
    limb_indices: tuple[int, ...]   # indices into the key-level QP list
    base: RNSBase                   # the Ql (or QP for key level) base
    mod: ModulusVec
    ntt: DeviceNTTTables
    # rescale (divide by q_last): [q_last^{-1}]_{q_i} for remaining limbs
    inv_q_last_mod_q: jnp.ndarray | None        # (size_Ql-1, 1)
    inv_q_last_mod_q_shoup: jnp.ndarray | None
    q_last_mod_q: jnp.ndarray | None            # (size_Ql-1, 1) for BGV/add paths
    ks: KeySwitchTables | None      # None at key level

    @property
    def size(self) -> int:
        return len(self.limb_indices)


class FheContext:
    """Owns the full chain and global tables.

    Not a pytree: evaluator entry points close over the relevant level's
    tables, which are pytrees, so everything jits cleanly.
    """

    @property
    def is_q32(self) -> bool:
        """True when every prime is < 2^30 (the single-word kernel regime):
        residues fit one u32, enabling compact key/plaintext storage
        regardless of whether the Pallas plan32 builds (small rings fall
        back to XLA kernels but keep the storage win)."""
        from ..core.modulus import Q32_BIT_MAX

        return all(m.bit_count <= Q32_BIT_MAX for m in self.key_modulus)

    def __init__(self, params: EncryptionParameters):
        self.params = params
        n = params.poly_modulus_degree
        log_n = params.log_n
        self.key_modulus = params.coeff_modulus
        size_QP = params.size_QP
        size_P = params.size_P
        size_Q = params.size_Q
        if size_Q % size_P != 0 and size_P > 1:
            # hybrid KS tolerates a ragged last digit; nothing to enforce
            pass

        # Host NTT tables for every key-level prime (and plain modulus t for
        # BFV/BGV batching is built by the encoder).
        self.host_ntt: list[NTTTables] = [
            make_ntt_tables(log_n, m.value) for m in self.key_modulus
        ]
        self.key_ntt = build_device_ntt_tables(self.host_ntt)

        p_base = RNSBase(tuple(self.key_modulus[size_Q:]))
        self.base_P = p_base
        big_p = p_base.big_modulus

        t = params.plain_modulus

        self.chain: list[ContextLevel] = []
        # chain index 0: key level (all of Q U P), used for keygen only.
        key_base = RNSBase(tuple(self.key_modulus))
        self.chain.append(
            ContextLevel(
                chain_index=0,
                limb_indices=tuple(range(size_QP)),
                base=key_base,
                mod=ModulusVec.from_moduli(key_base.base),
                ntt=self.key_ntt,
                inv_q_last_mod_q=None,
                inv_q_last_mod_q_shoup=None,
                q_last_mod_q=None,
                ks=None,
            )
        )

        # data levels: chain index 1 has all of Q; each next drops one prime.
        for drop in range(size_Q):
            size_Ql = size_Q - drop
            limb_idx = tuple(range(size_Ql))
            base_Ql = RNSBase(tuple(self.key_modulus[:size_Ql]))
            mod = ModulusVec.from_moduli(base_Ql.base)
            ntt = self.key_ntt.slice_limbs(list(limb_idx))

            # rescale tables (drop q_last = base_Ql[-1])
            if size_Ql > 1:
                q_last = base_Ql.values[-1]
                inv_q_last = [
                    numth.invert_mod(q_last % q, q) for q in base_Ql.values[:-1]
                ]
                inv_q_last_shoup = [
                    compute_shoup(v, q)
                    for v, q in zip(inv_q_last, base_Ql.values[:-1])
                ]
                q_last_mod = [q_last % q for q in base_Ql.values[:-1]]
                inv_q_last_arr = _u64([[v] for v in inv_q_last])
                inv_q_last_shoup_arr = _u64([[v] for v in inv_q_last_shoup])
                q_last_mod_arr = _u64([[v] for v in q_last_mod])
            else:
                inv_q_last_arr = inv_q_last_shoup_arr = q_last_mod_arr = None

            ks = self._build_keyswitch_tables(base_Ql, p_base, size_P, t)

            self.chain.append(
                ContextLevel(
                    chain_index=1 + drop,
                    limb_indices=limb_idx,
                    base=base_Ql,
                    mod=mod,
                    ntt=ntt,
                    inv_q_last_mod_q=inv_q_last_arr,
                    inv_q_last_mod_q_shoup=inv_q_last_shoup_arr,
                    q_last_mod_q=q_last_mod_arr,
                    ks=ks,
                )
            )

        # one batched H2D transfer of every table (shared plan converted
        # once); the CPU-fallback flat twiddles stay host-side and lazy.
        self.chain, self.key_ntt = _ship_to_device([self.chain, self.key_ntt])

    def _build_keyswitch_tables(
        self,
        base_Ql: RNSBase,
        p_base: RNSBase,
        size_P: int,
        t: Modulus | None,
    ) -> KeySwitchTables:
        size_Ql = len(base_Ql)
        digits = KeySwitchDigits(base_Ql, p_base, alpha=size_P)

        part_qhatinv = np.zeros((size_Ql, 1), dtype=np.uint64)
        part_qhatinv_shoup = np.zeros((size_Ql, 1), dtype=np.uint64)
        for d in range(digits.beta):
            for j, i in enumerate(digits.digit_indices(d)):
                v = digits.part_q_hat_inv_mod_part[d][j]
                part_qhatinv[i, 0] = v
                part_qhatinv_shoup[i, 0] = digits.part_q_hat_inv_mod_part_shoup[d][j]

        digit_tables = []
        for d in range(digits.beta):
            conv = digits.converters[d]
            comp = digits.complement_bases[d]
            qhat_mod_p = np.array(conv.q_hat_mod_p, dtype=np.uint64)
            rng = digits.digit_indices(d)
            # complement limb indices in key-level numbering: the Ql limbs
            # not in this digit, then the P limbs.
            comp_key_idx = [i for i in range(size_Ql) if i not in rng] + [
                self.params.size_Q + j for j in range(size_P)
            ]
            digit_tables.append(
                DigitTables(
                    start=rng.start,
                    end=rng.stop,
                    qhat_mod_p=qhat_mod_p,
                    comp_mod=ModulusVec.from_moduli(comp.base),
                    comp_ntt=self.key_ntt.slice_limbs(comp_key_idx),
                )
            )

        # moddown tables: P -> Ql
        p_to_q = BaseConverter(p_base, base_Ql)
        big_p = p_base.big_modulus
        big_pinv_mod_q = [
            numth.invert_mod(big_p % q, q) for q in base_Ql.values
        ]
        big_p_mod_q = [big_p % q for q in base_Ql.values]

        p_hat_mod_t = None
        big_pinv_mod_t = None
        big_pinv_mod_t_shoup = None
        tinv_p_hatinv = tinv_p_hatinv_shoup = None
        t_mod_q_arr = t_mod_q_shoup_arr = None
        if t is not None:
            p_to_t = BaseConverter(p_base, RNSBase((t,)))
            p_hat_mod_t = _u64(np.array(p_to_t.q_hat_mod_p, dtype=np.uint64))
            big_pinv_mod_t = numth.invert_mod(big_p % t.value, t.value)
            big_pinv_mod_t_shoup = compute_shoup(big_pinv_mod_t, t.value)
            tv = t.value
            tinv_vals = [
                (numth.invert_mod(tv % p, p) * hinv) % p
                for p, hinv in zip(p_base.values, p_base.q_hat_inv_mod_q)
            ]
            tinv_p_hatinv = _u64([[v] for v in tinv_vals])
            tinv_p_hatinv_shoup = _u64(
                [[compute_shoup(v, p)] for v, p in zip(tinv_vals, p_base.values)]
            )
            t_mod_q_arr = _u64([[tv % q] for q in base_Ql.values])
            t_mod_q_shoup_arr = _u64(
                [[compute_shoup(tv % q, q)] for q in base_Ql.values]
            )

        return KeySwitchTables(
            alpha=size_P,
            beta=digits.beta,
            part_qhatinv=part_qhatinv,
            part_qhatinv_shoup=part_qhatinv_shoup,
            digits=tuple(digit_tables),
            p_hatinv=_u64([[v] for v in p_base.q_hat_inv_mod_q]),
            p_hatinv_shoup=_u64([[v] for v in p_base.q_hat_inv_mod_q_shoup]),
            p_hat_mod_q=np.array(p_to_q.q_hat_mod_p, dtype=np.uint64),
            p_mod=ModulusVec.from_moduli(p_base.base),
            p_ntt=self.key_ntt.slice_limbs(
                [self.params.size_Q + j for j in range(size_P)]
            ),
            big_pinv_mod_q=_u64([[v] for v in big_pinv_mod_q]),
            big_pinv_mod_q_shoup=_u64(
                [[compute_shoup(v, q)] for v, q in zip(big_pinv_mod_q, base_Ql.values)]
            ),
            big_p_mod_q=_u64([[v] for v in big_p_mod_q]),
            big_p_mod_q_shoup=_u64(
                [[compute_shoup(v, q)] for v, q in zip(big_p_mod_q, base_Ql.values)]
            ),
            p_hat_mod_t=p_hat_mod_t,
            big_pinv_mod_t=big_pinv_mod_t,
            big_p_inv_mod_t_shoup=big_pinv_mod_t_shoup,
            tinv_p_hatinv=tinv_p_hatinv,
            tinv_p_hatinv_shoup=tinv_p_hatinv_shoup,
            t_mod_q=t_mod_q_arr,
            t_mod_q_shoup=t_mod_q_shoup_arr,
        )

    # -- chain helpers --------------------------------------------------
    @property
    def key_level(self) -> ContextLevel:
        return self.chain[0]

    @property
    def first_data_level(self) -> ContextLevel:
        return self.chain[1]

    def level(self, chain_index: int) -> ContextLevel:
        return self.chain[chain_index]

    @property
    def n(self) -> int:
        return self.params.poly_modulus_degree

    @cached_property
    def scheme(self) -> SchemeType:
        return self.params.scheme

    # scaling factors for CKKS rescale bookkeeping
    @cached_property
    def q_values(self) -> list[int]:
        return [m.value for m in self.key_modulus[: self.params.size_Q]]
