"""RNS bases and base-converter precomputation (host side, exact ints).

Re-derivation of the reference's RNSBase/BaseConverter contract
(include/host/rns.h:15-198, src/host/rns.cu): punctured products
q_hat_i = Q/q_i, their inverses mod q_i (with Shoup words), CRT
compose/decompose, and the cross-base tables (QHatModp, alphaQModp,
P mod q, P^{-1} mod q ...) consumed by modup/moddown/rescale on device.
All arithmetic is exact Python int; tables are exported as plain int lists
for packing into device arrays.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property

from . import numth
from .modulus import Modulus
from .ntt_tables import compute_shoup


@dataclass(frozen=True)
class RNSBase:
    """An ordered RNS base {q_0, ..., q_{k-1}} of coprime word moduli."""

    base: tuple[Modulus, ...]

    def __post_init__(self):
        if not self.base:
            raise ValueError("RNS base cannot be empty")

    def __len__(self) -> int:
        return len(self.base)

    def __getitem__(self, i: int) -> Modulus:
        return self.base[i]

    @cached_property
    def values(self) -> tuple[int, ...]:
        return tuple(m.value for m in self.base)

    @cached_property
    def big_modulus(self) -> int:
        prod = 1
        for m in self.base:
            prod *= m.value
        return prod

    @cached_property
    def punctured_products(self) -> tuple[int, ...]:
        """q_hat_i = Q / q_i (exact big ints)."""
        q = self.big_modulus
        return tuple(q // m.value for m in self.base)

    @cached_property
    def q_hat_inv_mod_q(self) -> tuple[int, ...]:
        """[q_hat_i^{-1}]_{q_i}"""
        return tuple(
            numth.invert_mod(self.punctured_products[i] % m.value, m.value)
            for i, m in enumerate(self.base)
        )

    @cached_property
    def q_hat_inv_mod_q_shoup(self) -> tuple[int, ...]:
        return tuple(
            compute_shoup(v, m.value) for v, m in zip(self.q_hat_inv_mod_q, self.base)
        )

    @cached_property
    def q_inv(self) -> tuple[float, ...]:
        """1/q_i as doubles (HPS fractional correction)."""
        return tuple(1.0 / m.value for m in self.base)

    def extend(self, other: Modulus | RNSBase) -> RNSBase:
        extra = (other,) if isinstance(other, Modulus) else other.base
        for m in extra:
            for mine in self.base:
                if numth.gcd(m.value, mine.value) != 1:
                    raise ValueError("cannot extend by non-coprime modulus")
        return RNSBase(self.base + extra)

    def drop(self, count: int = 1) -> RNSBase:
        if len(self.base) <= count:
            raise ValueError("cannot drop all moduli")
        return RNSBase(self.base[:-count])

    def decompose(self, value: int) -> list[int]:
        """Big int -> RNS residues."""
        return [value % m.value for m in self.base]

    def compose(self, residues: list[int]) -> int:
        """RNS residues -> big int in [0, Q) via CRT."""
        q = self.big_modulus
        acc = 0
        for i, m in enumerate(self.base):
            acc += (
                (residues[i] * self.q_hat_inv_mod_q[i]) % m.value
            ) * self.punctured_products[i]
        return acc % q


@dataclass(frozen=True)
class BaseConverter:
    """Fast basis conversion tables from ibase {q_i} to obase {p_j}.

    BEHZ-style conversion computes
        y_j = sum_i [x_i * q_hat_i^{-1}]_{q_i} * q_hat_i  (mod p_j)
    which equals x + alpha*Q mod p_j for a small overshoot alpha < k.
    HPS adds the floating-point alpha estimate to remove the overshoot.
    Tables match the reference's DBaseConverter (include/host/rns.h:104-198).
    """

    ibase: RNSBase
    obase: RNSBase

    @cached_property
    def q_hat_mod_p(self) -> list[list[int]]:
        """[p_j][q_i]: q_hat_i mod p_j  (row-major per output prime)."""
        return [
            [qh % p for qh in self.ibase.punctured_products]
            for p in self.obase.values
        ]

    @cached_property
    def alpha_q_mod_p(self) -> list[list[int]]:
        """[alpha][p_j]: (alpha * Q) mod p_j for alpha in 0..k (HPS correction)."""
        q = self.ibase.big_modulus
        k = len(self.ibase)
        return [[(a * q) % p for p in self.obase.values] for a in range(k + 1)]

    @cached_property
    def big_q_mod_p(self) -> list[int]:
        q = self.ibase.big_modulus
        return [q % p for p in self.obase.values]

    def convert_exact(self, residues: list[int]) -> list[int]:
        """Exact CRT-compose-then-reduce (golden path for tests)."""
        v = self.ibase.compose(residues)
        return [v % p for p in self.obase.values]

    def convert_behz_golden(self, residues: list[int]) -> list[int]:
        """Exact integer model of the device BEHZ fast conversion (with
        overshoot alpha*Q) for bit-exact kernel tests."""
        scaled = [
            (residues[i] * self.ibase.q_hat_inv_mod_q[i]) % self.ibase.values[i]
            for i in range(len(self.ibase))
        ]
        out = []
        for j, p in enumerate(self.obase.values):
            acc = 0
            for i in range(len(self.ibase)):
                acc += scaled[i] * self.q_hat_mod_p[j][i]
            out.append(acc % p)
        return out


@dataclass(frozen=True)
class KeySwitchDigits:
    """Digit decomposition of the current base Ql for hybrid key switching.

    Ql's limbs are partitioned into beta contiguous digits of up to alpha
    (= |P|) limbs each, as in the reference's modup
    (src/rns_bconv.cu:530-628).  For each digit d:
      - part_q_hat_inv_mod_part[d][i]: [ (Q_d/q_i)^{-1} ]_{q_i} for q_i in
        digit d (the "partQlHatInv" scale fused into the iNTT);
      - converter[d]: BaseConverter from digit d's base to the complement
        base (Ql minus digit_d) + P.
    """

    base_Ql: RNSBase
    base_P: RNSBase
    alpha: int
    beta: int = field(init=False)

    def __post_init__(self):
        k = len(self.base_Ql)
        object.__setattr__(self, "beta", (k + self.alpha - 1) // self.alpha)

    def digit_indices(self, d: int) -> range:
        k = len(self.base_Ql)
        start = d * self.alpha
        end = min(start + self.alpha, k)
        return range(start, end)

    @cached_property
    def digit_bases(self) -> list[RNSBase]:
        return [
            RNSBase(tuple(self.base_Ql.base[i] for i in self.digit_indices(d)))
            for d in range(self.beta)
        ]

    @cached_property
    def part_q_hat_inv_mod_part(self) -> list[list[int]]:
        return [list(b.q_hat_inv_mod_q) for b in self.digit_bases]

    @cached_property
    def part_q_hat_inv_mod_part_shoup(self) -> list[list[int]]:
        return [list(b.q_hat_inv_mod_q_shoup) for b in self.digit_bases]

    @cached_property
    def complement_bases(self) -> list[RNSBase]:
        out = []
        for d in range(self.beta):
            idx = set(self.digit_indices(d))
            mods = tuple(
                m for i, m in enumerate(self.base_Ql.base) if i not in idx
            ) + self.base_P.base
            out.append(RNSBase(mods))
        return out

    @cached_property
    def converters(self) -> list[BaseConverter]:
        return [
            BaseConverter(self.digit_bases[d], self.complement_bases[d])
            for d in range(self.beta)
        ]
