"""Encryption parameters (scheme, ring degree, modulus chain, multiplication
technique) — behavioural mirror of the reference's EncryptionParameters
(include/host/encryptionparams.h:13-246), re-shaped as a frozen dataclass.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

from .modulus import Modulus


class SchemeType(enum.Enum):
    none = 0
    bfv = 1
    ckks = 2
    bgv = 3


class MulTech(enum.Enum):
    """BFV multiplication technique (include/host/encryptionparams.h)."""

    none = 0
    behz = 1
    hps = 2
    hps_overq = 3
    hps_overq_leveled = 4


@dataclass(frozen=True)
class EncryptionParameters:
    scheme: SchemeType
    poly_modulus_degree: int
    coeff_modulus: tuple[Modulus, ...]
    # Number of trailing special (key-switching) primes P; hybrid KS.
    special_modulus_size: int = 1
    plain_modulus: Modulus | None = None
    mul_tech: MulTech = MulTech.behz
    # Rotation steps for which Galois keys will be generated (optional hint).
    galois_steps: tuple[int, ...] = field(default_factory=tuple)
    # Composite scaling (CKKS, TPU-native): one logical level spans this
    # many RNS limbs, so ~2^56-bit working scales can be built from PAIRS
    # of ~28-bit primes and the whole evaluation runs in the q32
    # single-word kernel regime (see ops/ntt_pallas.py).  The reference has
    # no counterpart (CUDA has native 64-bit multiply; the TPU VPU is a
    # 32-bit machine) — this is the same regime as OpenFHE's 32-bit-word
    # COMPOSITESCALING builds.  1 = classic single-prime levels.
    composite_degree: int = 1
    # HomomorphicEncryption.org security level enforced at construction
    # (reference he_std tables, include/host/hestdparms.h:14-78): total
    # logQP must not exceed the table bound for this N.  0 disables the
    # check; alternatively pass allow_insecure=True to keep sec_level
    # metadata but skip enforcement (research/bench parameter regimes).
    sec_level: int = 128
    allow_insecure: bool = False

    def __post_init__(self):
        n = self.poly_modulus_degree
        if n & (n - 1) or n < 2:
            raise ValueError("poly_modulus_degree must be a power of two >= 2")
        if self.special_modulus_size < 1:
            raise ValueError("special_modulus_size must be >= 1 (hybrid KS)")
        if self.special_modulus_size >= len(self.coeff_modulus):
            raise ValueError("special_modulus_size must leave at least one data prime")
        if self.scheme in (SchemeType.bfv, SchemeType.bgv) and self.plain_modulus is None:
            raise ValueError("BFV/BGV require a plain modulus")
        values = [m.value for m in self.coeff_modulus]
        if len(set(values)) != len(values):
            raise ValueError("coeff modulus primes must be distinct")
        from .modulus import COEFF_MOD_COUNT_MAX, COEFF_MOD_COUNT_MAX_Q32, Q32_BIT_MAX

        cap = (
            COEFF_MOD_COUNT_MAX_Q32
            if all(v.bit_length() <= Q32_BIT_MAX for v in values)
            else COEFF_MOD_COUNT_MAX
        )
        if len(values) > cap:
            raise ValueError(
                "coeff modulus chain too long: > 64 primes is only supported "
                "in the q32 regime (every prime < 2^30)"
            )
        d = self.composite_degree
        if d < 1:
            raise ValueError("composite_degree must be >= 1")
        if d > 1:
            if self.scheme != SchemeType.ckks:
                raise ValueError("composite scaling is a CKKS regime")
            if self.size_Q % d:
                raise ValueError(
                    "composite scaling needs size_Q divisible by the degree "
                    "(every logical level, including the anchor, is a full "
                    "group of primes)"
                )
            anchor = 1
            for v in values[:d]:
                anchor *= v
            if anchor.bit_length() > 62:
                raise ValueError(
                    "composite anchor product must fit 62 bits (exact u64 "
                    "CRT compose during RaiseMod)"
                )
        if self.sec_level and not self.allow_insecure:
            from .modulus import he_std_parms

            bound = he_std_parms(n, self.sec_level)
            if bound:
                total = sum(v.bit_length() for v in values)
                if total > bound:
                    raise ValueError(
                        f"total coeff modulus is {total} bits but the "
                        f"HomomorphicEncryption.org bound for N={n} at "
                        f"{self.sec_level}-bit security is {bound} bits; "
                        "pass allow_insecure=True (or sec_level=0) for "
                        "research parameter regimes"
                    )

    @property
    def log_n(self) -> int:
        return self.poly_modulus_degree.bit_length() - 1

    @property
    def size_P(self) -> int:
        return self.special_modulus_size

    @property
    def size_QP(self) -> int:
        return len(self.coeff_modulus)

    @property
    def size_Q(self) -> int:
        return self.size_QP - self.size_P

    @property
    def key_modulus(self) -> tuple[Modulus, ...]:
        return self.coeff_modulus

    @property
    def q_moduli(self) -> tuple[Modulus, ...]:
        return self.coeff_modulus[: self.size_Q]

    @property
    def p_moduli(self) -> tuple[Modulus, ...]:
        return self.coeff_modulus[self.size_Q:]
