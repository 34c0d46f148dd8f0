"""Modulus and coefficient-modulus creation (host side, exact arithmetic).

Mirrors the behavioural contract of the reference's Modulus/CoeffModulus
layer (/root/reference/include/host/modulus.h, src/host/modulus.cu): 61-bit
max NTT-friendly primes, Barrett const ratios (floor(2^128/q) as two 64-bit
words + remainder), HomomorphicEncryption.org security tables.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import numth

MOD_BIT_COUNT_MAX = 61
USER_MOD_BIT_COUNT_MIN = 2
USER_MOD_BIT_COUNT_MAX = 60
POLY_MOD_DEGREE_MIN = 2
POLY_MOD_DEGREE_MAX = 131072
# The reference caps the chain at 64 primes (SEAL heritage,
# defines.h:19 / encryptionparams.h:121).  We keep that cap for the
# generic (<= 61-bit prime) regime — the 128-bit accumulators in the
# base-conversion paths are sized for <= 64 terms of < 2^122 — and only
# permit up to 128 primes in the q32 regime (every prime < 2^31), where
# one ~60-bit logical level is a pair of ~30-bit primes at identical
# total logQ and each product term is < 2^61, so even 128 terms stay
# far below 2^128.  Deliberate divergence; recorded in PARITY.md.
COEFF_MOD_COUNT_MAX = 64
COEFF_MOD_COUNT_MAX_Q32 = 128
Q32_BIT_MAX = 30


@dataclass(frozen=True)
class Modulus:
    """A word-size modulus (< 2^61) with Barrett precomputation.

    const_ratio = (lo, hi, rem) where floor(2^128 / q) = hi*2^64 + lo and
    rem = 2^128 mod q — identical contract to the reference's
    Modulus::const_ratio() (src/host/modulus.cu:29-42).
    """

    value: int
    const_ratio: tuple[int, int, int] = field(init=False)
    bit_count: int = field(init=False)
    is_prime: bool = field(init=False)

    def __post_init__(self):
        v = self.value
        if v == 0:
            object.__setattr__(self, "const_ratio", (0, 0, 0))
            object.__setattr__(self, "bit_count", 0)
            object.__setattr__(self, "is_prime", False)
            return
        if v >> MOD_BIT_COUNT_MAX != 0 or v == 1:
            raise ValueError("modulus can be at most 61-bit and cannot be 1")
        quotient, rem = divmod(1 << 128, v)
        object.__setattr__(
            self,
            "const_ratio",
            (quotient & 0xFFFFFFFFFFFFFFFF, (quotient >> 64) & 0xFFFFFFFFFFFFFFFF, rem),
        )
        object.__setattr__(self, "bit_count", v.bit_length())
        object.__setattr__(self, "is_prime", numth.is_prime(v))

    def reduce(self, value: int) -> int:
        return value % self.value

    def __int__(self) -> int:
        return self.value


# HomomorphicEncryption.org standard tables: max total log q bits for a given
# N at 128/192/256-bit security with ternary secret
# (reference: include/host/hestdparms.h:14-78, incl. the extended
# N=65536/131072 rows).  Unknown N -> 0 (no bound known).
_HE_STD_128_TC = {1024: 27, 2048: 54, 4096: 109, 8192: 218, 16384: 438,
                  32768: 881, 65536: 1777, 131072: 3576}
_HE_STD_192_TC = {1024: 19, 2048: 37, 4096: 75, 8192: 151, 16384: 304,
                  32768: 611, 65536: 1229, 131072: 2469}
_HE_STD_256_TC = {1024: 14, 2048: 29, 4096: 58, 8192: 118, 16384: 237,
                  32768: 476, 65536: 955, 131072: 1918}


def he_std_parms(poly_modulus_degree: int, sec_level: int = 128) -> int:
    table = {128: _HE_STD_128_TC, 192: _HE_STD_192_TC, 256: _HE_STD_256_TC}[sec_level]
    return table.get(poly_modulus_degree, 0)


class CoeffModulus:
    """Static factory for RNS coefficient-modulus chains."""

    @staticmethod
    def max_bit_count(poly_modulus_degree: int, sec_level: int = 128) -> int:
        if sec_level == 0:
            return 1 << 30
        return he_std_parms(poly_modulus_degree, sec_level)

    @staticmethod
    def create(poly_modulus_degree: int, bit_sizes: list[int]) -> list[Modulus]:
        """Distinct NTT-friendly primes with the requested bit sizes.

        Same allocation discipline as the reference (src/host/modulus.cu:80-112):
        group the request by bit size, generate count-per-size primes via the
        deterministic descending search, then hand them back in request order
        (taking from the back of each per-size pool).
        """
        n = poly_modulus_degree
        if n > POLY_MOD_DEGREE_MAX or n < POLY_MOD_DEGREE_MIN or n & (n - 1):
            raise ValueError("poly_modulus_degree is invalid")
        count_cap = (
            COEFF_MOD_COUNT_MAX_Q32
            if bit_sizes and max(bit_sizes) <= Q32_BIT_MAX
            else COEFF_MOD_COUNT_MAX
        )
        if len(bit_sizes) > count_cap:
            raise ValueError(
                "bit_sizes is invalid: > 64 primes is only supported in the "
                "q32 regime (every bit size <= 30)"
            )
        if bit_sizes and (
            max(bit_sizes) > USER_MOD_BIT_COUNT_MAX or min(bit_sizes) < USER_MOD_BIT_COUNT_MIN
        ):
            raise ValueError("bit_sizes entries out of bounds")

        count_table: dict[int, int] = {}
        for size in bit_sizes:
            count_table[size] = count_table.get(size, 0) + 1
        prime_table = {
            size: numth.get_primes(n, size, count) for size, count in count_table.items()
        }
        result = []
        for size in bit_sizes:
            result.append(Modulus(prime_table[size].pop()))
        return result


    @staticmethod
    def create_composite(
        poly_modulus_degree: int,
        scale_bits: int,
        levels: int,
        degree: int = 2,
        anchor_bits: int = 30,
        special_bits: int = 30,
        special_count: int = 2,
    ) -> list[Modulus]:
        """Full composite-scaling chain (TPU-native q32 regime): an anchor
        group of `degree` anchor_bits primes, `levels` data groups of
        `degree` primes whose PRODUCT tracks the FLEXIBLEAUTO ladder target
        2^scale_bits, and `special_count` key-switching primes.

        Independent per-prime selection makes the ladder ratio drift double
        per level (sf[k] = sf[k-1]^2 / Qg) and blow past the reference's
        (0.5, 2.0) validity window on deep chains; instead each group fixes
        its first prime near 2^(scale_bits/degree) and picks the remaining
        primes nearest to target/partial-product, with the target chosen
        greedily as sf_prev^2 / 2^scale_bits so per-level error never
        compounds (the semantics of OpenFHE's 32-bit COMPOSITESCALINGAUTO
        prime search; no counterpart in the CUDA reference)."""
        n = poly_modulus_degree
        if degree < 1:
            raise ValueError("degree must be >= 1")
        b = scale_bits // degree
        if not (USER_MOD_BIT_COUNT_MIN <= b <= USER_MOD_BIT_COUNT_MAX):
            raise ValueError("scale_bits/degree out of prime-size bounds")
        used: set[int] = set()

        def take_near(target: float, bits_cap: int | None) -> int:
            p = numth.nearest_prime(n, target, used, bits_cap)
            used.add(p)
            return p

        anchor = [take_near(2.0 ** anchor_bits * (1 - 2e-3), anchor_bits)
                  for _ in range(degree)]
        specials = [take_near(2.0 ** special_bits * (1 - 2e-3), special_bits)
                    for _ in range(special_count)]

        target_sf = 2.0 ** scale_bits
        groups: list[list[int]] = []
        sf = None
        for _ in range(levels):
            tgt = target_sf if sf is None else sf * sf / target_sf
            if degree == 2:
                # pair-candidate search: nearest-prime granularity alone
                # leaves ~1e-5 product error (prime gaps are ~30 candidate
                # steps at 2^28), which caps bootstrap precision; searching
                # over candidate first-primes brings the pair product
                # within ~1e-7 of the ladder target
                cands = numth.nearest_primes(n, 2.0 ** b, used, 24)
                best = None
                for a in cands:
                    partner = numth.nearest_prime(n, tgt / a, used | {a})
                    err = abs(a * partner - tgt) / tgt
                    if best is None or err < best[0]:
                        best = (err, a, partner)
                _, a, partner = best
                used.add(a)
                used.add(partner)
                group = [a, partner]
                partial = float(a) * float(partner)
            else:
                group = []
                partial = 1.0
                for j in range(degree):
                    remaining = tgt / partial
                    if j < degree - 1:
                        p = take_near(2.0 ** b, None)
                    else:
                        p = take_near(remaining, None)
                    group.append(p)
                    partial *= float(p)
            groups.append(group)
            sf = partial if sf is None else sf * sf / partial
        # chain order: anchor, then data groups with the LAST group being
        # the first consumed by the ladder (generation order above)
        data = [p for g in reversed(groups) for p in g]
        return [Modulus(p) for p in anchor + data + specials]


class PlainModulus:
    @staticmethod
    def batching(poly_modulus_degree: int, bit_size: int) -> Modulus:
        """Prime t = 1 mod 2N supporting batching (reference: modulus.h)."""
        return Modulus(numth.get_primes(poly_modulus_degree, bit_size, 1)[0])
