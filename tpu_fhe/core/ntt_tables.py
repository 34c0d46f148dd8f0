"""Host-side NTT twiddle tables and an exact golden negacyclic NTT.

Table layout mirrors the reference's arith::NTT (include/host/ntt.h:13-70,
src/host/ntt.cu:11-58): powers of the minimal primitive 2N-th root psi stored
in bit-reversed order, with Shoup companions (floor(w * 2^64 / q)), plus
n^{-1} mod q.  The golden transforms here are exact Python-int references the
device kernels are tested against bit-exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

from . import numth
from .modulus import Modulus


def compute_shoup(operand: int, modulus: int) -> int:
    """floor(operand * 2^64 / modulus) — Shoup precomputation word."""
    return (operand << 64) // modulus


@dataclass(frozen=True)
class NTTTables:
    """Twiddle tables for one prime.

    root_powers[reverse_bits(i, logn)] = psi^i  (psi = minimal primitive
    2N-th root of unity); inv_root_powers likewise for psi^{-1}.  Unlike the
    reference we do NOT fold n^{-1} into inv_root_powers[1]; the inverse
    transform applies the n^{-1} scale as a separate fused multiply.
    """

    modulus: Modulus
    log_n: int
    root: int
    inv_root: int
    root_powers: tuple[int, ...]
    inv_root_powers: tuple[int, ...]
    inv_degree: int

    @property
    def n(self) -> int:
        return 1 << self.log_n


@lru_cache(maxsize=None)
def make_ntt_tables(log_n: int, modulus_value: int) -> NTTTables:
    n = 1 << log_n
    q = modulus_value
    psi = numth.minimal_primitive_root(2 * n, q)
    psi_inv = numth.invert_mod(psi, q)

    def powers_bitrev(base: int) -> tuple[int, ...]:
        from .. import native

        fast = native.powers_bitrev(base, q, log_n)
        if fast is not None:
            return tuple(int(v) for v in fast)
        power = 1
        # natural order first, then scatter to bit-reversed positions
        naturals = [1] * n
        for i in range(1, n):
            power = (power * base) % q
            naturals[i] = power
        rev = numth.bit_reverse_perm(log_n)
        out = [0] * n
        for i in range(n):
            out[rev[i]] = naturals[i]
        return tuple(out)

    return NTTTables(
        modulus=Modulus(q),
        log_n=log_n,
        root=psi,
        inv_root=psi_inv,
        root_powers=powers_bitrev(psi),
        inv_root_powers=powers_bitrev(psi_inv),
        inv_degree=numth.invert_mod(n, q),
    )


def golden_forward_ntt(coeffs: list[int], tables: NTTTables) -> list[int]:
    """Exact Harvey-style forward negacyclic NTT (decimation in time).

    Output ordering: index i holds the evaluation of the input polynomial at
    psi^(2*reverse_bits(i, logn) + 1) — the same "scrambled" NTT form the
    reference produces, verified by test_ntt_ordering.
    """
    q = tables.modulus.value
    n = tables.n
    x = list(coeffs)
    roots = tables.root_powers
    t = n
    m = 1
    while m < n:
        t >>= 1
        for i in range(m):
            w = roots[m + i]
            j1 = 2 * i * t
            for j in range(j1, j1 + t):
                u = x[j]
                v = (x[j + t] * w) % q
                x[j] = (u + v) % q
                x[j + t] = (u - v) % q
        m <<= 1
    return x


def golden_inverse_ntt(values: list[int], tables: NTTTables) -> list[int]:
    """Exact Gentleman-Sande inverse of golden_forward_ntt (incl. 1/n)."""
    q = tables.modulus.value
    n = tables.n
    x = list(values)
    inv_roots = tables.inv_root_powers
    t = 1
    m = n
    while m > 1:
        j1 = 0
        h = m >> 1
        for i in range(h):
            w = inv_roots[h + i]
            for j in range(j1, j1 + t):
                u = x[j]
                v = x[j + t]
                x[j] = (u + v) % q
                x[j + t] = ((u - v) * w) % q
            j1 += 2 * t
        t <<= 1
        m = h
    inv_n = tables.inv_degree
    return [(v * inv_n) % q for v in x]


def golden_negacyclic_eval(coeffs: list[int], tables: NTTTables) -> list[int]:
    """Direct (O(n^2)-free via powers) evaluation used to pin down ordering:
    returns [f(psi^(2*br(i)+1)) for i in range(n)]."""
    q = tables.modulus.value
    n = tables.n
    out = []
    for i in range(n):
        e = 2 * numth.reverse_bits(i, tables.log_n) + 1
        point = pow(tables.root, e, q)
        acc = 0
        p = 1
        for c in coeffs:
            acc = (acc + c * p) % q
            p = (p * point) % q
        out.append(acc)
    return out
