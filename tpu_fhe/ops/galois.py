"""Galois automorphisms (slot rotations / conjugation) in the NTT domain.

TPU-native counterpart of PhantomGaloisTool (include/galois.cuh:17-168,
src/galois.cu): the automorphism sigma_g: f(x) -> f(x^g) acts on NTT-form
data as a pure index permutation, precomputed on host per (n, g) and applied
as a single gather.  Our NTT ordering places f(psi^(2*br(i)+1)) at index i
(see ops/ntt.py), so the permutation solves e_j = e_i * g (mod 2N).

Rotation steps use the 5^step group: slot j of the CKKS encoder holds the
evaluation at zeta^{5^j}, hence sigma_{5^r} rotates slots left by r and
sigma_{2N-1} conjugates (reference: get_elt_from_step, include/galois.cuh).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from ..core import numth


def galois_elt_from_step(step: int, n: int) -> int:
    """Automorphism element for a slot rotation by `step` (left if > 0)."""
    if step == 0:
        return 1
    slots = n // 2
    return pow(5, step % slots, 2 * n)


def conj_elt(n: int) -> int:
    return 2 * n - 1


@lru_cache(maxsize=None)
def _ntt_permutation(n: int, elt: int) -> np.ndarray:
    """perm with new[i] = old[perm[i]] for NTT-form automorphism sigma_elt."""
    log_n = n.bit_length() - 1
    two_n = 2 * n
    e = 2 * numth.bit_reverse_perm(log_n) + 1
    pos_of_e = np.zeros(two_n, dtype=np.int64)
    pos_of_e[e] = np.arange(n)
    target = (e * elt) % two_n
    return pos_of_e[target]


def _galois_impl() -> str:
    import os

    return os.environ.get("TPU_FHE_GALOIS_IMPL", "gather")


def apply_galois_ntt(x, elt: int, n: int):
    """Apply sigma_elt to NTT-form data (..., N).

    Default: one lane gather (pure indexing; the reference's CUDA gather,
    src/galois.cu:104-120).  TPU_FHE_GALOIS_IMPL=decomp / decomp_mm uses
    the bit-reversed-affine decomposition (ops/galois_decomp.py) — a
    gather-free transpose/roll/permutation-matmul chain for backends where
    the N-wide lane gather lowers poorly."""
    impl = _galois_impl()
    if impl in ("decomp", "decomp_mm") and n >= 16 and elt % 2 == 1:
        from . import w64 as w64_mod
        from .galois_decomp import apply_galois_ntt_decomp

        use_mm = impl == "decomp_mm"
        if isinstance(x, w64_mod.W64):
            lo = apply_galois_ntt_decomp(x.lo, elt, n, use_mm)
            hi = (None if x.hi_ is None
                  else apply_galois_ntt_decomp(x.hi_, elt, n, use_mm))
            return w64_mod.W64(lo, hi)
        return apply_galois_ntt_decomp(x, elt, n, use_mm)
    perm = jnp.asarray(_ntt_permutation(n, elt))
    return x[..., perm]


@lru_cache(maxsize=None)
def _coeff_permutation(n: int, elt: int) -> tuple[np.ndarray, np.ndarray]:
    """Coefficient-domain automorphism: x^i -> x^{i*elt mod 2n} with sign.

    Returns (source_index, negate_mask): new[j] = +-old[src[j]]."""
    src = np.zeros(n, dtype=np.int64)
    neg = np.zeros(n, dtype=bool)
    for i in range(n):
        j = (i * elt) % (2 * n)
        if j < n:
            src[j] = i
            neg[j] = False
        else:
            src[j - n] = i
            neg[j - n] = True
    return src, neg


def apply_galois_coeff(x, elt: int, n: int, q):
    """Apply sigma_elt to coefficient-form data (..., L, N); q is (L, 1)."""
    from . import w64

    src, neg = _coeff_permutation(n, elt)
    gathered = x[..., jnp.asarray(src)]
    if isinstance(x, w64.W64):
        return w64.where(jnp.asarray(neg), w64.neg_mod(gathered, q), gathered)
    negated = jnp.where(gathered == 0, gathered, q - gathered)
    return jnp.where(jnp.asarray(neg), negated, gathered)
