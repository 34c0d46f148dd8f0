"""Gather-free automorphism decomposition vs the reference gather.

ops/galois_decomp.py rewrites the NTT-domain automorphism as a
transpose/roll/permutation chain from its bit-reversed affine form; every
implementation must be BIT-IDENTICAL to the index-permutation definition
(ops/galois.py::_ntt_permutation) for rotation and conjugation elements.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_fhe.ops.galois import _ntt_permutation, galois_elt_from_step, conj_elt
from tpu_fhe.ops.galois_decomp import apply_galois_ntt_decomp

RNG = np.random.default_rng(5)


@pytest.mark.parametrize("n", [256, 1024, 2048, 4096])
@pytest.mark.parametrize("use_mm", [False, True], ids=["take", "mm"])
def test_decomp_matches_gather(n, use_mm):
    elts = [
        galois_elt_from_step(1, n),
        galois_elt_from_step(3, n),
        galois_elt_from_step(-2, n),
        galois_elt_from_step(n // 4, n),
        conj_elt(n),
    ]
    x = RNG.integers(0, 1 << 32, size=(3, n), dtype=np.uint64).astype(np.uint32)
    for elt in elts:
        perm = _ntt_permutation(n, elt)
        want = x[:, perm]
        got = np.asarray(apply_galois_ntt_decomp(jnp.asarray(x), elt, n, use_mm))
        np.testing.assert_array_equal(got, want, err_msg=f"elt={elt}")
