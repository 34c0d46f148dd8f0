"""Batch encoder for BFV/BGV: CRT slot packing over the plain modulus t.

Behavioural counterpart of the reference's PhantomBatchEncoder
(src/batchencoder.cu:25-118, include/batchencoder.h): t is an NTT-friendly
prime (t = 1 mod 2N), so R_t splits into N linear slots and a length-N
integer vector maps to the polynomial whose evaluations at the primitive
2N-th roots are the vector entries.

TPU-first deviations:
  * the slot order follows the 5^j rotation group (the same generator the
    Galois layer uses, ops/galois.py) instead of SEAL's generator-3 matrix
    layout, so `rotate_rows(step)` == sigma_{5^step} and `rotate_columns`
    == sigma_{2N-1} act as row-rotation / row-swap with no extra index
    plumbing;
  * encode/decode run on host through the exact integer NTT
    (core/ntt_tables.golden_*): encoding is not a hot path (it feeds
    encrypt, which dominates), and host-exact math doubles as the golden
    reference for the device kernels.
"""

from __future__ import annotations

import numpy as np

from ..core import numth
from ..core.ntt_tables import golden_forward_ntt, golden_inverse_ntt, make_ntt_tables
from ..ops import w64
from .ciphertext import Plaintext
from .context import FheContext


class BatchEncoder:
    def __init__(self, context: FheContext):
        params = context.params
        t = params.plain_modulus
        if t is None:
            raise ValueError("batch encoder requires a plain modulus")
        n = context.n
        if t.value % (2 * n) != 1 or not t.is_prime:
            raise ValueError(
                "plain modulus must be an NTT-friendly prime (t = 1 mod 2N) "
                "for batching; use PlainModulus.batching"
            )
        self.context = context
        self.t = t
        self.n = n
        self.slots = n
        self._tables = make_ntt_tables(params.log_n, t.value)

        # Slot layout: two rows of N/2. Row 0 slot j lives at the root with
        # exponent 5^j mod 2N, row 1 slot j at exponent -(5^j) mod 2N.  Our
        # NTT ordering stores f(psi^(2*br(i)+1)) at index i (ops/galois.py),
        # so we build position-of-exponent once and gather.
        two_n = 2 * n
        log_n = params.log_n
        e = 2 * numth.bit_reverse_perm(log_n) + 1      # exponent at index i
        pos_of_e = np.zeros(two_n, dtype=np.int64)
        pos_of_e[e] = np.arange(n)
        half = n // 2
        exps = np.empty(n, dtype=np.int64)
        cur = 1
        for j in range(half):
            exps[j] = cur
            exps[half + j] = two_n - cur
            cur = (cur * 5) % two_n
        self._slot_to_index = pos_of_e[exps]           # slot j -> NTT index

    # -- public API -------------------------------------------------------
    def encode(self, values, chain_index: int = 1) -> Plaintext:
        """Integer vector (len <= N, entries reduced mod t) -> Plaintext.

        Returns coefficient-form data (1, N) mod t (reference encode path:
        scatter to matrix reps -> inverse plain NTT)."""
        vals = np.asarray(values, dtype=object).ravel()
        if vals.size > self.slots:
            raise ValueError("too many values for the slot count")
        tv = self.t.value
        evals = [0] * self.n
        for j, v in enumerate(vals):
            evals[self._slot_to_index[j]] = int(v) % tv
        coeffs = golden_inverse_ntt(evals, self._tables)
        data = np.asarray(coeffs, dtype=np.uint64).reshape(1, self.n)
        return Plaintext(
            data=w64.as_w64(data), chain_index=chain_index, scale=1.0,
            is_ntt_form=False,
        )

    def decode(self, pt: Plaintext) -> np.ndarray:
        """Plaintext (coefficient form mod t) -> length-N uint64 vector."""
        coeffs = np.asarray(pt.data.to_u64()).reshape(-1)[: self.n]
        evals = golden_forward_ntt([int(c) for c in coeffs], self._tables)
        out = np.asarray(evals, dtype=np.uint64)
        return out[self._slot_to_index]
