"""Ciphertext / plaintext containers (functional pytrees).

Mirrors the metadata contract of the reference's PhantomCiphertext /
PhantomPlaintext (include/ciphertext.h:7-407, include/plaintext.h) —
chain_index, scale, correction factor (BGV), FLEXIBLEAUTO noise-scale degree
— but as immutable pytrees: data is a (size, L, N) W64 u32-pair, ops return
new objects, and metadata rides in the aux treedef so jit sees it as static.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Ciphertext:
    data: object                # (size, L, N) W64 (u32-pair planes)
    chain_index: int            # index into the context chain (1 = fresh)
    scale: float = 1.0          # CKKS scaling factor
    correction_factor: int = 1  # BGV multiplicative correction
    noise_scale_deg: int = 1    # FLEXIBLEAUTO degree of the scaling factor
    is_ntt_form: bool = True
    is_asymmetric: bool = False

    @property
    def size(self) -> int:
        return self.data.shape[0]

    @property
    def num_limbs(self) -> int:
        return self.data.shape[1]

    @property
    def n(self) -> int:
        return self.data.shape[2]

    def with_data(self, data) -> "Ciphertext":
        return replace(self, data=data)

    def tree_flatten(self):
        aux = (
            self.chain_index, self.scale, self.correction_factor,
            self.noise_scale_deg, self.is_ntt_form, self.is_asymmetric,
        )
        return (self.data,), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def stack_cts(cts: list) -> Ciphertext:
    """Stack same-metadata ciphertexts into ONE batched ciphertext whose
    data leaves gain a leading batch axis (B, size, L, N).

    The batched form is consumed by vmapped stage programs (bootstrap /
    DNN activations): one XLA dispatch processes every channel, which is
    the TPU-native replacement for the reference's per-channel ciphertext
    loop (src/dnn.cu:207-238 launches per-ct kernels serially per stream).
    Metadata must match exactly — it rides in the aux treedef and is
    shared by the whole batch."""
    first = cts[0]
    meta = first.tree_flatten()[1]
    for c in cts[1:]:
        if c.tree_flatten()[1] != meta:
            raise ValueError(
                "stack_cts: mismatched ciphertext metadata "
                f"({c.tree_flatten()[1]} != {meta})"
            )
    data = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *[c.data for c in cts]
    )
    return first.with_data(data)


def unstack_cts(ct: Ciphertext, batch: int) -> list:
    """Inverse of stack_cts: split the leading batch axis back into a list
    of per-channel ciphertexts."""
    return [
        ct.with_data(jax.tree_util.tree_map(lambda x: x[i], ct.data))
        for i in range(batch)
    ]


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Plaintext:
    data: object                # (L, N) W64 (RNS form) or (1, N) mod t (BFV)
    chain_index: int
    scale: float = 1.0
    noise_scale_deg: int = 1
    is_ntt_form: bool = True

    @property
    def num_limbs(self) -> int:
        return self.data.shape[0]

    def tree_flatten(self):
        aux = (self.chain_index, self.scale, self.noise_scale_deg, self.is_ntt_form)
        return (self.data,), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)
