"""Device-mesh sharding for FHE workloads.

The reference is single-GPU (SURVEY.md section 1: no NCCL/MPI anywhere); the
distributed layer is designed fresh for TPU per SURVEY.md section 2.3:

  * `limb` axis — RNS-residue tensor parallelism.  NTT and elementwise ops
    are limb-independent (no communication); the keyswitch basis-conversion
    matmuls and digit inner products induce all-gathers / reduce-scatters
    over this axis, inserted by XLA's SPMD partitioner from sharding
    annotations (GSPMD), riding ICI.
  * `batch` axis — data parallelism over independent ciphertexts (the DNN
    layer vmaps channels here).
  * a `coeff` axis (ring-dimension sharding with stage-wise all-to-all in
    the NTT) is the sequence-parallel analog, handled by the 4-step NTT in
    tpu_fhe.parallel.ntt4step.

Keys (relin/galois) are replicated over `batch` and sharded over `limb` on
their key-level limb axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_batch: int, n_limb: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_batch * n_limb > len(devices):
        raise ValueError(
            f"mesh {n_batch}x{n_limb} needs {n_batch*n_limb} devices, "
            f"have {len(devices)}"
        )
    dev = np.asarray(devices[: n_batch * n_limb]).reshape(n_batch, n_limb)
    return Mesh(dev, ("batch", "limb"))


def ct_sharding(mesh: Mesh, batched: bool = False) -> NamedSharding:
    """Ciphertext data: (B?, size, L, N) with L sharded over `limb`."""
    if batched:
        return NamedSharding(mesh, P("batch", None, "limb", None))
    return NamedSharding(mesh, P(None, "limb", None))


def key_sharding(mesh: Mesh) -> NamedSharding:
    """Switching keys: (dnum, 2, size_QP, N).

    Replicated: size_QP (= size_Q + size_P) is generally not divisible by
    the limb-mesh size even when size_Q is, and keys are long-lived
    weight-like operands — XLA re-shards the per-level slices it needs
    inside the keyswitch program."""
    return NamedSharding(mesh, P())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ciphertext(ct, mesh: Mesh, batched: bool = False):
    return ct.with_data(jax.device_put(ct.data, ct_sharding(mesh, batched)))


def shard_relin_key(key, mesh: Mesh):
    from ..scheme.keys import RelinKey

    return RelinKey(jax.device_put(key.data, key_sharding(mesh)))
