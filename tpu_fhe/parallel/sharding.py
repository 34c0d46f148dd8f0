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
    """Switching keys: (dnum, 2, size_QP, N) with the limb axis sharded.

    Keys dominate HBM at scale (a fused Galois key set at N=2^16 is tens
    of GB), so they MUST shard over the limb mesh — replication cannot
    scale.  GSPMD pads the last shard when size_QP is not divisible by
    the mesh; the keyswitch program's Ql ++ P row gather becomes a
    resharding collective inserted by the partitioner (measured by
    benchmarks/scaling_bench.py --mode limb via HLO collective counts)."""
    return NamedSharding(mesh, P(None, None, "limb", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ciphertext(ct, mesh: Mesh, batched: bool = False):
    return ct.with_data(jax.device_put(ct.data, ct_sharding(mesh, batched)))


def _pad_limb_axis(arr, n_limb: int, axis: int = 2):
    """Zero-pad the limb axis to a multiple of the limb-mesh size so
    device_put can shard it (GSPMD-style padding done explicitly; the
    evaluator indexes key rows by size_QP from params, never by the
    padded array shape, so pad rows are dead weight only)."""
    from ..ops import w64 as _w64
    from ..ops.w64 import W64
    import jax.numpy as jnp

    rows = arr.shape[axis]
    pad = (-rows) % n_limb
    if pad == 0:
        return arr
    pad_shape = list(arr.shape)
    pad_shape[axis] = pad
    if isinstance(arr, W64):
        return _w64.concat([arr, _w64.zeros(tuple(pad_shape))], axis=axis)
    return jnp.concatenate(
        [arr, jnp.zeros(pad_shape, dtype=arr.dtype)], axis=axis
    )


def shard_relin_key(key, mesh: Mesh):
    from ..scheme.keys import RelinKey

    n_limb = mesh.shape["limb"]
    ks = key_sharding(mesh)
    shoup = None
    if key.shoup is not None:
        shoup = jax.device_put(_pad_limb_axis(key.shoup, n_limb), ks)
    return RelinKey(jax.device_put(_pad_limb_axis(key.data, n_limb), ks), shoup)
