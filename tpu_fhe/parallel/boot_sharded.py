"""Limb-sharded bootstrap BSGS level.

The bootstrap's wall-clock lives in the hoisted C2S/S2C BSGS levels
(reference structure: /root/reference/src/bootstrap.cu:1256-1402); for the
distributed layer to matter for the flagship workload, exactly this
structure must run under the ('batch', 'limb') mesh.  This module jits ONE
hoisted BSGS level (boot._bsgs_level — the same function the single-chip
path runs) with:

  * ciphertext limbs sharded over `limb` (parallel.sharding.ct_sharding),
  * every switching key's key-level limb axis sharded
    (parallel.sharding.key_sharding, zero-padded to the mesh),
  * the BSGS plaintexts replicated (they are per-level constants).

GSPMD partitions the program and inserts the digit collectives; the
compiled-HLO collective stats are returned so the communication layout is
verifiable.  Bit-identity against the unsharded level is asserted by
tests/test_boot_sharded.py and the driver dryrun (__graft_entry__).
"""

from __future__ import annotations

import re

import jax
import numpy as np

from .sharding import _pad_limb_axis, ct_sharding, key_sharding

_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "all-to-all",
    "collective-permute",
)


def collective_stats(hlo_text: str) -> dict:
    """Count logical collective ops in compiled HLO text.

    Async collectives lower as start/done pairs; counting only the
    `-start` form plus the plain synchronous form (which never matches a
    start/done line) counts each logical collective exactly once."""
    out: dict[str, int] = {}
    for name in _COLLECTIVES:
        c = (len(re.findall(rf"\b{name}-start\(", hlo_text))
             + len(re.findall(rf"\b{name}\(", hlo_text)))
        if not c:
            c = len(re.findall(rf"= \S+ {name}(?![\w-])", hlo_text))
        if c:
            out[name] = c
    return out


def _shard_keys(keys: dict, mesh) -> dict:
    from ..scheme.keys import RelinKey

    n_limb = mesh.shape["limb"]
    ks = key_sharding(mesh)
    out = {}
    for elt, k in keys.items():
        shoup = None
        if k.shoup is not None:
            shoup = jax.device_put(_pad_limb_axis(k.shoup, n_limb), ks)
        out[elt] = RelinKey(
            jax.device_put(_pad_limb_axis(k.data, n_limb), ks), shoup
        )
    return out


def bsgs_level_limb_sharded(boot, ct, slots: int, mesh,
                            stage: int = 0, which: str = "c2s"):
    """Run one hoisted C2S/S2C BSGS level limb-sharded over `mesh`.

    Returns (result ciphertext, collective-op counts from the compiled
    HLO).  The result must be bit-identical to the unsharded
    boot._bsgs_level on the same inputs."""
    plans = (boot.c2s_stage_plans(slots) if which == "c2s"
             else boot.s2c_stage_plans(slots))
    si, rot_in, rot_out, b, g, num_rot, _ = plans[stage]
    pre = boot.precom[slots]
    A = (pre.a_c2s if which == "c2s" else pre.a_s2c)[si]
    keys = boot._keys_for(rot_in, rot_out)

    data_s = jax.device_put(ct.data, ct_sharding(mesh))
    keys_s = _shard_keys(keys, mesh)

    def level_fn(c_data, ks):
        res = boot._bsgs_level(
            ct.with_data(c_data), A, ks, rot_in, rot_out, b, g, num_rot
        )
        return res.data

    step = jax.jit(level_fn)
    with mesh:
        compiled = step.lower(data_s, keys_s).compile()
        out_data = compiled(data_s, keys_s)
        jax.block_until_ready(out_data)
    stats = collective_stats(compiled.as_text())

    # reconstruct metadata by tracing the same function's output aux
    ref_struct = jax.eval_shape(
        lambda c: boot._bsgs_level(ct.with_data(c.data), A, keys,
                                   rot_in, rot_out, b, g, num_rot),
        ct,
    )
    result = ref_struct.with_data(out_data) if hasattr(ref_struct, "with_data") \
        else ct.with_data(out_data)
    return result, stats
