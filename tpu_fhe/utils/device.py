"""Batched host->device shipping of table object graphs.

On a tunneled TPU each jax.device_put costs ~100ms of RPC latency, while one
batched call moving hundreds of arrays is nearly free; and numpy arrays
closed over inside jit are INLINED into the HLO as literals (enormous
compile times), while device arrays become hidden executable parameters.
So: build every precompute table in host numpy, then ship the whole object
graph with ONE device_put via `ship_to_device`.
"""

from __future__ import annotations

import dataclasses

import numpy as np

_HOST_ONLY_FIELDS = {"roots", "roots_shoup", "inv_roots", "inv_roots_shoup"}


def _device_all(obj, memo: dict, arrays: list, rebuild: bool):
    """Two-phase batched device transfer over the context object graph.

    Phase 1 (rebuild=False): collect unique numpy arrays (skipping the lazy
    CPU-fallback twiddle tables).  Phase 2 (rebuild=True): rebuild the same
    structure substituting device arrays from `memo`.  Shared sub-objects
    (the NTT plan) are converted once via the id-keyed memo."""
    oid = id(obj)
    if isinstance(obj, np.ndarray):
        if not rebuild:
            if oid not in memo:
                memo[oid] = len(arrays)
                arrays.append(obj)
            return obj
        return memo[oid]
    if isinstance(obj, tuple):
        out = tuple(_device_all(o, memo, arrays, rebuild) for o in obj)
        return obj if all(a is b for a, b in zip(out, obj)) else out
    if isinstance(obj, list):
        out = [_device_all(o, memo, arrays, rebuild) for o in obj]
        return obj if all(a is b for a, b in zip(out, obj)) else out
    if isinstance(obj, dict):
        out = {k: _device_all(v, memo, arrays, rebuild) for k, v in obj.items()}
        return obj if all(out[k] is obj[k] for k in obj) else out
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        if rebuild and oid in memo:
            return memo[oid]
        changes = {}
        for f in dataclasses.fields(obj):
            if f.name in _HOST_ONLY_FIELDS:
                continue
            v = getattr(obj, f.name)
            nv = _device_all(v, memo, arrays, rebuild)
            if rebuild and nv is not v:
                changes[f.name] = nv
        if not rebuild:
            return obj
        out = dataclasses.replace(obj, **changes) if changes else obj
        memo[oid] = out
        return out
    return obj


def ship_to_device(roots) -> list:
    """One batched transfer for a list of root objects; returns rebuilt."""
    import jax as _jax

    memo: dict = {}
    arrays: list = []
    for r in roots:
        _device_all(r, memo, arrays, rebuild=False)
    device = _jax.device_put(arrays)
    idx_to_dev = {i: d for i, d in enumerate(device)}
    rebuilt_memo = {oid: idx_to_dev[i] for oid, i in memo.items()}
    for i, d in idx_to_dev.items():
        _HOST_MIRROR[id(d)] = (d, arrays[i])
    return [_device_all(r, rebuilt_memo, arrays, rebuild=True) for r in roots]


_ship_to_device = ship_to_device

# id(device_array) -> (device_array_ref, host_numpy).  The ref pins the
# device array so ids are never reused while an entry lives.
_HOST_MIRROR: dict = {}


def host_np(x, dtype=None) -> np.ndarray:
    """Host copy of a (usually context-table) array without repeated D2H.

    Tables are built on host, shipped once (ship_to_device) and then read
    back at every jit TRACE by dispatch code (np.asarray on a tunneled TPU
    array is a ~100ms RPC).  This returns the recorded host original for
    shipped arrays and memoizes the fetch for anything else concrete."""
    if isinstance(x, np.ndarray):
        return x if dtype is None else np.asarray(x, dtype=dtype)
    c = _HOST_MIRROR.get(id(x))
    if c is not None and c[0] is x:
        h = c[1]
    else:
        h = np.asarray(x)
        _HOST_MIRROR[id(x)] = (x, h)
    return h if dtype is None else np.asarray(h, dtype=dtype)
