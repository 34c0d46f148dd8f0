"""Serialization: save/load for ciphertexts, plaintexts, and keys.

Behavioural counterpart of the reference's binary save/load streams
(include/ciphertext.h:184-318, include/secretkey.h:86-447,
examples/serialization.cu), including the seed-compressed symmetric form
that stores only c0 plus the PRNG seed and regenerates c1 = a on load
(save_symmetric/load_symmetric).

Format: numpy .npz (zip of arrays) + a JSON metadata entry — dense u64
payloads stored as the two u32 planes, exactly the device representation,
so round-trips are bit-exact and loads are a single batched device_put.
"""

from __future__ import annotations

import io
import json

import numpy as np
import jax

from ..ops import w64
from ..ops.w64 import W64
from ..scheme.ciphertext import Ciphertext, Plaintext
from ..scheme.context import FheContext
from ..scheme.keys import GaloisKey, PublicKey, RelinKey
from ..scheme import prng

_MAGIC = "tpu-fhe-v1"


def _planes(x: W64) -> tuple[np.ndarray, "np.ndarray | None"]:
    """(lo, hi) host planes; hi is None for compact (q32) payloads, which
    serialize at half the bytes and reload compact."""
    return np.asarray(x.lo), (
        None if x.hi_ is None else np.asarray(x.hi_)
    )


def _plane_arrays(lo, hi) -> dict:
    out = {"lo": lo}
    if hi is not None:
        out["hi"] = hi
    return out


def _w(lo: np.ndarray, hi: np.ndarray) -> W64:
    return W64(lo, hi)


def _dump(fp, meta: dict, arrays: dict):
    arrays = dict(arrays)
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"magic": _MAGIC, **meta}).encode(), dtype=np.uint8
    )
    np.savez(fp, **arrays)


def _load(fp) -> tuple[dict, dict]:
    npz = np.load(fp)
    meta = json.loads(bytes(npz["__meta__"]).decode())
    if meta.get("magic") != _MAGIC:
        raise ValueError("not a tpu-fhe serialized object")
    return meta, {k: npz[k] for k in npz.files}


# -- ciphertext ---------------------------------------------------------------

def save_ciphertext(ct: Ciphertext, fp):
    lo, hi = _planes(ct.data)
    _dump(fp, {
        "kind": "ciphertext",
        "chain_index": ct.chain_index,
        "scale": ct.scale,
        "correction_factor": ct.correction_factor,
        "noise_scale_deg": ct.noise_scale_deg,
        "is_ntt_form": ct.is_ntt_form,
    }, _plane_arrays(lo, hi))


def load_ciphertext(fp) -> Ciphertext:
    meta, data = _load(fp)
    if meta["kind"] != "ciphertext":
        raise ValueError(f"expected ciphertext, found {meta['kind']}")
    return Ciphertext(
        data=_w(data["lo"], data.get("hi")),
        chain_index=meta["chain_index"],
        scale=meta["scale"],
        correction_factor=meta["correction_factor"],
        noise_scale_deg=meta["noise_scale_deg"],
        is_ntt_form=meta["is_ntt_form"],
    )


def save_ciphertext_symmetric(ct: Ciphertext, seed: np.ndarray, fp):
    """Seed-compressed symmetric form: c0 + PRNG seed (c1 = a regenerated
    on load; reference save_symmetric, include/ciphertext.h:184-318).
    `seed` is the raw key data returned by SecretKey.encrypt_symmetric's
    seeded variant."""
    if ct.size != 2:
        raise ValueError("seed compression applies to fresh size-2 cts")
    lo, hi = _planes(ct.data[0])
    _dump(fp, {
        "kind": "ciphertext_sym",
        "chain_index": ct.chain_index,
        "scale": ct.scale,
        "correction_factor": ct.correction_factor,
        "noise_scale_deg": ct.noise_scale_deg,
        "is_ntt_form": ct.is_ntt_form,
    }, {**_plane_arrays(lo, hi), "seed": np.asarray(seed)})


def load_ciphertext_symmetric(ctx: FheContext, fp) -> Ciphertext:
    """Regenerate c1 = a from the stored seed (reference load_symmetric)."""
    from ..ops.ntt import forward_ntt

    meta, data = _load(fp)
    if meta["kind"] != "ciphertext_sym":
        raise ValueError(f"expected seeded ciphertext, found {meta['kind']}")
    level = ctx.level(meta["chain_index"])
    key = jax.random.wrap_key_data(np.asarray(data["seed"]))
    k_a, _ = jax.random.split(key)
    a = prng.sample_uniform(
        k_a, level.size, ctx.n, level.mod.q, level.mod.ratio_lo,
        level.mod.ratio_hi,
    )
    c0 = _w(data["lo"], data.get("hi"))
    return Ciphertext(
        data=w64.stack([c0, a]),
        chain_index=meta["chain_index"],
        scale=meta["scale"],
        correction_factor=meta["correction_factor"],
        noise_scale_deg=meta["noise_scale_deg"],
        is_ntt_form=meta["is_ntt_form"],
    )


# -- plaintext ----------------------------------------------------------------

def save_plaintext(pt: Plaintext, fp):
    lo, hi = _planes(pt.data)
    _dump(fp, {
        "kind": "plaintext",
        "chain_index": pt.chain_index,
        "scale": pt.scale,
        "noise_scale_deg": pt.noise_scale_deg,
        "is_ntt_form": pt.is_ntt_form,
    }, {"lo": lo, "hi": hi})


def load_plaintext(fp) -> Plaintext:
    meta, data = _load(fp)
    if meta["kind"] != "plaintext":
        raise ValueError(f"expected plaintext, found {meta['kind']}")
    return Plaintext(
        data=_w(data["lo"], data["hi"]),
        chain_index=meta["chain_index"],
        scale=meta["scale"],
        noise_scale_deg=meta["noise_scale_deg"],
        is_ntt_form=meta["is_ntt_form"],
    )


# -- keys ---------------------------------------------------------------------

def save_public_key(pk: PublicKey, fp):
    lo, hi = _planes(pk.data)
    _dump(fp, {"kind": "public_key"}, {"lo": lo, "hi": hi})


def load_public_key(fp) -> PublicKey:
    meta, data = _load(fp)
    if meta["kind"] != "public_key":
        raise ValueError(f"expected public key, found {meta['kind']}")
    return PublicKey(_w(data["lo"], data["hi"]))


def _key_planes(data):
    """Switching-key data: W64 pair, or compact u32 (q32 regime)."""
    if isinstance(data, W64):
        lo, hi = _planes(data)
        return {"lo": lo, "hi": hi}
    return {"lo": np.asarray(data)}


def _key_from_planes(arrays, prefix=""):
    lo = arrays[f"{prefix}lo"]
    hi = arrays.get(f"{prefix}hi")
    if hi is None:
        import jax.numpy as jnp

        return jnp.asarray(lo)       # compact q32 key
    return _w(lo, hi)


def save_relin_key(rk: RelinKey, fp):
    _dump(fp, {"kind": "relin_key"}, _key_planes(rk.data))


def load_relin_key(fp) -> RelinKey:
    meta, data = _load(fp)
    if meta["kind"] != "relin_key":
        raise ValueError(f"expected relin key, found {meta['kind']}")
    return RelinKey(_key_from_planes(data))


def save_galois_key(gk: GaloisKey, fp):
    arrays = {}
    elts = sorted(gk.keys)
    for elt in elts:
        for name, arr in _key_planes(gk.keys[elt].data).items():
            arrays[f"{name}_{elt}"] = arr
    _dump(fp, {"kind": "galois_key", "elts": elts}, arrays)


def load_galois_key(fp) -> GaloisKey:
    meta, data = _load(fp)
    if meta["kind"] != "galois_key":
        raise ValueError(f"expected galois key, found {meta['kind']}")
    keys = {}
    for elt in meta["elts"]:
        hi = data.get(f"hi_{elt}")
        if hi is None:
            import jax.numpy as jnp

            keys[elt] = RelinKey(jnp.asarray(data[f"lo_{elt}"]))
        else:
            keys[elt] = RelinKey(_w(data[f"lo_{elt}"], hi))
    return GaloisKey(keys)


def save_secret_key(sk, fp):
    """Stores the NTT-form secret at the key level (reference
    include/secretkey.h:405-447)."""
    lo, hi = _planes(sk.s_ntt)
    _dump(fp, {"kind": "secret_key"}, {"lo": lo, "hi": hi})


def load_secret_key(ctx: FheContext, fp, rng_key: int = 0):
    """Rebuild a SecretKey object around a stored secret polynomial."""
    from ..scheme.keys import SecretKey

    meta, data = _load(fp)
    if meta["kind"] != "secret_key":
        raise ValueError(f"expected secret key, found {meta['kind']}")
    sk = SecretKey.__new__(SecretKey)
    # manual init without re-sampling the secret
    sk.context = ctx
    sk._t_mod_key = None
    from ..core.params import SchemeType

    if ctx.scheme == SchemeType.bgv:
        t = ctx.params.plain_modulus.value
        sk._t_mod_key = np.array(
            [[t % m.value] for m in ctx.key_modulus], dtype=np.uint64
        )
    key = jax.random.key(rng_key)
    _, sk._next = jax.random.split(key)
    import jax.numpy as jnp

    sk.s_ntt = _w(jnp.asarray(data["lo"]), jnp.asarray(data["hi"]))
    sk._enc_zero_jit = jax.jit(sk._enc_zero_under)
    sk._kswitch_jit = jax.jit(sk._kswitch_impl)
    sk._encrypt_jit = jax.jit(sk._encrypt_symmetric_impl)
    sk._decrypt_jit = jax.jit(sk._decrypt_impl)
    return sk
