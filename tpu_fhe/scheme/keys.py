"""Key generation, encryption, decryption (CKKS/BGV/BFV common RLWE core).

Behavioural mirror of the reference's PhantomSecretKey machinery
(src/secretkey.cu): ternary secret in NTT form at the key level; public key
pk = (-(a s + e), a); hybrid key-switching keys with dnum digits where digit
d's first component carries + P * s_new * 1_{digit d limbs}
(src/secretkey.cu:362-406 generate_one_kswitch_key); Galois keys map
automorphism elements to switching keys for the rotated secret
(src/secretkey.cu:956-1024 EvalAtIndexKeyGen, fused form).

Everything is functional: keys are frozen pytrees of device arrays.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..core.params import SchemeType
from ..ops import w64
from ..ops import w64 as mm
from ..ops.w64 import W64
from ..ops.galois import apply_galois_ntt, galois_elt_from_step
from ..ops.ntt import forward_ntt, inverse_ntt
from . import prng
from .ciphertext import Ciphertext, Plaintext
from .context import FheContext


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class PublicKey:
    data: "W64"  # (2, size_QP, N): [b, a]

    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class RelinKey:
    """Hybrid KS key: data[d] = (b_d, a_d) at key level, d < dnum.

    shoup (optional) holds precomputed Shoup companion words of every key
    limb — floor(data * 2^64 / q) as a same-shaped W64, or, in the q32
    regime, floor(data * 2^32 / q) as a uint32 array — letting the
    keyswitch inner product run one lazy Shoup multiply per digit instead
    of a 128-bit MAC chain + Barrett landing (ops/ks_pallas.py).  Doubles
    the key's HBM footprint, so it is on by default only for relin keys
    (one per context); rotation-key sets opt in via galois_key(shoup=True)."""

    data: "W64"  # (dnum, 2, size_QP, N)
    shoup: "W64 | jnp.ndarray | None" = None

    def tree_flatten(self):
        return (self.data, self.shoup), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@dataclass(frozen=True)
class GaloisKey:
    """Map from automorphism element -> switching key (fused form)."""

    keys: dict[int, RelinKey]

    def key_for_elt(self, elt: int) -> RelinKey:
        try:
            return self.keys[elt]
        except KeyError:
            raise ValueError(
                f"no Galois key for automorphism element {elt}; generate it "
                f"with SecretKey.galois_key([...]) for the required steps"
            ) from None


class SecretKey:
    """Holds the ternary secret (NTT form, key level) and key factories."""

    def __init__(self, context: FheContext, key: jax.Array | int = 0):
        self.context = context
        # BGV encrypts with t-scaled noise (b = -(a s + t e)); t mod q_i at
        # the key level, sliced per level inside the samplers.
        self._t_mod_key = None
        if context.scheme == SchemeType.bgv:
            t = context.params.plain_modulus.value
            self._t_mod_key = np.array(
                [[t % m.value] for m in context.key_modulus], dtype=np.uint64
            )
        if isinstance(key, int):
            key = jax.random.key(key)
        self._key = key
        kl = context.key_level
        k_sk, self._next = jax.random.split(key)
        # every device-compute path is jitted: the host-resident context
        # tables become compile-time constants instead of per-op transfers
        self.s_ntt = jax.jit(
            lambda k: forward_ntt(prng.sample_ternary(k, context.n, kl.mod.q), kl.ntt)
        )(k_sk)  # (size_QP, N) W64
        self._enc_zero_jit = jax.jit(self._enc_zero_under)
        self._kswitch_jit = jax.jit(self._kswitch_impl)
        self._encrypt_jit = jax.jit(self._encrypt_symmetric_impl)
        self._decrypt_jit = jax.jit(self._decrypt_impl)

    def _fresh_key(self):
        k, self._next = jax.random.split(self._next)
        return k

    def _scale_error(self, e: "W64", level) -> "W64":
        """t*e for BGV (reference: BGV encryptions carry t-scaled noise)."""
        if self._t_mod_key is None:
            return e
        tm = self._t_mod_key[list(level.limb_indices)]
        return mm.mul_mod(e, tm, level.mod.q, level.mod.ratio_lo, level.mod.ratio_hi)

    def public_key(self) -> PublicKey:
        return PublicKey(self._enc_zero_jit(self._fresh_key(), self.s_ntt))

    # -- switching keys ---------------------------------------------------
    def _enc_zero_under(self, rng_key, secret_ntt: "W64") -> "W64":
        """(b, a) with b = -(a * secret + e) at key level (NTT form)."""
        ctx = self.context
        kl = ctx.key_level
        k_a, k_e = jax.random.split(rng_key)
        a = prng.sample_uniform(
            k_a, kl.size, ctx.n, kl.mod.q, kl.mod.ratio_lo, kl.mod.ratio_hi
        )
        e = forward_ntt(
            self._scale_error(prng.sample_cbd_error(k_e, ctx.n, kl.mod.q), kl),
            kl.ntt,
        )
        a_s = mm.mul_mod(a, secret_ntt, kl.mod.q, kl.mod.ratio_lo, kl.mod.ratio_hi)
        b = mm.neg_mod(mm.add_mod(a_s, e, kl.mod.q), kl.mod.q)
        return w64.stack([b, a])

    def _kswitch_key(
        self, target_ntt: "W64", under_ntt: "W64 | None" = None,
        shoup: bool = False,
    ) -> RelinKey:
        """Key-switching key: digit d = Enc_{under}(P * target * 1_{digit d}).

        `under` defaults to s.  Galois keys use the reference's fused form
        (src/secretkey.cu:408-452 generate_one_kswitch_key_fused): encrypt
        P*s under the inverse-rotated secret, so one modup of an UNROTATED
        c1 can be shared across many rotations (hoisting) and the
        automorphism is applied to the keyswitch output."""
        ctx = self.context
        if under_ntt is None:
            under_ntt = self.s_ntt
        size_P = ctx.params.size_P
        size_Q = ctx.params.size_Q
        dnum = (size_Q + size_P - 1) // size_P
        rng_keys = jax.random.split(self._fresh_key(), dnum)
        data = self._kswitch_jit(rng_keys, target_ntt, under_ntt)
        shoup_planes = self._evk_shoup(data) if shoup else None
        if ctx.is_q32:
            # q32 regime: every residue < 2^30 fits the lo plane — store
            # keys as bare u32 (HALF the HBM; the q32 inner-product
            # kernels only ever read evk.lo).  Key memory dominates HBM
            # at logN=16, where W64-pair storage OOMs a 16 GB v5e.
            data = jax.jit(lambda d: d.lo)(data)
        return RelinKey(data, shoup_planes)

    def _evk_shoup(self, data: "W64"):
        """Shoup companion planes for a switching key's limbs, computed on
        device (q32 plan: floor(w*2^32/q) u32; else floor(w*2^64/q) W64)."""
        ctx = self.context
        kl = ctx.key_level
        from ..ops.ntt_pallas import NTTPlan32

        fn = self.__dict__.get("_evk_shoup_jit")
        if fn is None:
            if isinstance(kl.ntt.plan, NTTPlan32):
                q_host = np.array(
                    [m.value for m in ctx.key_modulus], dtype=np.uint64
                )
                fn = jax.jit(lambda d: w64.shoup32_of(d.lo, q_host))
            else:
                fn = jax.jit(lambda d: w64.shoup_of(
                    d, kl.mod.q, kl.mod.ratio_lo, kl.mod.ratio_hi
                ))
            self._evk_shoup_jit = fn
        return fn(data)

    def _kswitch_impl(self, rng_keys, target_ntt: "W64", under_ntt: "W64") -> "W64":
        ctx = self.context
        kl = ctx.key_level
        size_P = ctx.params.size_P
        size_Q = ctx.params.size_Q
        dnum = (size_Q + size_P - 1) // size_P
        # P mod q_i at the key level, shaped (size_QP, 1)
        big_p = ctx.base_P.big_modulus
        p_mod_q = np.array(
            [[big_p % m.value] for m in ctx.key_modulus], dtype=np.uint64
        )

        keys = []
        for d in range(dnum):
            pk = self._enc_zero_under(rng_keys[d], under_ntt)
            start = d * size_P
            end = min(start + size_P, size_Q)
            sl = slice(start, end)
            chunk = mm.mul_mod(
                target_ntt[sl],
                p_mod_q[sl],
                kl.mod.q[sl],
                kl.mod.ratio_lo[sl],
                kl.mod.ratio_hi[sl],
            )
            b_piece = mm.add_mod(pk[0, sl], chunk, kl.mod.q[sl])
            pk = pk.at[0, sl].set(b_piece)
            keys.append(pk)
        return w64.stack(keys)

    def relin_key(self, shoup: bool = True) -> RelinKey:
        """The relinearization key; `shoup` (default on) attaches Shoup
        companion planes so relin rides the cheap inner-product kernel
        (2x the key's HBM at one key per context)."""
        kl = self.context.key_level
        s2 = jax.jit(
            lambda s: mm.mul_mod(s, s, kl.mod.q, kl.mod.ratio_lo, kl.mod.ratio_hi)
        )(self.s_ntt)
        return self._kswitch_key(s2, shoup=shoup)

    def galois_key(self, steps: list[int], include_conj: bool = False,
                   shoup: bool = False) -> GaloisKey:
        """Switching keys for rotations by the given slot steps (fused:
        one key per automorphism element, as EvalAtIndexKeyGen).  `shoup`
        doubles every key's HBM footprint for a faster inner product —
        default off because rotation-key sets dominate HBM at large N."""
        ctx = self.context
        n = ctx.n
        elts = [galois_elt_from_step(s, n) for s in steps]
        if include_conj:
            elts.append(2 * n - 1)
        keys = {}
        for elt in set(elts):
            keys[elt] = self._galois_key_for_elt(elt, shoup=shoup)
        return GaloisKey(keys)

    def galois_key_power_of_2(self, include_conj: bool = False,
                              shoup: bool = False) -> GaloisKey:
        """Classic O(log N) key set: rotations by +/- 2^i slots for every
        i < log2(N/2) (the reference's create_galois_keys default element
        set, src/secretkey.cu:532+).  Any other step then rotates via its
        NAF decomposition in ev.rotate — log-many sequential rotations with
        only 2*log2(N/2) keys resident, the fallback when a step has no
        fused key."""
        n = self.context.n
        steps: list[int] = []
        p = 1
        while p < n // 2:
            steps.extend([p, -p])
            p <<= 1
        return self.galois_key(steps, include_conj=include_conj, shoup=shoup)

    def _galois_key_for_elt(self, elt: int, shoup: bool = False) -> RelinKey:
        """Fused-form key: Enc_{sigma_elt^{-1}(s)}(P*s); rotation then
        key-switches the unrotated c1 and applies sigma_elt to the output."""
        n = self.context.n
        inv_elt = pow(elt, -1, 2 * n)
        s_inv_rot = apply_galois_ntt(self.s_ntt, inv_elt, n)
        return self._kswitch_key(self.s_ntt, under_ntt=s_inv_rot, shoup=shoup)

    # -- encryption -------------------------------------------------------
    def encrypt_symmetric(self, pt: Plaintext) -> Ciphertext:
        """c = (b + m, a) with fresh (b, a) at the plaintext's level."""
        return self._encrypt_jit(pt, self._fresh_key())

    def encrypt_symmetric_seeded(self, pt: Plaintext):
        """Returns (ct, seed): the seed regenerates c1 = a on load
        (reference save_symmetric/load_symmetric seed compression)."""
        key = self._fresh_key()
        ct = self._encrypt_jit(pt, key)
        return ct, np.asarray(jax.random.key_data(key))

    def _encrypt_symmetric_impl(self, pt: Plaintext, rng_key) -> Ciphertext:
        ctx = self.context
        level = ctx.level(pt.chain_index)
        idx = list(level.limb_indices)
        k_a, k_e = jax.random.split(rng_key)
        a = prng.sample_uniform(
            k_a, level.size, ctx.n, level.mod.q, level.mod.ratio_lo,
            level.mod.ratio_hi,
        )
        e = forward_ntt(
            self._scale_error(
                prng.sample_cbd_error(k_e, ctx.n, level.mod.q), level
            ),
            level.ntt,
        )
        s = self.s_ntt[jnp.asarray(idx)]
        a_s = mm.mul_mod(a, s, level.mod.q, level.mod.ratio_lo, level.mod.ratio_hi)
        b = mm.neg_mod(mm.add_mod(a_s, e, level.mod.q), level.mod.q)
        c0 = mm.add_mod(b, pt.data, level.mod.q)
        data = w64.stack([c0, a])
        if ctx.is_q32:
            data = w64.compact(data)  # residues < 2^30: hi plane is zero
        return Ciphertext(
            data=data,
            chain_index=pt.chain_index,
            scale=pt.scale,
            noise_scale_deg=pt.noise_scale_deg,
            is_ntt_form=True,
        )

    def encrypt_zero_symmetric(self, chain_index: int) -> Ciphertext:
        """Fresh RLWE zero encryption (b, a) in NTT form at the level."""
        level = self.context.level(chain_index)
        pt = Plaintext(
            data=w64.zeros((level.size, self.context.n)),
            chain_index=chain_index,
            is_ntt_form=True,
        )
        return self._encrypt_jit(pt, self._fresh_key())

    # -- decryption -------------------------------------------------------
    def decrypt(self, ct: Ciphertext) -> Plaintext:
        """CKKS/BGV NTT-form decrypt: m = sum_i c_i s^i (NTT domain)."""
        return self._decrypt_jit(ct)

    def _decrypt_impl(self, ct: Ciphertext) -> Plaintext:
        ctx = self.context
        level = ctx.level(ct.chain_index)
        idx = jnp.asarray(list(level.limb_indices))
        s = self.s_ntt[idx]
        q, rlo, rhi = level.mod.q, level.mod.ratio_lo, level.mod.ratio_hi
        acc = ct.data[ct.size - 1]
        for i in range(ct.size - 2, -1, -1):
            acc = mm.mul_mod(acc, s, q, rlo, rhi)
            acc = mm.add_mod(acc, ct.data[i], q)
        return Plaintext(
            data=acc,
            chain_index=ct.chain_index,
            scale=ct.scale,
            noise_scale_deg=ct.noise_scale_deg,
            is_ntt_form=True,
        )


_ASYM_JIT: dict[int, object] = {}


def encrypt_asymmetric(
    context: FheContext, pk: PublicKey, pt: Plaintext, rng_key
) -> Ciphertext:
    """c = (u*pk0 + e0 + m, u*pk1 + e1) at the plaintext's level."""
    fn = _ASYM_JIT.get(id(context))
    if fn is None:
        fn = jax.jit(
            lambda pk_, pt_, k_: _encrypt_asymmetric_impl(context, pk_, pt_, k_)
        )
        _ASYM_JIT[id(context)] = fn
    return fn(pk, pt, rng_key)


def _encrypt_asymmetric_impl(
    context: FheContext, pk: PublicKey, pt: Plaintext, rng_key
) -> Ciphertext:
    level = context.level(pt.chain_index)
    idx = jnp.asarray(list(level.limb_indices))
    q, rlo, rhi = level.mod.q, level.mod.ratio_lo, level.mod.ratio_hi
    k_u, k_e0, k_e1 = jax.random.split(rng_key, 3)
    u = forward_ntt(prng.sample_ternary(k_u, context.n, q), level.ntt)
    e0c = prng.sample_cbd_error(k_e0, context.n, q)
    e1c = prng.sample_cbd_error(k_e1, context.n, q)
    if context.scheme == SchemeType.bgv:
        t = context.params.plain_modulus.value
        tm = np.array(
            [[t % context.key_modulus[i].value] for i in level.limb_indices],
            dtype=np.uint64,
        )
        e0c = mm.mul_mod(e0c, tm, q, rlo, rhi)
        e1c = mm.mul_mod(e1c, tm, q, rlo, rhi)
    e0 = forward_ntt(e0c, level.ntt)
    e1 = forward_ntt(e1c, level.ntt)
    pk0 = pk.data[0, idx]
    pk1 = pk.data[1, idx]
    c0 = mm.add_mod(mm.mul_mod(u, pk0, q, rlo, rhi), e0, q)
    c0 = mm.add_mod(c0, pt.data, q)
    c1 = mm.add_mod(mm.mul_mod(u, pk1, q, rlo, rhi), e1, q)
    data = w64.stack([c0, c1])
    if context.is_q32:
        data = w64.compact(data)  # residues < 2^30: hi plane is zero
    return Ciphertext(
        data=data,
        chain_index=pt.chain_index,
        scale=pt.scale,
        noise_scale_deg=pt.noise_scale_deg,
        is_ntt_form=True,
        is_asymmetric=True,
    )
