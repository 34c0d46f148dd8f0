"""CKKS end-to-end: encode/decode, encrypt/decrypt, eval ops."""

import numpy as np
import pytest

from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.eval import evaluator as ev
from tpu_fhe.scheme.ckks_encoder import CkksEncoder
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey, encrypt_asymmetric

import jax

RNG = np.random.default_rng(123)


def make_ckks(n=256, bits=(50, 40, 40, 50), size_p=1):
    mods = CoeffModulus.create(n, list(bits))
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(mods),
        special_modulus_size=size_p,
    )
    ctx = FheContext(params)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=7)
    return ctx, enc, sk


@pytest.fixture(scope="module")
def ckks():
    return make_ckks()


def test_encode_decode_roundtrip(ckks):
    ctx, enc, sk = ckks
    slots = ctx.n // 2
    z = RNG.standard_normal(slots) + 1j * RNG.standard_normal(slots)
    pt = enc.encode(z, scale=2.0**40)
    back = enc.decode(pt)
    np.testing.assert_allclose(back, z, atol=1e-8)


def test_encode_decode_sparse(ckks):
    ctx, enc, sk = ckks
    z = RNG.standard_normal(16)
    pt = enc.encode(z, scale=2.0**40, slots=16)
    back = enc.decode(pt, slots=16)
    np.testing.assert_allclose(back.real, z, atol=1e-8)


def test_encrypt_decrypt_symmetric(ckks):
    ctx, enc, sk = ckks
    z = RNG.standard_normal(ctx.n // 2)
    pt = enc.encode(z, scale=2.0**40)
    ct = sk.encrypt_symmetric(pt)
    dec = enc.decode(sk.decrypt(ct))
    np.testing.assert_allclose(dec.real, z, atol=1e-4)


def test_encrypt_decrypt_asymmetric(ckks):
    ctx, enc, sk = ckks
    pk = sk.public_key()
    z = RNG.standard_normal(ctx.n // 2)
    pt = enc.encode(z, scale=2.0**40)
    ct = encrypt_asymmetric(ctx, pk, pt, jax.random.key(3))
    dec = enc.decode(sk.decrypt(ct))
    np.testing.assert_allclose(dec.real, z, atol=1e-3)


def test_add_sub(ckks):
    ctx, enc, sk = ckks
    a = RNG.standard_normal(ctx.n // 2)
    b = RNG.standard_normal(ctx.n // 2)
    ca = sk.encrypt_symmetric(enc.encode(a, scale=2.0**40))
    cb = sk.encrypt_symmetric(enc.encode(b, scale=2.0**40))
    np.testing.assert_allclose(
        enc.decode(sk.decrypt(ev.add(ctx, ca, cb))).real, a + b, atol=1e-3
    )
    np.testing.assert_allclose(
        enc.decode(sk.decrypt(ev.sub(ctx, ca, cb))).real, a - b, atol=1e-3
    )


def test_add_multiply_plain(ckks):
    ctx, enc, sk = ckks
    a = RNG.standard_normal(ctx.n // 2)
    b = RNG.standard_normal(ctx.n // 2)
    scale = 2.0**40
    ca = sk.encrypt_symmetric(enc.encode(a, scale=scale))
    pb = enc.encode(b, scale=scale)
    np.testing.assert_allclose(
        enc.decode(sk.decrypt(ev.add_plain(ctx, ca, pb))).real, a + b, atol=1e-3
    )
    prod = ev.multiply_plain(ctx, ca, pb)
    prod = ev.rescale_to_next(ctx, prod)
    np.testing.assert_allclose(
        enc.decode(sk.decrypt(prod)).real, a * b, atol=1e-2
    )


def test_multiply_relin_rescale(ckks):
    ctx, enc, sk = ckks
    rlk = sk.relin_key()
    a = RNG.standard_normal(ctx.n // 2)
    b = RNG.standard_normal(ctx.n // 2)
    scale = 2.0**40
    ca = sk.encrypt_symmetric(enc.encode(a, scale=scale))
    cb = sk.encrypt_symmetric(enc.encode(b, scale=scale))
    prod = ev.multiply(ctx, ca, cb)
    prod = ev.relinearize(ctx, prod, rlk)
    prod = ev.rescale_to_next(ctx, prod)
    assert prod.chain_index == 2
    dec = enc.decode(sk.decrypt(prod)).real
    np.testing.assert_allclose(dec, a * b, atol=1e-2)


def test_multiply_depth2(ckks):
    ctx, enc, sk = ckks
    rlk = sk.relin_key()
    a = RNG.standard_normal(ctx.n // 2) * 0.5
    scale = 2.0**40
    ca = sk.encrypt_symmetric(enc.encode(a, scale=scale))
    sq = ev.rescale_to_next(ctx, ev.relinearize(ctx, ev.square(ctx, ca), rlk))
    quad = ev.rescale_to_next(ctx, ev.relinearize(ctx, ev.square(ctx, sq), rlk))
    dec = enc.decode(sk.decrypt(quad)).real
    np.testing.assert_allclose(dec, a**4, atol=1e-1)


def test_rotate_and_conjugate(ckks):
    ctx, enc, sk = ckks
    gk = sk.galois_key([1, 5, -3], include_conj=True)
    slots = ctx.n // 2
    z = RNG.standard_normal(slots) + 1j * RNG.standard_normal(slots)
    ct = sk.encrypt_symmetric(enc.encode(z, scale=2.0**40))
    for step in (1, 5, -3):
        rot = ev.rotate(ctx, ct, step, gk)
        dec = enc.decode(sk.decrypt(rot))
        np.testing.assert_allclose(dec, np.roll(z, -step), atol=1e-3)
    conj = ev.conjugate(ctx, ct, gk)
    np.testing.assert_allclose(enc.decode(sk.decrypt(conj)), z.conj(), atol=1e-3)


def test_keyswitch_multidigit():
    # alpha = 2 special primes, 4 data primes -> beta = 2 digits
    ctx, enc, sk = make_ckks(
        n=128, bits=(50, 40, 40, 40, 50, 50), size_p=2
    )
    rlk = sk.relin_key()
    gk = sk.galois_key([2])
    a = RNG.standard_normal(ctx.n // 2)
    b = RNG.standard_normal(ctx.n // 2)
    scale = 2.0**40
    ca = sk.encrypt_symmetric(enc.encode(a, scale=scale))
    cb = sk.encrypt_symmetric(enc.encode(b, scale=scale))
    prod = ev.rescale_to_next(ctx, ev.relinearize(ctx, ev.multiply(ctx, ca, cb), rlk))
    np.testing.assert_allclose(enc.decode(sk.decrypt(prod)).real, a * b, atol=1e-2)
    rot = ev.rotate(ctx, ca, 2, gk)
    np.testing.assert_allclose(
        enc.decode(sk.decrypt(rot)).real, np.roll(a, -2), atol=1e-3
    )
