"""Serialization round-trips: bit-exact save/load, seed-compressed cts."""

import io

import numpy as np
import pytest

from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.eval import evaluator as ev
from tpu_fhe.scheme.ckks_encoder import CkksEncoder
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey
from tpu_fhe.utils import serialize as ser

RNG = np.random.default_rng(5)


@pytest.fixture(scope="module")
def ckks():
    n = 256
    mods = CoeffModulus.create(n, [50, 40, 40, 50])
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(mods),
        special_modulus_size=1,
    )
    ctx = FheContext(params)
    return ctx, CkksEncoder(ctx), SecretKey(ctx, key=9)


def roundtrip(save, load, obj):
    buf = io.BytesIO()
    save(obj, buf)
    buf.seek(0)
    return load(buf)


def test_ciphertext_roundtrip_bit_exact(ckks):
    ctx, enc, sk = ckks
    z = RNG.standard_normal(ctx.n // 2)
    ct = sk.encrypt_symmetric(enc.encode(z, 2.0**40))
    back = roundtrip(ser.save_ciphertext, ser.load_ciphertext, ct)
    np.testing.assert_array_equal(
        np.asarray(ct.data.lo), np.asarray(back.data.lo)
    )
    np.testing.assert_array_equal(
        np.asarray(ct.data.hi), np.asarray(back.data.hi)
    )
    assert (back.chain_index, back.scale) == (ct.chain_index, ct.scale)
    np.testing.assert_allclose(
        enc.decode(sk.decrypt(back)).real, z, atol=1e-8
    )


def test_seed_compressed_symmetric(ckks):
    ctx, enc, sk = ckks
    z = RNG.standard_normal(ctx.n // 2)
    ct, seed = sk.encrypt_symmetric_seeded(enc.encode(z, 2.0**40))
    buf = io.BytesIO()
    ser.save_ciphertext_symmetric(ct, seed, buf)
    # compressed form stores only c0 (+ seed): about half the size
    full = io.BytesIO()
    ser.save_ciphertext(ct, full)
    assert buf.tell() < 0.6 * full.tell()
    buf.seek(0)
    back = ser.load_ciphertext_symmetric(ctx, buf)
    np.testing.assert_array_equal(
        np.asarray(ct.data.lo), np.asarray(back.data.lo)
    )
    np.testing.assert_allclose(
        enc.decode(sk.decrypt(back)).real, z, atol=1e-8
    )


def test_plaintext_and_keys_roundtrip(ckks):
    ctx, enc, sk = ckks
    pt = enc.encode(RNG.standard_normal(8), 2.0**40, slots=8)
    back = roundtrip(ser.save_plaintext, ser.load_plaintext, pt)
    np.testing.assert_array_equal(
        np.asarray(pt.data.lo), np.asarray(back.data.lo)
    )

    pk = sk.public_key()
    pk2 = roundtrip(ser.save_public_key, ser.load_public_key, pk)
    np.testing.assert_array_equal(np.asarray(pk.data.hi), np.asarray(pk2.data.hi))

    rlk = sk.relin_key()
    rlk2 = roundtrip(ser.save_relin_key, ser.load_relin_key, rlk)

    gk = sk.galois_key([1, 2], include_conj=True)
    gk2 = roundtrip(ser.save_galois_key, ser.load_galois_key, gk)
    assert set(gk2.keys) == set(gk.keys)

    # loaded keys are usable
    z = RNG.standard_normal(ctx.n // 2)
    ct = sk.encrypt_symmetric(enc.encode(z, 2.0**40))
    prod = ev.relinearize(ctx, ev.multiply(ctx, ct, ct), rlk2)
    prod = ev.rescale_to_next(ctx, prod)
    np.testing.assert_allclose(
        enc.decode(sk.decrypt(prod)).real, z * z, atol=1e-4
    )
    rot = ev.rotate(ctx, ct, 2, gk2)
    np.testing.assert_allclose(
        enc.decode(sk.decrypt(rot)).real, np.roll(z, -2), atol=1e-6
    )


def test_secret_key_roundtrip(ckks):
    ctx, enc, sk = ckks
    buf = io.BytesIO()
    ser.save_secret_key(sk, buf)
    buf.seek(0)
    sk2 = ser.load_secret_key(ctx, buf)
    z = RNG.standard_normal(ctx.n // 2)
    ct = sk.encrypt_symmetric(enc.encode(z, 2.0**40))
    np.testing.assert_allclose(
        enc.decode(sk2.decrypt(ct)).real, z, atol=1e-8
    )


def test_blake2_hashing():
    """utils/hashing: deterministic digests, 4x64 hash block, XOF length."""
    from tpu_fhe.utils import hashing

    block = hashing.hash_uint64([1, 2, 3])
    assert len(block) == hashing.HASH_BLOCK_UINT64_COUNT
    assert block == hashing.hash_uint64(np.array([1, 2, 3], dtype=np.uint64))
    assert block != hashing.hash_uint64([1, 2, 4])
    out = hashing.blake2xb(b"seed", 1000)
    assert len(out) == 1000
    assert out == hashing.blake2xb(b"seed", 1000)
    assert out[:64] != hashing.blake2xb(b"seed2", 64)


def test_compact_q32_key_roundtrip():
    """q32 switching keys store only the u32 lo plane; save/load must
    round-trip the compact format and the loaded key must keyswitch
    bit-identically."""
    import jax.numpy as jnp

    n = 128
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, [30, 28, 28, 29, 29])),
        special_modulus_size=2,
    )
    ctx = FheContext(params)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=5)
    rlk = sk.relin_key()
    assert not hasattr(rlk.data, "hi"), "q32 key should be compact u32"

    buf = io.BytesIO()
    ser.save_relin_key(rlk, buf)
    buf.seek(0)
    rlk2 = ser.load_relin_key(buf)
    np.testing.assert_array_equal(np.asarray(rlk.data), np.asarray(rlk2.data))

    x = np.random.default_rng(3).uniform(-1, 1, n // 2)
    ct = sk.encrypt_symmetric(enc.encode(x, 2.0**56))
    prod = ev.multiply(ctx, ct, ct)
    a = ev.relinearize(ctx, prod, rlk)
    b = ev.relinearize(ctx, prod, rlk2)
    np.testing.assert_array_equal(a.data.to_np(), b.data.to_np())

    gk = sk.galois_key([1])
    buf = io.BytesIO()
    ser.save_galois_key(gk, buf)
    buf.seek(0)
    gk2 = ser.load_galois_key(buf)
    r1 = ev.rotate(ctx, ct, 1, gk)
    r2 = ev.rotate(ctx, ct, 1, gk2)
    np.testing.assert_array_equal(r1.data.to_np(), r2.data.to_np())
