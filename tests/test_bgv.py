"""BGV end-to-end: encrypt/decrypt, multiply + relin, modswitch, rotations."""

import numpy as np
import pytest

import jax

from tpu_fhe.core.modulus import CoeffModulus, PlainModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.eval import bgv_eval as bg
from tpu_fhe.scheme.batch_encoder import BatchEncoder
from tpu_fhe.scheme.bgv import BgvTools
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey

RNG = np.random.default_rng(31)


def make_bgv(n=256, bits=(50, 50, 50, 60), t_bits=20, size_p=1):
    mods = CoeffModulus.create(n, list(bits))
    t = PlainModulus.batching(n, t_bits)
    params = EncryptionParameters(
        scheme=SchemeType.bgv,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(mods),
        special_modulus_size=size_p,
        plain_modulus=t,
    )
    ctx = FheContext(params)
    enc = BatchEncoder(ctx)
    sk = SecretKey(ctx, key=13)
    tools = BgvTools(ctx)
    return ctx, enc, sk, tools


@pytest.fixture(scope="module")
def bgv():
    return make_bgv()


def rand_slots(ctx, t):
    return RNG.integers(0, t.value, size=ctx.n, dtype=np.uint64)


def test_encrypt_decrypt(bgv):
    ctx, enc, sk, tools = bgv
    vals = rand_slots(ctx, tools.t)
    ct = tools.encrypt_symmetric(sk, enc.encode(vals))
    np.testing.assert_array_equal(enc.decode(tools.decrypt(sk, ct)), vals)


def test_encrypt_decrypt_asymmetric(bgv):
    ctx, enc, sk, tools = bgv
    pk = sk.public_key()
    vals = rand_slots(ctx, tools.t)
    ct = tools.encrypt_asymmetric(pk, enc.encode(vals), jax.random.key(4))
    np.testing.assert_array_equal(enc.decode(tools.decrypt(sk, ct)), vals)


def test_add_sub(bgv):
    ctx, enc, sk, tools = bgv
    t = tools.t.value
    a = rand_slots(ctx, tools.t)
    b = rand_slots(ctx, tools.t)
    ca = tools.encrypt_symmetric(sk, enc.encode(a))
    cb = tools.encrypt_symmetric(sk, enc.encode(b))
    np.testing.assert_array_equal(
        enc.decode(tools.decrypt(sk, bg.add(tools, ca, cb))), (a + b) % t
    )
    np.testing.assert_array_equal(
        enc.decode(tools.decrypt(sk, bg.sub(tools, ca, cb))),
        (a.astype(object) - b.astype(object)) % t,
    )


def test_multiply_relinearize(bgv):
    ctx, enc, sk, tools = bgv
    rlk = sk.relin_key()
    t = tools.t.value
    a = rand_slots(ctx, tools.t)
    b = rand_slots(ctx, tools.t)
    ca = tools.encrypt_symmetric(sk, enc.encode(a))
    cb = tools.encrypt_symmetric(sk, enc.encode(b))
    expected = (a.astype(object) * b.astype(object)) % t
    prod = bg.multiply(tools, ca, cb)
    np.testing.assert_array_equal(enc.decode(tools.decrypt(sk, prod)), expected)
    lin = bg.relinearize(ctx, prod, rlk)
    np.testing.assert_array_equal(enc.decode(tools.decrypt(sk, lin)), expected)


def test_mod_switch_and_correction_factor(bgv):
    ctx, enc, sk, tools = bgv
    t = tools.t.value
    a = rand_slots(ctx, tools.t)
    ct = tools.encrypt_symmetric(sk, enc.encode(a))
    ct2 = bg.mod_switch_to_next(tools, ct)
    assert ct2.num_limbs == ct.num_limbs - 1
    assert ct2.correction_factor != 1
    np.testing.assert_array_equal(enc.decode(tools.decrypt(sk, ct2)), a)
    # add of two cts at different correction factors balances
    ct3 = bg.mod_switch_to_next(tools, ct2)
    ct2b = tools.encrypt_symmetric(sk, enc.encode(a))
    ct2b = bg.mod_switch_to_next(tools, bg.mod_switch_to_next(tools, ct2b))
    assert ct3.correction_factor == ct2b.correction_factor
    np.testing.assert_array_equal(
        enc.decode(tools.decrypt(sk, bg.add(tools, ct3, ct2b))), (2 * a) % t
    )


def test_depth2_with_modswitch(bgv):
    ctx, enc, sk, tools = bgv
    rlk = sk.relin_key()
    t = tools.t.value
    a = rand_slots(ctx, tools.t)
    ca = tools.encrypt_symmetric(sk, enc.encode(a))
    sq = bg.relinearize(ctx, bg.multiply(tools, ca, ca), rlk)
    sq = bg.mod_switch_to_next(tools, sq)
    expected = (a.astype(object) ** 2) % t
    np.testing.assert_array_equal(enc.decode(tools.decrypt(sk, sq)), expected)
    q4 = bg.relinearize(ctx, bg.multiply(tools, sq, sq), rlk)
    np.testing.assert_array_equal(
        enc.decode(tools.decrypt(sk, q4)), (expected ** 2) % t
    )


def test_rotate(bgv):
    ctx, enc, sk, tools = bgv
    gk = sk.galois_key([1], include_conj=True)
    vals = np.arange(ctx.n, dtype=np.uint64) % tools.t.value
    ct = tools.encrypt_symmetric(sk, enc.encode(vals))
    half = ctx.n // 2
    rows = vals.reshape(2, half)
    out = enc.decode(tools.decrypt(sk, bg.rotate(ctx, ct, 1, gk)))
    np.testing.assert_array_equal(out.reshape(2, half), np.roll(rows, -1, axis=1))
    out = enc.decode(tools.decrypt(sk, bg.conjugate(ctx, ct, gk)))
    np.testing.assert_array_equal(out.reshape(2, half), rows[::-1])


def test_rotate_preserves_correction_factor(bgv):
    """Rotation = keyswitch + automorphism must carry the BGV correction
    factor through unchanged (the reference balances cf only on add,
    src/evaluate.cu:22-84; keyswitch's t-preserving moddown adds a delta
    that is 0 mod t, so cf is invariant).  Exercised on a ct whose cf is
    nontrivial after a modulus switch."""
    ctx, enc, sk, tools = bgv
    gk = sk.galois_key([2])
    vals = rand_slots(ctx, tools.t)
    ct = tools.encrypt_symmetric(sk, enc.encode(vals))
    ct2 = bg.mod_switch_to_next(tools, ct)
    assert ct2.correction_factor != ct.correction_factor  # nontrivial cf
    rot = bg.rotate(ctx, ct2, 2, gk)
    assert rot.correction_factor == ct2.correction_factor
    half = ctx.n // 2
    rows = vals.reshape(2, half)
    out = enc.decode(tools.decrypt(sk, rot))
    np.testing.assert_array_equal(
        out.reshape(2, half), np.roll(rows, -2, axis=1)
    )


def test_plain_ops(bgv):
    ctx, enc, sk, tools = bgv
    t = tools.t.value
    a = rand_slots(ctx, tools.t)
    m = rand_slots(ctx, tools.t)
    ca = tools.encrypt_symmetric(sk, enc.encode(a))
    pm = enc.encode(m)
    np.testing.assert_array_equal(
        enc.decode(tools.decrypt(sk, bg.add_plain(tools, ca, pm))), (a + m) % t
    )
    np.testing.assert_array_equal(
        enc.decode(tools.decrypt(sk, bg.sub_plain(tools, ca, pm))),
        (a.astype(object) - m.astype(object)) % t,
    )
    np.testing.assert_array_equal(
        enc.decode(tools.decrypt(sk, bg.multiply_plain(tools, ca, pm))),
        (a.astype(object) * m.astype(object)) % t,
    )
    # plain ops respect the correction factor after a modswitch
    cs = bg.mod_switch_to_next(tools, ca)
    np.testing.assert_array_equal(
        enc.decode(tools.decrypt(sk, bg.add_plain(tools, cs, pm))), (a + m) % t
    )
