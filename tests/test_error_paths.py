"""User-facing error paths must raise clear ValueErrors, not
KeyError/IndexError/shape errors (mirrors the reference's
std::invalid_argument contracts, include/context.cuh:176 etc.)."""

import numpy as np
import pytest

from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.eval import evaluator as ev
from tpu_fhe.scheme.ckks_encoder import CkksEncoder
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey

RNG = np.random.default_rng(5)


@pytest.fixture(scope="module")
def ckks():
    n = 512
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, [40, 40, 40])),
        special_modulus_size=1,
    )
    ctx = FheContext(params)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=9)
    return ctx, enc, sk


def test_scale_mismatch_add(ckks):
    ctx, enc, sk = ckks
    a = sk.encrypt_symmetric(enc.encode(RNG.standard_normal(ctx.n // 2), 2.0**30))
    b = sk.encrypt_symmetric(enc.encode(RNG.standard_normal(ctx.n // 2), 2.0**35))
    with pytest.raises(ValueError, match="scale"):
        ev.add(ctx, a, b)


def test_rotate_without_key(ckks):
    ctx, enc, sk = ckks
    a = sk.encrypt_symmetric(enc.encode(RNG.standard_normal(ctx.n // 2), 2.0**30))
    gk = sk.galois_key([1])
    with pytest.raises(ValueError, match="[Gg]alois"):
        ev.rotate(ctx, a, 3, gk)


def test_encode_too_many_values(ckks):
    ctx, enc, _ = ckks
    with pytest.raises(ValueError, match="too many|ring"):
        enc.encode(RNG.standard_normal(ctx.n), 2.0**30)


def test_encode_non_pow2_slots(ckks):
    ctx, enc, _ = ckks
    with pytest.raises(ValueError, match="power of two"):
        enc.encode(RNG.standard_normal(3), 2.0**30)


def test_rescale_past_last_level(ckks):
    ctx, enc, sk = ckks
    a = sk.encrypt_symmetric(enc.encode(RNG.standard_normal(ctx.n // 2), 2.0**30))
    a = ev.mod_drop_to_next(ctx, a)  # now at the last data level
    with pytest.raises(ValueError, match="rescale|level|modulus"):
        ev.rescale_to_next(ctx, a)
    with pytest.raises(ValueError, match="drop|level"):
        ev.mod_drop_to_next(ctx, a)


def test_multiply_size3_general_product(ckks):
    """multiply now supports the general m x n tensor product (reference
    tensor_prod_mxn_rns_poly); size-3 x size-2 yields size 4.  Relinearize
    remains size-3-only, exactly like the reference."""
    ctx, enc, sk = ckks
    a = sk.encrypt_symmetric(enc.encode(RNG.standard_normal(ctx.n // 2), 2.0**30))
    prod = ev.multiply(ctx, a, a)
    assert ev.multiply(ctx, prod, a).size == 4
    rlk = sk.relin_key()
    with pytest.raises(ValueError, match="size-3|size 3"):
        ev.relinearize(ctx, ev.multiply(ctx, prod, a), rlk)


def test_add_at_different_levels(ckks):
    ctx, enc, sk = ckks
    a = sk.encrypt_symmetric(enc.encode(RNG.standard_normal(ctx.n // 2), 2.0**30))
    b = ev.mod_drop_to_next(ctx, a)
    with pytest.raises(ValueError, match="level|chain"):
        ev.add(ctx, a, b)
