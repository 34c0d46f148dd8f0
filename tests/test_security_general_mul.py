"""Security-table enforcement (he_std_parms, reference
include/host/hestdparms.h:14-78) and the general size-m x size-n tensor
product (reference tensor_prod_mxn_rns_poly, src/evaluate.cu:415-479)."""

import numpy as np
import pytest

from tpu_fhe.core.modulus import CoeffModulus, he_std_parms
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.eval import evaluator as ev
from tests.test_ckks import make_ckks

RNG = np.random.default_rng(7)


def test_he_std_tables_match_reference():
    # pinned from /root/reference/include/host/hestdparms.h:14-78
    assert he_std_parms(4096, 128) == 109
    assert he_std_parms(8192, 192) == 151
    assert he_std_parms(16384, 192) == 304
    assert he_std_parms(32768, 128) == 881
    assert he_std_parms(65536, 128) == 1777
    assert he_std_parms(131072, 128) == 3576
    assert he_std_parms(65536, 256) == 955
    assert he_std_parms(512, 128) == 0  # no table entry


def test_insecure_params_raise():
    n = 4096
    mods = tuple(CoeffModulus.create(n, [60, 60, 60]))  # 180 > 109
    with pytest.raises(ValueError, match="HomomorphicEncryption.org"):
        EncryptionParameters(
            scheme=SchemeType.ckks, poly_modulus_degree=n,
            coeff_modulus=mods, special_modulus_size=1,
        )
    # escape hatches
    EncryptionParameters(
        scheme=SchemeType.ckks, poly_modulus_degree=n,
        coeff_modulus=mods, special_modulus_size=1, allow_insecure=True,
    )
    EncryptionParameters(
        scheme=SchemeType.ckks, poly_modulus_degree=n,
        coeff_modulus=mods, special_modulus_size=1, sec_level=0,
    )


def test_secure_params_pass():
    n = 4096
    mods = tuple(CoeffModulus.create(n, [36, 36, 37]))  # 109 == bound
    EncryptionParameters(
        scheme=SchemeType.ckks, poly_modulus_degree=n,
        coeff_modulus=mods, special_modulus_size=1,
    )


def test_general_tensor_product_3x2():
    """size-3 x size-2 -> size-4; decrypt (general Horner) must match the
    plaintext product of three factors."""
    ctx, enc, sk = make_ckks(n=128, bits=(50, 40, 40, 40, 50))
    scale = 2.0**40
    slots = ctx.n // 2
    a = RNG.uniform(-1, 1, slots)
    b = RNG.uniform(-1, 1, slots)
    c = RNG.uniform(-1, 1, slots)
    ca = sk.encrypt_symmetric(enc.encode(a, scale=scale))
    cb = sk.encrypt_symmetric(enc.encode(b, scale=scale))
    cc = sk.encrypt_symmetric(enc.encode(c, scale=scale))
    ab = ev.multiply(ctx, ca, cb)       # size 3, scale^2
    assert ab.size == 3
    abc = ev.multiply(ctx, ab, cc)      # size 4, scale^3
    assert abc.size == 4
    dec = enc.decode(sk.decrypt(abc)).real
    np.testing.assert_allclose(dec, a * b * c, atol=1e-3)


def test_general_product_matches_relin_path():
    """(a*b relin'd) * c must equal the size-4 product after decrypt."""
    ctx, enc, sk = make_ckks(n=128, bits=(50, 40, 40, 40, 50))
    rlk = sk.relin_key()
    scale = 2.0**40
    slots = ctx.n // 2
    a = RNG.uniform(-1, 1, slots)
    b = RNG.uniform(-1, 1, slots)
    c = RNG.uniform(-1, 1, slots)
    ca = sk.encrypt_symmetric(enc.encode(a, scale=scale))
    cb = sk.encrypt_symmetric(enc.encode(b, scale=scale))
    cc = sk.encrypt_symmetric(enc.encode(c, scale=scale))
    via_relin = ev.multiply(ctx, ev.relinearize(ctx, ev.multiply(ctx, ca, cb), rlk), cc)
    via_general = ev.multiply(ctx, ev.multiply(ctx, ca, cb), cc)
    d1 = enc.decode(sk.decrypt(via_relin)).real
    d2 = enc.decode(sk.decrypt(via_general)).real
    np.testing.assert_allclose(d1, d2, atol=1e-3)
