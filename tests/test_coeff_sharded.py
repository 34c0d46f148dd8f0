"""Coefficient-sharded keyswitch + rotation (parallel.coeff_eval): outputs
bit-identical to the single-device evaluator on a virtual coeff mesh."""

import jax
import numpy as np
import pytest

from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.eval import evaluator as ev
from tpu_fhe.parallel import coeff_eval as ce
from tpu_fhe.scheme.ckks_encoder import CkksEncoder
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey

RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def stack():
    n = 256
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, [40] * 9)),
        special_modulus_size=1,
    )
    ctx = FheContext(params)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=5)
    return ctx, enc, sk


def test_coeff_sharded_rotate_bit_identical(stack):
    ctx, enc, sk = stack
    gk = sk.galois_key([3])
    x = RNG.standard_normal(ctx.n // 2)
    ct = sk.encrypt_symmetric(enc.encode(x, 2.0**35))

    ref = ev.rotate(ctx, ct, 3, gk)

    mesh = ce.coeff_mesh(1, 8)
    data_s = jax.device_put(
        ct.data, jax.sharding.NamedSharding(mesh, ce.CT_SPEC)
    )
    with mesh:
        got = jax.jit(
            lambda d: ce.rotate_4step(
                ctx, ct.with_data(d), 3, gk, mesh
            ).data
        )(data_s)
        jax.block_until_ready(got)
    np.testing.assert_array_equal(got.to_np(), ref.data.to_np())
    # and it decrypts to the rotated plaintext
    out = enc.decode(sk.decrypt(ct.with_data(got))).real
    np.testing.assert_allclose(out, np.roll(x, -3), atol=1e-3)


def test_coeff_sharded_relin_bit_identical(stack):
    ctx, enc, sk = stack
    rlk = sk.relin_key()
    x = RNG.standard_normal(ctx.n // 2)
    ct = sk.encrypt_symmetric(enc.encode(x, 2.0**35))
    prod = ev.multiply(ctx, ct, ct)

    ref = ev.relinearize(ctx, prod, rlk)

    mesh = ce.coeff_mesh(1, 8)
    level = ctx.level(prod.chain_index)

    def f(d):
        ks = ce.keyswitch_core_4step(ctx, level, d[2], rlk, mesh)
        from tpu_fhe.ops import w64 as mm

        c0 = mm.add_mod(d[0], ks[0], level.mod.q)
        c1 = mm.add_mod(d[1], ks[1], level.mod.q)
        from tpu_fhe.ops import w64

        return w64.stack([c0, c1])

    data_s = jax.device_put(
        prod.data, jax.sharding.NamedSharding(mesh, ce.CT_SPEC)
    )
    with mesh:
        got = jax.jit(f)(data_s)
        jax.block_until_ready(got)
    np.testing.assert_array_equal(got.to_np(), ref.data.to_np())
