"""Sharded (multi-chip) evaluator vs single-device: bit-identical outputs.

The limb-mesh keyswitch (GSPMD-partitioned modup/inner-product/moddown) and
the batch axis must not change any residue; decrypt must match exactly.
"""

import jax
import numpy as np
import pytest

from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.eval import evaluator as ev
from tpu_fhe.ops import w64
from tpu_fhe.parallel.sharding import (
    ct_sharding,
    make_mesh,
    shard_relin_key,
)
from tpu_fhe.scheme.ckks_encoder import CkksEncoder
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey

RNG = np.random.default_rng(7)


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
    sk = SecretKey(ctx, key=3)
    rlk = sk.relin_key()
    return ctx, enc, sk, rlk


def _mul_relin_rescale(ctx, proto, rlk):
    def one(data):
        ct = proto.with_data(data)
        prod = ev.multiply(ctx, ct, ct)
        prod = ev.relinearize(ctx, prod, rlk)
        return ev.rescale_to_next(ctx, prod).data

    return one


def test_limb_sharded_keyswitch_bit_identical(stack):
    ctx, enc, sk, rlk = stack
    x = RNG.standard_normal(ctx.n // 2)
    ct = sk.encrypt_symmetric(enc.encode(x, 2.0**35))

    # single device reference
    ref = jax.jit(_mul_relin_rescale(ctx, ct, rlk))(ct.data)

    # 1 x 8 limb mesh (8 data limbs at chain index 1 shard evenly)
    mesh = make_mesh(1, 8)
    rlk_s = shard_relin_key(rlk, mesh)
    data_s = jax.device_put(ct.data, ct_sharding(mesh))
    with mesh:
        got = jax.jit(
            _mul_relin_rescale(ctx, ct, rlk_s),
            in_shardings=ct_sharding(mesh),
        )(data_s)
        jax.block_until_ready(got)

    np.testing.assert_array_equal(got.to_np(), ref.to_np())


def test_batch_limb_mesh_matches_and_decrypts(stack):
    ctx, enc, sk, rlk = stack
    mesh = make_mesh(2, 4)
    rlk_s = shard_relin_key(rlk, mesh)
    xs = [RNG.standard_normal(ctx.n // 2) for _ in range(4)]
    cts = [sk.encrypt_symmetric(enc.encode(x, 2.0**35)) for x in xs]
    proto = cts[0]
    stacked = w64.stack([c.data for c in cts])
    stacked = jax.device_put(stacked, ct_sharding(mesh, batched=True))
    with mesh:
        out = jax.jit(
            jax.vmap(_mul_relin_rescale(ctx, proto, rlk_s), in_axes=0),
            in_shardings=ct_sharding(mesh, batched=True),
        )(stacked)
        jax.block_until_ready(out)

    from dataclasses import replace

    for i, x in enumerate(xs):
        ct_out = replace(
            proto,
            data=out[i],
            chain_index=proto.chain_index + 1,
            scale=proto.scale * proto.scale / ctx.q_values[
                ctx.level(proto.chain_index).size - 1
            ],
        )
        got = enc.decode(sk.decrypt(ct_out)).real
        np.testing.assert_allclose(got, x * x, atol=1e-3)
