"""Hoisted rotations and extended-basis ops."""

import numpy as np
import pytest

from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.eval import evaluator as ev, hoisting as hst
from tpu_fhe.ops.galois import galois_elt_from_step
from tpu_fhe.scheme.ckks_encoder import CkksEncoder
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey

RNG = np.random.default_rng(17)


@pytest.fixture(scope="module", params=[1, 2])
def stack(request):
    n = 128
    size_p = request.param
    bits = [45, 40, 40, 40] + [50] * size_p
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, bits)),
        special_modulus_size=size_p,
    )
    ctx = FheContext(params)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=21)
    return ctx, enc, sk


def test_keyswitch_ext_down_roundtrip(stack):
    ctx, enc, sk = stack
    x = RNG.standard_normal(ctx.n // 2)
    ct = sk.encrypt_symmetric(enc.encode(x, 2.0**40))
    ext = hst.keyswitch_ext(ctx, ct)
    assert ext.num_limbs == ctx.level(1).size + ctx.params.size_P
    back = hst.keyswitch_down(ctx, ext)
    np.testing.assert_allclose(
        enc.decode(sk.decrypt(back)).real, x, atol=1e-3
    )


def test_hoisted_rotation_matches_regular(stack):
    ctx, enc, sk = stack
    steps = [1, 3, 7]
    gk = sk.galois_key(steps)
    x = RNG.standard_normal(ctx.n // 2)
    ct = sk.encrypt_symmetric(enc.encode(x, 2.0**40))
    precomp = hst.fast_rotation_precompute(ctx, ct)
    for step in steps:
        elt = galois_elt_from_step(step, ctx.n)
        ext = hst.fast_rotation_ext(
            ctx, ct, precomp, elt, gk.key_for_elt(elt), add_first=True
        )
        down = hst.keyswitch_down(ctx, ext)
        regular = ev.rotate(ctx, ct, step, gk)
        hoisted = enc.decode(sk.decrypt(down)).real
        direct = enc.decode(sk.decrypt(regular)).real
        np.testing.assert_allclose(hoisted, np.roll(x, -step), atol=1e-3)
        np.testing.assert_allclose(hoisted, direct, atol=1e-4)


def test_bsgs_accumulation_at_ext_basis(stack):
    """inner = sum_j MultExt(rot_j(ct), A_j) then one KeySwitchDown."""
    ctx, enc, sk = stack
    steps = [1, 2]
    gk = sk.galois_key(steps)
    x = RNG.standard_normal(ctx.n // 2)
    scale = 2.0**40
    ct = sk.encrypt_symmetric(enc.encode(x, scale))
    w1 = RNG.standard_normal(ctx.n // 2)
    w2 = RNG.standard_normal(ctx.n // 2)
    pt1 = enc.encode_ext(w1, scale, chain_index=1)
    pt2 = enc.encode_ext(w2, scale, chain_index=1)
    precomp = hst.fast_rotation_precompute(ctx, ct)
    e1 = galois_elt_from_step(1, ctx.n)
    e2 = galois_elt_from_step(2, ctx.n)
    r1 = hst.fast_rotation_ext(ctx, ct, precomp, e1, gk.key_for_elt(e1), True)
    r2 = hst.fast_rotation_ext(ctx, ct, precomp, e2, gk.key_for_elt(e2), True)
    acc = hst.eval_add_ext(
        ctx, hst.eval_mult_ext(ctx, r1, pt1), hst.eval_mult_ext(ctx, r2, pt2)
    )
    out = hst.keyswitch_down(ctx, acc)
    got = enc.decode(sk.decrypt(out)).real
    expect = np.roll(x, -1) * w1 + np.roll(x, -2) * w2
    np.testing.assert_allclose(got, expect, atol=1e-2)


def test_hoisted_rotation_sum_matches_sequential(stack):
    """hoisted_rotation_sum == sum of individual rotations (reference
    hoisting_inplace semantics, src/evaluate.cu:1922-2130)."""
    import numpy as np

    from tpu_fhe.eval import evaluator as ev, hoisting as hst

    ctx, enc, sk = stack
    steps = [0, 1, 3]
    gk = sk.galois_key([s for s in steps if s])
    x = np.random.default_rng(5).standard_normal(ctx.n // 2)
    ct = sk.encrypt_symmetric(enc.encode(x, 2.0**40))

    got = hst.hoisted_rotation_sum(ctx, ct, steps, gk)
    dec = enc.decode(sk.decrypt(got)).real
    expect = sum(np.roll(x, -s) for s in steps)
    np.testing.assert_allclose(dec, expect, atol=1e-3)
