"""NAF rotation fallback: arbitrary steps with only the O(log N)
power-of-two key set (reference rotate_internal NAF path,
src/evaluate.cu:1885-1915; create_galois_keys, src/secretkey.cu:532+)."""

import numpy as np
import pytest

from tpu_fhe.core.numth import naf
from tpu_fhe.eval import evaluator as ev
from tests.test_ckks import make_ckks

RNG = np.random.default_rng(31)


def test_naf_matches_reference_decomposition():
    # reference include/host/numth.h:17-34 semantics
    assert naf(0) == []
    assert sorted(naf(7)) == [-1, 8]
    assert sorted(naf(5)) == [1, 4]
    for v in [3, 11, 23, -9, 100, -37]:
        assert sum(naf(v)) == v
        # non-adjacent: no two powers within a factor of 2
        mags = sorted(abs(x) for x in naf(v))
        assert all(b >= 4 * a for a, b in zip(mags, mags[1:])) or len(mags) < 2


@pytest.fixture(scope="module")
def stack():
    ctx, enc, sk = make_ckks(n=256, bits=(50, 40, 50))
    gk_pow2 = sk.galois_key_power_of_2()
    return ctx, enc, sk, gk_pow2


def test_rotate_arbitrary_step_with_pow2_keys(stack):
    ctx, enc, sk, gk = stack
    slots = ctx.n // 2
    x = RNG.standard_normal(slots)
    ct = sk.encrypt_symmetric(enc.encode(x, 2.0**40))
    for step in (5, 7, -3, 11):
        got = enc.decode(sk.decrypt(ev.rotate(ctx, ct, step, gk))).real
        np.testing.assert_allclose(got, np.roll(x, -step), atol=1e-3)


def test_naf_path_matches_single_key(stack):
    ctx, enc, sk, gk_pow2 = stack
    slots = ctx.n // 2
    x = RNG.standard_normal(slots)
    ct = sk.encrypt_symmetric(enc.encode(x, 2.0**40))
    step = 6  # = 8 - 2 in NAF
    gk_exact = sk.galois_key([step])
    via_single = enc.decode(sk.decrypt(ev.rotate(ctx, ct, step, gk_exact))).real
    via_naf = enc.decode(sk.decrypt(ev.rotate(ctx, ct, step, gk_pow2))).real
    np.testing.assert_allclose(via_naf, via_single, atol=1e-3)
    np.testing.assert_allclose(via_naf, np.roll(x, -step), atol=1e-3)


def test_missing_pow2_key_still_raises(stack):
    ctx, enc, sk, _ = stack
    x = RNG.standard_normal(ctx.n // 2)
    ct = sk.encrypt_symmetric(enc.encode(x, 2.0**40))
    gk_only_1 = sk.galois_key([1])
    with pytest.raises(ValueError, match="no Galois key"):
        ev.rotate(ctx, ct, 4, gk_only_1)
