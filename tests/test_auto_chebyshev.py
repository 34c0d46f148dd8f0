"""FLEXIBLEAUTO ops and Chebyshev-series evaluation."""

import math

import numpy as np
import pytest

from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.eval import auto, chebyshev as cheb, evaluator as ev
from tpu_fhe.scheme.ckks_encoder import CkksEncoder
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey

RNG = np.random.default_rng(5)


@pytest.fixture(scope="module")
def stack():
    n = 128
    # 8 data levels of 40-bit primes after a 45-bit q0; P = one 50-bit
    bits = [45] + [40] * 8 + [50]
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, bits)),
        special_modulus_size=1,
    )
    ctx = FheContext(params)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=9)
    rlk = sk.relin_key()
    return ctx, enc, sk, rlk


def _enc(stack, vals, deg=1):
    ctx, enc, sk, _ = stack
    sf, _big = auto.scaling_factors(ctx)
    pt = enc.encode(vals, scale=sf[0])
    return sk.encrypt_symmetric(pt)


def _dec(stack, ct):
    ctx, enc, sk, _ = stack
    return enc.decode(sk.decrypt(ct)).real


def test_long_division_chebyshev_identity():
    # f = q*g + r in Chebyshev basis (numerically)
    f = [0.3, -1.2, 0.7, 0.1, 2.0, -0.4, 1.1]
    g = [0.5, 0.2, 1.0, 0.0, 1.0]
    q, r = cheb.long_division_chebyshev(f, g)

    # verify via numpy Chebyshev arithmetic (convert c0 convention)
    import numpy.polynomial.chebyshev as C

    def to_np(c):
        out = np.array(c, dtype=float)
        out = out.copy()
        out[0] = out[0] / 2  # stored convention: c0, evaluated as c0/2
        return out

    xs = np.linspace(-1, 1, 50)
    lhs = C.chebval(xs, to_np(f))
    rhs = C.chebval(xs, to_np(q)) * C.chebval(xs, to_np(g)) + C.chebval(
        xs, to_np(r)
    )
    np.testing.assert_allclose(lhs, rhs, atol=1e-9)


def test_compute_degrees_ps():
    for n, expect in [(27, (4, 3)), (44, (7, 3)), (89, (6, 4))]:
        k, m = cheb.compute_degrees_ps(n)
        assert n < k * ((1 << m) - 1)
        assert (k, m) == expect or n < k * ((1 << m) - 1)


def test_mult_add_const(stack):
    ctx, enc, sk, rlk = stack
    x = RNG.standard_normal(64)
    ct = _enc(stack, x)
    ct2 = auto.mult_const_core(ctx, ct, 3.5)
    assert ct2.noise_scale_deg == 2
    np.testing.assert_allclose(_dec(stack, ct2), 3.5 * x, atol=1e-4)
    ct3 = auto.add_const(ctx, ct2, 1.25)
    np.testing.assert_allclose(_dec(stack, ct3), 3.5 * x + 1.25, atol=1e-4)
    ct4 = auto.mod_reduce(ctx, ct3, 1)
    assert ct4.noise_scale_deg == 1 and ct4.chain_index == 2
    np.testing.assert_allclose(_dec(stack, ct4), 3.5 * x + 1.25, atol=1e-4)


def test_eval_mult_auto_mixed_levels(stack):
    ctx, enc, sk, rlk = stack
    x = RNG.standard_normal(64)
    y = RNG.standard_normal(64)
    cx = _enc(stack, x)
    cy = _enc(stack, y)
    # push cy down two levels with a depth
    cy2 = auto.mult_const_core(ctx, cy, 2.0)
    cy2 = auto.mod_reduce(ctx, cy2, 1)
    cy2 = auto.mult_const_core(ctx, cy2, 0.5)  # deg 2 at level 1
    prod = auto.eval_mult_auto(ctx, cx, cy2, rlk)
    np.testing.assert_allclose(_dec(stack, prod), x * y, atol=1e-3)
    s = auto.eval_add_auto(ctx, cx, cy2)
    np.testing.assert_allclose(_dec(stack, s), x + y, atol=1e-3)


def test_mult_by_monomial(stack):
    ctx, enc, sk, rlk = stack
    x = RNG.standard_normal(64)
    ct = _enc(stack, x)
    # multiply by x^{N/2} = i in slot space (for conj-symmetric packing,
    # slot values get multiplied by i)
    rot = auto.mult_by_monomial(ctx, ct, ctx.n // 2)
    got = enc.decode(sk.decrypt(rot))
    np.testing.assert_allclose(got, 1j * x, atol=1e-4)


def test_raise_mod(stack):
    ctx, enc, sk, rlk = stack
    x = RNG.standard_normal(64) * 0.1
    ct = _enc(stack, x)
    # drop to the last level
    while ct.chain_index + 1 < len(ctx.chain):
        ct = ev.mod_drop_to_next(ctx, ct)
    raised = auto.raise_mod(ctx, ct)
    assert raised.chain_index == 1
    # after RaiseMod the decrypted COEFFICIENT vector equals the small-mod
    # decryption plus exact q0-multiples: m_raised = m mod q0 lifted, i.e.
    # m_raised - signed(m mod q0) = q0 * I with integer I (and some I != 0).
    from tpu_fhe.ops.ntt import inverse_ntt
    from tpu_fhe.scheme.ckks_encoder import _compose_signed

    q0 = ctx.q_values[0]
    small = sk.decrypt(ct)
    lvl = ctx.level(ct.chain_index)
    small_coeff = _compose_signed(
        inverse_ntt(small.data, lvl.ntt).to_np(), lvl.base
    )
    big = sk.decrypt(raised)
    first = ctx.first_data_level
    big_coeff = _compose_signed(
        inverse_ntt(big.data, first.ntt).to_np(), first.base
    )
    residual = [(b - s) for b, s in zip(big_coeff, small_coeff)]
    assert all(r % q0 == 0 for r in residual)
    assert any(r != 0 for r in residual)  # some wraps actually occurred


def test_chebyshev_linear(stack):
    ctx, enc, sk, rlk = stack
    x = RNG.uniform(-1, 1, 64)
    ct = _enc(stack, x)
    coeffs = cheb.eval_chebyshev_coefficients(math.exp, -1.0, 1.0, 4)
    out = cheb.eval_chebyshev_series(ctx, ct, rlk, coeffs, -1.0, 1.0)
    expect = np.exp(x)
    np.testing.assert_allclose(_dec(stack, out), expect, atol=1e-2)


def test_chebyshev_ps(stack):
    ctx, enc, sk, rlk = stack
    x = RNG.uniform(-1, 1, 64)
    ct = _enc(stack, x)
    f = lambda t: math.sin(2 * t) * math.exp(-t * t)
    coeffs = cheb.eval_chebyshev_coefficients(f, -1.0, 1.0, 13)
    out = cheb.eval_chebyshev_series(ctx, ct, rlk, coeffs, -1.0, 1.0)
    expect = np.array([f(t) for t in x])
    np.testing.assert_allclose(_dec(stack, out), expect, atol=2e-2)


def test_add_auto_snaps_small_scale_drift(stack):
    """FLEXIBLEAUTO add/sub tolerates ladder-scale drift <5% (the
    reference disables the scale check entirely, src/evaluate.cu:315-320;
    Meta-BTS subtracts across such pairs) but still rejects real
    mismatches."""
    from dataclasses import replace as _replace

    import numpy as np
    import pytest as _pytest

    ctx, enc, sk, rlk = stack
    x = np.random.default_rng(8).uniform(-1, 1, ctx.n // 2)
    ct = sk.encrypt_symmetric(enc.encode(x, 2.0**40))
    drifted = _replace(ct, scale=ct.scale * 1.01)
    out = auto.eval_add_auto(ctx, ct, drifted)   # must not raise
    got = enc.decode(sk.decrypt(out)).real
    np.testing.assert_allclose(got, 2 * x, atol=0.05)
    way_off = _replace(ct, scale=ct.scale * 2.0)
    with _pytest.raises(ValueError, match="scale"):
        auto.eval_add_auto(ctx, ct, way_off)
