"""Fast smoke tier (< ~3 min on the CPU mesh): import every module and run
one tiny end-to-end per scheme.  This is the default `ci.sh test` stage so
a broken commit can never ship silently again; the full suite runs as
`ci.sh test-full`."""

import importlib
import pkgutil

import numpy as np

import tpu_fhe

RNG = np.random.default_rng(99)


def test_import_everything():
    """Every module in the package imports cleanly (catches NameError-class
    breakage anywhere, e.g. a missing module-level import)."""
    failures = []
    for mod in pkgutil.walk_packages(tpu_fhe.__path__, prefix="tpu_fhe."):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # noqa: BLE001
            failures.append((mod.name, repr(e)))
    assert not failures, failures


def test_smoke_ckks():
    from tests.test_ckks import make_ckks
    from tpu_fhe.eval import evaluator as ev

    ctx, enc, sk = make_ckks(n=128, bits=(50, 40, 50))
    rlk = sk.relin_key()
    a = RNG.uniform(-1, 1, ctx.n // 2)
    b = RNG.uniform(-1, 1, ctx.n // 2)
    ca = sk.encrypt_symmetric(enc.encode(a, scale=2.0**40))
    cb = sk.encrypt_symmetric(enc.encode(b, scale=2.0**40))
    prod = ev.rescale_to_next(ctx, ev.relinearize(ctx, ev.multiply(ctx, ca, cb), rlk))
    dec = enc.decode(sk.decrypt(prod)).real
    np.testing.assert_allclose(dec, a * b, atol=1e-3)


def test_smoke_bfv():
    from tests.test_bfv import make_bfv
    from tpu_fhe.eval import bfv_eval as bv

    ctx, enc, sk, tools = make_bfv(n=128, bits=(50, 50, 60))
    vals = RNG.integers(0, tools.t.value, size=ctx.n, dtype=np.uint64)
    ct = tools.encrypt_symmetric(sk, enc.encode(vals))
    ct2 = bv.add(ctx, ct, ct)
    out = enc.decode(tools.decrypt(sk, ct2))
    np.testing.assert_array_equal(out, (vals * 2) % tools.t.value)


def test_smoke_bgv():
    from tests.test_bgv import make_bgv
    from tpu_fhe.eval import bgv_eval as bg

    ctx, enc, sk, tools = make_bgv(n=128, bits=(50, 50, 60))
    vals = RNG.integers(0, tools.t.value, size=ctx.n, dtype=np.uint64)
    ct = tools.encrypt_symmetric(sk, enc.encode(vals))
    ct2 = bg.add(tools, ct, ct)
    out = enc.decode(tools.decrypt(sk, ct2))
    np.testing.assert_array_equal(out, (vals * 2) % tools.t.value)


def test_smoke_composite_rescale():
    """Covers the q32 composite rescale path that broke at round-2 HEAD
    (rescale_composite's Garner compose) at a tiny ring."""
    from tpu_fhe.core.modulus import CoeffModulus
    from tpu_fhe.core.params import EncryptionParameters, SchemeType
    from tpu_fhe.eval import evaluator as ev
    from tpu_fhe.scheme.ckks_encoder import CkksEncoder
    from tpu_fhe.scheme.context import FheContext
    from tpu_fhe.scheme.keys import SecretKey

    n = 128
    bits = [30, 30] + [28, 28] + [29, 29]
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, bits)),
        special_modulus_size=2,
    )
    ctx = FheContext(params)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=9)
    rlk = sk.relin_key()
    x = RNG.uniform(-1, 1, n // 2)
    y = RNG.uniform(-1, 1, n // 2)
    scale = 2.0**56
    cx = sk.encrypt_symmetric(enc.encode(x, scale))
    cy = sk.encrypt_symmetric(enc.encode(y, scale))
    prod = ev.rescale_composite(
        ctx, ev.relinearize(ctx, ev.multiply(ctx, cx, cy), rlk)
    )
    got = enc.decode(sk.decrypt(prod)).real
    assert np.max(np.abs(got - x * y)) < 1e-6
