"""Composite scaling in the q32 regime: pairs of ~28-bit primes carry a
~2^56 working scale, so precision matches the 60-bit-prime regime while
every kernel runs single-word (q < 2^30) arithmetic.

This is the parameter-level counterpart of the reference's 59-bit-scale
CKKS configs (Resnet/resnet.cu:16-54) re-expressed for a 32-bit vector
machine: identical total logQ, identical multiplicative depth, one
logical level = two RNS limbs.
"""

import numpy as np
import pytest

from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.eval import evaluator as ev
from tpu_fhe.ops.ntt_pallas import NTTPlan32
from tpu_fhe.scheme.ckks_encoder import CkksEncoder
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey

RNG = np.random.default_rng(17)


@pytest.fixture
def force_pallas(monkeypatch):
    monkeypatch.setenv("TPU_FHE_PALLAS", "always")


def _ctx(n=2048, pairs=2):
    # composite regime: the ANCHOR is also a pair (30+30 >= the 2^56
    # working scale — a single <2^30 prime cannot hold a scaled message,
    # the counterpart of the 60-bit q0 in the reference configs), then
    # `pairs` levels of 28+28, and a paired special basis
    bits = [30, 30] + [28, 28] * pairs + [29, 29]
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, bits)),
        special_modulus_size=2,
    )
    return FheContext(params)


def test_composite_scale_precision(force_pallas):
    """Depth-1 multiply at scale 2^56 over 28-bit prime pairs: error is
    1e-10-class (60-bit-regime precision), not the 1e-4 of a single
    28-bit scale."""
    ctx = _ctx()
    assert isinstance(ctx.key_level.ntt.plan, NTTPlan32)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=9)
    rlk = sk.relin_key()

    n_slots = ctx.n // 2
    x = RNG.uniform(-1, 1, n_slots)
    y = RNG.uniform(-1, 1, n_slots)
    scale = 2.0**56
    ct_x = sk.encrypt_symmetric(enc.encode(x, scale))
    ct_y = sk.encrypt_symmetric(enc.encode(y, scale))

    prod = ev.rescale_composite(
        ctx, ev.relinearize(ctx, ev.multiply(ctx, ct_x, ct_y), rlk)
    )
    # scale after dividing by the 28+28 pair stays within 2x of 2^56
    assert 0.5 < prod.scale / scale < 2.0
    got = enc.decode(sk.decrypt(prod)).real
    err = np.max(np.abs(got - x * y))
    assert err < 1e-9, f"composite-scaling precision regressed: {err:.2e}"


def test_composite_depth2(force_pallas):
    ctx = _ctx(pairs=2)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=11)
    rlk = sk.relin_key()
    n_slots = ctx.n // 2
    x = RNG.uniform(-1, 1, n_slots)
    scale = 2.0**56
    ct = sk.encrypt_symmetric(enc.encode(x, scale))
    sq = ev.rescale_composite(
        ctx, ev.relinearize(ctx, ev.multiply(ctx, ct, ct), rlk)
    )
    ct4 = ev.rescale_composite(
        ctx, ev.relinearize(ctx, ev.multiply(ctx, sq, sq), rlk)
    )
    got = enc.decode(sk.decrypt(ct4)).real
    err = np.max(np.abs(got - x**4))
    assert err < 1e-8, f"depth-2 composite error: {err:.2e}"
