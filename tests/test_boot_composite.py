"""Composite-scaling (q32) CKKS bootstrap.

The TPU-native q32 regime (every prime < 2^30, single-word kernels) runs
the FULL bootstrap with one logical level = a pair of ~28-bit primes:
the FLEXIBLEAUTO ladder, ModReduce, AdjustLevelsAndDepth and RaiseMod all
operate on logical levels (eval/auto.py), and RaiseMod CRT-composes the
anchor PAIR exactly before the signed lift (a single <2^30 prime cannot
hold a ~2^56-scaled message).  No counterpart in the reference — CUDA has
native 64-bit multiply; this matches OpenFHE's 32-bit COMPOSITESCALING
regime semantics instead.
"""

import numpy as np
import pytest

from tpu_fhe.boot.bootstrap import CkksBootstrapper
from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.eval import auto, evaluator as ev
from tpu_fhe.ops import w64
from tpu_fhe.ops.ntt import forward_ntt, inverse_ntt
from tpu_fhe.scheme.ciphertext import Ciphertext
from tpu_fhe.scheme.ckks_encoder import CkksEncoder
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey

RNG = np.random.default_rng(23)


def compute_bit_precision(result, expected) -> float:
    err = np.abs(np.asarray(result) - np.asarray(expected))
    err = np.where(err == 0, 1e-30, err)
    return float(np.mean(-np.log2(err)))


def _ctx(n=64, pairs=3, anchor=30, scale_bits=56, sp=2):
    mods = CoeffModulus.create_composite(
        n, scale_bits, pairs, degree=2, anchor_bits=anchor,
        special_bits=anchor, special_count=sp,
    )
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(mods),
        special_modulus_size=sp,
        composite_degree=2,
    )
    return FheContext(params)


def test_composite_scaling_factors_and_mod_reduce():
    ctx = _ctx()
    q = ctx.q_values
    sf, big = auto.scaling_factors(ctx)
    K = len(q)
    assert sf[0] == pytest.approx(float(q[K - 2]) * float(q[K - 1]))
    pair_next = float(q[K - 4]) * float(q[K - 3])
    assert sf[1] == pytest.approx(sf[0] * sf[0] / sf[0])  # first step: /Qg_{G-1}
    assert big[1] == pytest.approx(sf[1] * sf[1])
    # one logical mod_reduce drops a pair of limbs and one noise degree
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=5)
    x = RNG.uniform(-1, 1, ctx.n // 2)
    ct = sk.encrypt_symmetric(enc.encode(x, sf[0]))
    ct = auto.mult_const_core(ctx, ct, 1.0)
    assert ct.noise_scale_deg == 2
    red = auto.mod_reduce(ctx, ct, 1)
    assert red.noise_scale_deg == 1
    assert red.chain_index == ct.chain_index + 2
    assert ctx.level(red.chain_index).size == ctx.level(ct.chain_index).size - 2
    got = enc.decode(sk.decrypt(red)).real
    assert np.max(np.abs(got - x)) < 1e-9
    del pair_next


def test_composite_raise_mod_golden():
    """RaiseMod from the anchor pair matches the bigint centered lift."""
    ctx = _ctx()
    d = 2
    anchor_ci = ctx.params.size_Q - d + 1
    level = ctx.level(anchor_ci)
    q0, q1 = [int(v) for v in ctx.q_values[:2]]
    qa = q0 * q1
    n = ctx.n
    vals = np.array(
        [int(v) for v in RNG.integers(0, qa, size=n, dtype=np.uint64)],
        dtype=object,
    )
    res = np.stack(
        [(vals % q0).astype(np.uint64), (vals % q1).astype(np.uint64)]
    )  # (2, N)
    data = forward_ntt(w64.W64.from_np(res[None].astype(np.uint64)), level.ntt)
    ct = Ciphertext(data, chain_index=anchor_ci, scale=2.0**56)
    raised = auto.raise_mod(ctx, ct)
    assert raised.chain_index == 1
    first = ctx.first_data_level
    got = inverse_ntt(raised.data, first.ntt).to_np()[0]  # (K, N)
    centered = np.where(vals > qa // 2, vals - qa, vals)
    for j, qj in enumerate(int(v) for v in ctx.q_values):
        exp = np.array([int(c) % qj for c in centered], dtype=np.uint64)
        np.testing.assert_array_equal(got[j], exp)


@pytest.mark.slow
def test_bootstrap_dense_composite_small_ring():
    """Full dense bootstrap in the composite q32 regime (logical depth
    mirrors test_bootstrap_dense_small_ring; every limb < 2^30)."""
    n = 64
    depth = 15  # logical levels (anchor excluded)
    ctx = _ctx(n=n, pairs=depth, anchor=30, scale_bits=56, sp=4)
    # (the q32 Pallas plan engages at N >= 1024; this small ring runs the
    # XLA path — the kernels themselves are covered by tests/test_ntt_q32.py)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=33)
    sf, _ = auto.scaling_factors(ctx)

    boot = CkksBootstrapper(ctx, enc)
    boot.set_sine_params(28, 3, 44)
    boot.setup(level_budget=(2, 2))
    boot.keygen(sk)

    rng = np.random.default_rng(3)
    x = rng.uniform(-0.8, 0.8, n // 2)
    ct = sk.encrypt_symmetric(enc.encode(x, sf[0]))
    # drop to two logical levels (AdjustCiphertext consumes one more)
    while ctx.level(ct.chain_index).size > 4:
        ct = ev.mod_drop_to_next(ctx, ct)
    assert ctx.level(ct.chain_index).size == 4

    out = boot.eval_bootstrap(ct)
    levels_after = (len(ctx.chain) - 1 - out.chain_index) // 2
    assert levels_after >= 1, "bootstrap must leave usable levels"
    got = enc.decode(sk.decrypt(out)).real
    prec = compute_bit_precision(got, x)
    print(f"composite bootstrap precision: {prec:.1f} bits, "
          f"levels left: {levels_after}")
    # 20.7 bits measured — parity with the 60-bit-prime regime's 20.6
    # (requires the exact q0 correction + pair-product prime search;
    # see boot/bootstrap.py setup and CoeffModulus.create_composite)
    assert prec > 18.0

    # regression (found by the encrypted-ResNet stem, r04): a NON-bottom
    # input — mid-pipeline ciphertexts keep spare levels; the prelude
    # must physically drop to the anchor pair before composite RaiseMod
    # (the 60-bit raise reads limb 0 at any level and never noticed)
    ct_hi = sk.encrypt_symmetric(enc.encode(x, sf[0]))
    while ctx.level(ct_hi.chain_index).size > 12:
        ct_hi = ev.mod_drop_to_next(ctx, ct_hi)
    out_hi = boot.eval_bootstrap(ct_hi)
    prec_hi = compute_bit_precision(
        enc.decode(sk.decrypt(out_hi)).real, x)
    print(f"composite bootstrap (non-bottom input) precision: "
          f"{prec_hi:.1f} bits")
    assert prec_hi > 18.0
