"""CKKS bootstrapping end-to-end (dense packing, small ring)."""

import math

import numpy as np
import pytest

from tpu_fhe.boot import boot_math as bm
from tpu_fhe.boot.bootstrap import CkksBootstrapper, gen_sine_coefficients
from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.eval import auto, evaluator as ev
from tpu_fhe.scheme.ckks_encoder import CkksEncoder
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey


def compute_bit_precision(result, expected) -> float:
    """Average bits of precision (reference:
    bootstrapping_example.cu:17-41)."""
    err = np.abs(np.asarray(result) - np.asarray(expected))
    err = np.where(err == 0, 1e-30, err)
    return float(np.mean(-np.log2(err)))


def test_select_layers_and_params():
    assert bm.select_layers(7, 2) == (4, 1, 3)
    p = bm.get_collapsed_fft_params(128, 2, 0)
    assert p[bm.LEVEL_BUDGET] == 2
    assert p[bm.NUM_ROTATIONS] == (1 << (p[bm.LAYERS_COLL] + 1)) - 1


def test_sine_coefficients_match_reference_table():
    # heads of the reference's g_coefficientsUniform / g_coefficientsSparse
    got_u = gen_sine_coefficients(512, 6, 88)
    assert abs(got_u[0] - 0.15421426400235561) < 1e-12
    assert abs(got_u[1] - (-0.0037671538417132409)) < 1e-12
    got_s = gen_sine_coefficients(28, 3, 44)
    assert abs(got_s[0] - (-0.18646470117093214)) < 1e-12
    assert abs(got_s[44] - 2.5459052150406730e-10) < 1e-13


@pytest.mark.slow
def test_bootstrap_dense_small_ring():
    n = 64
    size_q = 16
    bits = [60] + [59] * (size_q - 1) + [60] * 3
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, bits)),
        special_modulus_size=3,
    )
    ctx = FheContext(params)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=33)
    sf, _ = auto.scaling_factors(ctx)

    boot = CkksBootstrapper(ctx, enc)
    # small-ring secret: the number of q0-overflows is far below the sparse
    # bound, so the cheaper sparse sine approximation suffices (K=28, r=3)
    boot.set_sine_params(28, 3, 44)
    boot.setup(level_budget=(2, 2))
    boot.keygen(sk)

    rng = np.random.default_rng(3)
    x = rng.uniform(-0.8, 0.8, n // 2)
    ct = sk.encrypt_symmetric(enc.encode(x, sf[0]))
    # drop to two towers (AdjustCiphertext consumes one more)
    while ctx.level(ct.chain_index).size > 2:
        ct = ev.mod_drop_to_next(ctx, ct)
    assert ctx.level(ct.chain_index).size == 2

    out = boot.eval_bootstrap(ct)
    levels_after = len(ctx.chain) - 1 - out.chain_index
    assert levels_after >= 1, "bootstrap must leave usable levels"
    got = enc.decode(sk.decrypt(out)).real
    prec = compute_bit_precision(got, x)
    print(f"bootstrap precision: {prec:.1f} bits, levels left: {levels_after}")
    assert prec > 10.0


@pytest.mark.slow
def test_bootstrap_sparse_small_ring():
    """Sparse packing (slots < N/2): PartialSum + single real branch +
    post-S2C fold (reference src/bootstrap.cu:1053-1109)."""
    n = 64
    slots = 8
    size_q = 16
    bits = [60] + [59] * (size_q - 1) + [60] * 3
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, bits)),
        special_modulus_size=3,
    )
    ctx = FheContext(params)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=44)
    sf, _ = auto.scaling_factors(ctx)

    boot = CkksBootstrapper(ctx, enc)
    boot.set_sine_params(28, 3, 44)
    boot.setup(level_budget=(2, 2), slots=slots)
    boot.keygen(sk, slots=slots)

    rng = np.random.default_rng(5)
    x = rng.uniform(-0.8, 0.8, slots)
    ct = sk.encrypt_symmetric(enc.encode(x, sf[0], slots=slots))
    while ctx.level(ct.chain_index).size > 2:
        ct = ev.mod_drop_to_next(ctx, ct)

    out = boot.eval_bootstrap(ct, slots=slots)
    levels_after = len(ctx.chain) - 1 - out.chain_index
    assert levels_after >= 1
    got = enc.decode(sk.decrypt(out), slots=slots).real
    prec = compute_bit_precision(got, x)
    print(f"sparse bootstrap precision: {prec:.1f} bits, levels left: {levels_after}")
    assert prec > 10.0
