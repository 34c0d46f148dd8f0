"""Channel-batched DNN/bootstrap stages (vmapped programs) must be
bit-identical to the per-channel path.

The batched path stacks channels with scheme.ciphertext.stack_cts and runs
each bootstrap / sign stage as ONE vmapped program (the TPU-native
replacement for the reference's serial per-ct kernel launches,
src/dnn.cu:207-243).  All ciphertext arithmetic is integer-modular, so the
two paths must agree exactly, not approximately.

CPU eager bootstraps cost ~1 min each, so CI covers the vmapped stage
programs (C2S + sine — the structures every other stage shares) and the
cheap plumbing; the full relu-composite equality runs under
TPU_FHE_SLOW_TESTS=1 (and implicitly in the doll-scale ResNet demo).
"""

import os

import numpy as np
import pytest

from tpu_fhe.boot.bootstrap import CkksBootstrapper, gen_sine_coefficients
from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.eval import auto
from tpu_fhe.models.dnn import DNN
from tpu_fhe.scheme.ciphertext import stack_cts, unstack_cts
from tpu_fhe.scheme.ckks_encoder import CkksEncoder
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey

RNG = np.random.default_rng(123)


@pytest.fixture(scope="module")
def setup():
    n = 64
    w = 4  # 16 slots, sparse
    size_q = 21
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
    sk = SecretKey(ctx, key=66)
    dnn = DNN(ctx, enc)
    dnn.relin_keygen(sk)
    dnn.build_galois_key(sk, DNN.conv_rotation_indices(w, 3, 0))

    slots = w * w
    boot = CkksBootstrapper(ctx, enc)
    boot.set_sine_params(28, 3, 44)
    boot.setup(level_budget=(2, 2), slots=slots)
    boot.keygen(sk, slots=slots)
    dnn.mul_key = boot.mul_key
    return ctx, enc, sk, dnn, boot, w


def _bytes(cts):
    return [ct.data.to_np() for ct in cts]


def test_stack_unstack_roundtrip(setup):
    ctx, enc, sk, dnn, boot, w = setup
    img = RNG.uniform(-0.9, 0.9, (w, w, 4))
    t = dnn.enc_tensor(img, sk=sk)
    stacked = stack_cts(t.cts)
    assert stacked.data.ndim == 4
    back = unstack_cts(stacked, 4)
    for a, b in zip(t.cts, back):
        np.testing.assert_array_equal(a.data.to_np(), b.data.to_np())
        assert a.chain_index == b.chain_index and a.scale == b.scale


def test_stack_rejects_mismatched_metadata(setup):
    ctx, enc, sk, dnn, boot, w = setup
    img = RNG.uniform(-0.9, 0.9, (w, w, 2))
    t = dnn.enc_tensor(img, sk=sk)
    from dataclasses import replace

    bad = replace(t.cts[1], scale=t.cts[1].scale * 2)
    with pytest.raises(ValueError, match="metadata"):
        stack_cts([t.cts[0], bad])


def test_c2s_batched_bit_identical(setup):
    """coeffs_to_slots (hoisted BSGS levels + between-stage ModReduce)
    batched over 2 channels == per-channel, bit for bit.  This exercises
    the vmapped _bsgs_level + _modred stage programs that every batched
    bootstrap rides."""
    ctx, enc, sk, dnn, boot, w = setup
    slots = w * w
    img = RNG.uniform(-0.9, 0.9, (w, w, 2))
    t = dnn.enc_tensor(img, sk=sk)
    # C2S consumes the post-RaiseMod ciphertext one rescale down (the
    # sparse prelude's PartialSum ends in a ModReduce) — mirror that depth
    cts = [auto.mod_switch_level(ctx, ct, 1) for ct in t.cts]

    seq = [boot.coeffs_to_slots(ct, slots) for ct in cts]
    bat = unstack_cts(boot.coeffs_to_slots(stack_cts(cts), slots), 2)
    for a, b in zip(_bytes(seq), _bytes(bat)):
        np.testing.assert_array_equal(a, b)


def test_sine_batched_bit_identical(setup):
    """The Chebyshev-sine + double-angle stage (the deep multiply chain)
    vmapped over 2 channels == per-channel."""
    ctx, enc, sk, dnn, boot, w = setup
    img = RNG.uniform(-0.9, 0.9, (w, w, 2))
    t = dnn.enc_tensor(img, sk=sk)
    coeffs = tuple(gen_sine_coefficients(28, 3, 44))

    seq = [boot._sine_jit(coeffs)(ct, boot.mul_key) for ct in t.cts]
    bat = unstack_cts(
        boot._sine_jit(coeffs, batched=True)(stack_cts(t.cts), boot.mul_key),
        2,
    )
    for a, b in zip(_bytes(seq), _bytes(bat)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(
    os.environ.get("TPU_FHE_SLOW_TESTS") != "1",
    reason="full batched relu equality needs ~10 min of CPU eager "
           "bootstraps; set TPU_FHE_SLOW_TESTS=1 (the doll-scale ResNet "
           "demo also covers this path end-to-end)",
)
def test_relu_composite_batched_bit_identical(setup, monkeypatch):
    ctx, enc, sk, dnn, boot, w = setup
    img = RNG.uniform(-0.9, 0.9, (w, w, 2))
    t = dnn.enc_tensor(img, sk=sk)

    monkeypatch.setenv("TPU_FHE_DNN_BATCH", "1")
    seq = dnn.relu_composite(t, boot)
    monkeypatch.setenv("TPU_FHE_DNN_BATCH", "2")
    bat = dnn.relu_composite(t, boot)

    for a, b in zip(_bytes(seq.cts), _bytes(bat.cts)):
        np.testing.assert_array_equal(a, b)

    got = dnn.dec_tensor(bat, sk)
    err = np.max(np.abs(got - np.maximum(img, 0.0)))
    assert err < 0.05
