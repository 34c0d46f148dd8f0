"""Coefficient-sharded 4-step NTT: bit-exact vs single-chip, all-to-all
between phases, multi-device CPU mesh (8 virtual devices via conftest)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.ntt_tables import make_ntt_tables
from tpu_fhe.ops import w64
from tpu_fhe.ops.ntt import build_device_ntt_tables, forward_ntt, inverse_ntt
from tpu_fhe.ops.w64 import W64
from tpu_fhe.parallel.ntt4step import forward_ntt_4step, inverse_ntt_4step

RNG = np.random.default_rng(42)


@pytest.fixture(scope="module")
def stack():
    n = 256
    log_n = 8
    mods = CoeffModulus.create(n, [50, 50, 50])
    tables = build_device_ntt_tables(
        [make_ntt_tables(log_n, m.value) for m in mods]
    )
    qs = np.array([[m.value] for m in mods], dtype=np.uint64)
    x = (RNG.integers(0, 1 << 62, (3, n), dtype=np.uint64) % qs)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("coeff",))
    return n, tables, x, mesh


def test_forward_bit_exact(stack):
    n, t, x, mesh = stack
    ref = forward_ntt(W64.from_np(x), t).to_u64()
    with mesh:
        got = jax.jit(
            lambda v: forward_ntt_4step(v, t, mesh)
        )(W64.from_np(x)).to_u64()
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_roundtrip_and_inverse_bit_exact(stack):
    n, t, x, mesh = stack
    xf = forward_ntt(W64.from_np(x), t)
    ref = inverse_ntt(xf, t).to_u64()
    with mesh:
        got = jax.jit(
            lambda v: inverse_ntt_4step(v, t, mesh)
        )(xf).to_u64()
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    np.testing.assert_array_equal(np.asarray(ref), x)
    # full sharded roundtrip
    with mesh:
        rt = jax.jit(
            lambda v: inverse_ntt_4step(forward_ntt_4step(v, t, mesh), t, mesh)
        )(W64.from_np(x)).to_u64()
    np.testing.assert_array_equal(np.asarray(rt), x)


def test_all_to_all_in_compiled_program(stack):
    """The phase transition must lower to a collective resharding (the
    stage-wise all-to-all of the BASELINE north star), not a gather of the
    full array."""
    n, t, x, mesh = stack
    with mesh:
        fn = jax.jit(lambda v: forward_ntt_4step(v, t, mesh))
        compiled = fn.lower(W64.from_np(x)).compile()
    hlo = compiled.as_text()
    assert ("all-to-all" in hlo) or ("collective-permute" in hlo), (
        "expected a collective resharding between NTT phases"
    )


def test_uneven_split_shapes(stack):
    """Non-square split (N1 != N2) stays bit-exact."""
    n, t, x, mesh = stack
    with mesh:
        got = jax.jit(
            lambda v: forward_ntt_4step(v, t, mesh, n1=32)
        )(W64.from_np(x)).to_u64()
    ref = forward_ntt(W64.from_np(x), t).to_u64()
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
