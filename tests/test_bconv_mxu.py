"""MXU (int8 digit-plane) base conversion: bit-exact vs the u64 VPU path.

The MXU formulation (ops/bconv_mxu.py) must agree with ops/bconv.py's
128-bit-accumulator reference formulation for every shape the evaluator
uses (modup digits, moddown P->Ql, BFV wide conversions) and for boundary
values (0, q-1, 2^61-1 matrix entries).
"""

import numpy as np
import pytest

from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.ops import w64
from tpu_fhe.ops.bconv_mxu import bconv_matmul_mxu, _balanced_digits_host


def _mods(k_out):
    ps = CoeffModulus.create(1 << 13, [59] * k_out)
    p = np.array([[m.value] for m in ps], dtype=np.uint64)
    rlo = np.array([[m.const_ratio[0]] for m in ps], dtype=np.uint64)
    rhi = np.array([[m.const_ratio[1]] for m in ps], dtype=np.uint64)
    return p, rlo, rhi


def _ref_bconv(x, M, p):
    """Exact NumPy bigint reference."""
    xo = x.astype(object)
    Mo = M.astype(object)
    out = np.zeros((M.shape[0],) + x.shape[1:], dtype=object)
    for j in range(M.shape[0]):
        acc = (Mo[j][:, None] * xo).sum(axis=0)
        out[j] = acc % int(p[j, 0])
    return out.astype(np.uint64)


def test_balanced_digits_roundtrip():
    rng = np.random.default_rng(1)
    v = rng.integers(0, 1 << 61, size=(64,), dtype=np.uint64)
    d = _balanced_digits_host(v)
    assert d.dtype == np.int8
    back = sum(int(d[i][k]) << (8 * i) for i in range(8) for k in [0])
    recon = np.zeros(64, dtype=object)
    for i in range(d.shape[0]):
        recon += d[i].astype(object) * (1 << (8 * i))
    assert np.array_equal(recon.astype(np.uint64), v)


@pytest.mark.parametrize(
    "k_in,k_out,lead",
    [(15, 30, ()), (15, 30, (2,)), (30, 15, (2,)), (3, 7, ()), (63, 2, ())],
)
@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_mxu_bconv_matches_bigint(k_in, k_out, lead, impl):
    from tpu_fhe.ops.bconv_mxu_pallas import bconv_matmul_mxu_pallas

    fn = bconv_matmul_mxu if impl == "xla" else bconv_matmul_mxu_pallas
    rng = np.random.default_rng(k_in * 31 + k_out)
    p, rlo, rhi = _mods(k_out)
    M = rng.integers(0, 1 << 61, size=(k_out, k_in), dtype=np.uint64)
    x = rng.integers(0, 1 << 61, size=lead + (k_in, 256), dtype=np.uint64)
    got = fn(w64.W64.from_np(x), M, p, rlo, rhi).to_np()
    if lead:
        for b in np.ndindex(*lead):
            assert np.array_equal(got[b], _ref_bconv(x[b], M, p))
    else:
        assert np.array_equal(got, _ref_bconv(x, M, p))


def test_mxu_bconv_boundary_values():
    p, rlo, rhi = _mods(4)
    M = np.array(
        [[0, (1 << 61) - 1, 1, (1 << 61) - 1]] * 4, dtype=np.uint64
    )
    x = np.array(
        [
            [0, (1 << 61) - 1],
            [(1 << 61) - 1, 0],
            [1, 1],
            [(1 << 61) - 1, (1 << 61) - 1],
        ],
        dtype=np.uint64,
    )
    got = bconv_matmul_mxu(w64.W64.from_np(x), M, p, rlo, rhi).to_np()
    assert np.array_equal(got, _ref_bconv(x, M, p))


def test_mxu_dispatch_through_evaluator(monkeypatch):
    """keyswitch through bconv_matmul with the MXU path forced on CPU must
    produce the same ciphertext as the default path."""
    monkeypatch.setenv("TPU_FHE_MXU_BCONV", "never")
    import jax

    from tpu_fhe.core.params import EncryptionParameters, SchemeType
    from tpu_fhe.eval import evaluator as ev
    from tpu_fhe.scheme.context import FheContext
    from tpu_fhe.scheme.keys import SecretKey

    n = 512
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, [50, 40, 40, 50])),
        special_modulus_size=1,
    )
    ctx = FheContext(params)
    sk = SecretKey(ctx, key=7)
    rlk = sk.relin_key()
    rng = np.random.default_rng(0)
    qs = np.array([m.value for m in ctx.level(1).base.base], dtype=np.uint64)
    data = (
        rng.integers(0, 1 << 50, size=(3, 3, n), dtype=np.uint64)
        % qs[None, :, None]
    )
    from tpu_fhe.scheme.ciphertext import Ciphertext

    ct = Ciphertext(w64.W64.from_np(data), chain_index=1, scale=2.0**40)
    base = ev.relinearize(ctx, ct, rlk).data.to_np()

    monkeypatch.setenv("TPU_FHE_MXU_BCONV", "always")
    got = ev.relinearize(ctx, ct, rlk).data.to_np()
    assert np.array_equal(base, got)
