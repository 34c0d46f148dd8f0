"""Limb-sharded bootstrap BSGS level == unsharded, bit for bit.

Runs on the 8-virtual-device CPU mesh (conftest): one hoisted C2S level
(the bootstrap hot structure, reference src/bootstrap.cu:1256-1402) with
ciphertext limbs + key limb axes sharded, GSPMD-partitioned, executed, and
compared byte-for-byte against the single-device path.
"""

import numpy as np
import pytest

from tpu_fhe.boot.bootstrap import CkksBootstrapper
from tpu_fhe.core.modulus import CoeffModulus
from tpu_fhe.core.params import EncryptionParameters, SchemeType
from tpu_fhe.eval import auto
from tpu_fhe.parallel.boot_sharded import bsgs_level_limb_sharded
from tpu_fhe.parallel.sharding import make_mesh
from tpu_fhe.scheme.ckks_encoder import CkksEncoder
from tpu_fhe.scheme.context import FheContext
from tpu_fhe.scheme.keys import SecretKey

RNG = np.random.default_rng(321)


@pytest.fixture(scope="module")
def setup():
    n = 256
    slots = 16
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
    sk = SecretKey(ctx, key=17)
    boot = CkksBootstrapper(ctx, enc)
    boot.set_sine_params(28, 3, 44)
    boot.setup(level_budget=(2, 2), slots=slots)
    boot.keygen(sk, slots=slots)

    pt = enc.encode(np.linspace(-0.8, 0.8, slots), 2.0 ** 59,
                    chain_index=1, slots=slots)
    ct = sk.encrypt_symmetric(pt)
    # C2S consumes the post-RaiseMod ciphertext one level down
    ct = auto.mod_switch_level(ctx, ct, 1)
    return ctx, boot, ct, slots


def test_bsgs_level_limb_sharded_bit_identical(setup):
    ctx, boot, ct, slots = setup
    si, rot_in, rot_out, b, g, num_rot, _ = boot.c2s_stage_plans(slots)[0]
    A = boot.precom[slots].a_c2s[si]
    keys = boot._keys_for(rot_in, rot_out)
    ref = boot._bsgs_level(ct, A, keys, rot_in, rot_out, b, g, num_rot)

    mesh = make_mesh(2, 4)  # batch x limb over the 8 virtual devices
    got, stats = bsgs_level_limb_sharded(boot, ct, slots, mesh)

    assert got.chain_index == ref.chain_index
    assert got.scale == ref.scale
    np.testing.assert_array_equal(got.data.to_np(), ref.data.to_np())
    # GSPMD must have partitioned something: a limb-sharded keyswitch
    # induces at least one digit collective
    assert stats, "no collectives in the compiled sharded BSGS level"
