"""CKKS bootstrapping end-to-end (dense packing).

TPU-native analog of the reference's bootstrapping_example.cu
(SimpleBootstrapExample): encrypt, exhaust levels, bootstrap, measure
average bit precision and levels recovered.

Run:  python examples/bootstrap_ckks.py --cpu --logn 6        # quick
      python examples/bootstrap_ckks.py --logn 16             # full (TPU)
"""

import os as _os
import sys as _sys

# make the repo importable when run as `python examples/<name>.py`
# without touching PYTHONPATH (the env's own PYTHONPATH must survive:
# it loads the TPU-plugin sitecustomize)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def compute_bit_precision(result, expected) -> float:
    err = np.abs(np.asarray(result) - np.asarray(expected))
    err = np.where(err == 0, 1e-30, err)
    return float(np.mean(-np.log2(err)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--logn", type=int, default=6)
    ap.add_argument("--levels-after", type=int, default=1)
    ap.add_argument("--slots", type=int, default=0,
                    help="slot count (default N/2 = fully packed; smaller "
                         "= sparse packing, the ResNet-style config)")
    ap.add_argument("--sparse-sine", action="store_true", default=None,
                    help="use the K=28/r=3 sine bound (small rings)")
    ap.add_argument("--repeat", type=int, default=1,
                    help="time this many bootstrap calls (first includes "
                         "compilation; later ones are the honest latency)")
    ap.add_argument("--iterations", default="1",
                    help="comma list of Meta-BTS iteration counts to "
                         "measure, e.g. '1,2' (2 = two-pass precision "
                         "boost, ~2x latency; src/bootstrap.cu:858-906)")
    ap.add_argument("--precision", type=int, default=0,
                    help="Meta-BTS precision parameter (bits of the "
                         "single-pass result; default = estimate)")
    ap.add_argument("--level-budget", default="",
                    help="C2S,S2C level budget, e.g. '3,3' (default: 2,2 "
                         "small rings; 4,4 at logn>=15 where HBM must hold "
                         "all BSGS plaintexts + rotation keys)")
    ap.add_argument("--dim1", default="",
                    help="baby-step override g for C2S,S2C, e.g. '8,8'")
    ap.add_argument("--size-p", type=int, default=0,
                    help="special-modulus limb count override (larger P = "
                         "fewer KS digits = smaller rotation keys)")
    ap.add_argument("--q32-scale-bits", type=int, default=58,
                    help="composite working-scale bits (pair product); "
                         "58 trades prime headroom for ~2 precision bits")
    ap.add_argument("--q32", action="store_true",
                    help="composite-scaling q32 regime: one logical level "
                         "= a pair of ~28-bit primes, every kernel single-"
                         "word (the TPU-native parameter regime; ~2x the "
                         "60-bit-prime kernel throughput)")
    ap.add_argument("--eager", action="store_true",
                    help="drive the eager per-op path instead of the "
                         "single-program jitted bootstrap")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from tpu_fhe.boot.bootstrap import CkksBootstrapper
    from tpu_fhe.core.modulus import CoeffModulus
    from tpu_fhe.core.params import EncryptionParameters, SchemeType
    from tpu_fhe.eval import auto, evaluator as ev
    from tpu_fhe.scheme.ckks_encoder import CkksEncoder
    from tpu_fhe.scheme.context import FheContext
    from tpu_fhe.scheme.keys import SecretKey

    n = 1 << args.logn
    # small rings have few q0-overflows; the sparse sine bound suffices and
    # costs 4 fewer levels
    use_sparse_sine = (
        args.sparse_sine if args.sparse_sine is not None else args.logn <= 13
    )

    t0 = time.time()
    boot_probe = CkksBootstrapper.__new__(CkksBootstrapper)
    # sine params must be set before computing depth.  Large rings default
    # to a {4,4} budget: 16 GB of HBM (TPU v5e) must hold every BSGS
    # plaintext and rotation key, and per collapsed level the rotation
    # count grows as 2^(layers+1) — deeper budgets trade 4 extra chain
    # levels for ~4x less resident memory than the reference's {2,2}
    # (which targets 80 GB A100s).
    if args.level_budget:
        level_budget = tuple(int(v) for v in args.level_budget.split(","))
    else:
        level_budget = (4, 4) if args.logn >= 15 else (2, 2)
    if use_sparse_sine:
        k, r, deg = 28, 3, 44
    else:
        k, r, deg = 512, 6, 88

    from tpu_fhe.eval import chebyshev as cheb
    from tpu_fhe.boot.bootstrap import gen_sine_coefficients

    approx_depth = cheb.get_mult_depth_by_coeff_vector(
        gen_sine_coefficients(k, r, deg), normalized=False
    ) + r
    depth = args.levels_after + approx_depth + sum(level_budget) + 2
    # larger special basis => fewer hybrid-KS digits: fused rotation keys
    # shrink ~linearly with dnum (the reference's ResNet config uses P=10x60
    # at comparable depth) and modup/inner-product work drops with beta
    # P covering half of Q => dnum = 2 hybrid-KS digits: rotation keys are
    # (dnum * 2 * size_QP) limb planes each, and key memory dominates HBM
    # at logn >= 15
    if args.q32:
        # composite scaling: 2x (depth+1) data limbs at the same total logQ
        # as the 60-bit chain; P sized for dnum=2 hybrid-KS digits
        size_p = args.size_p or (depth + 1)
        mods = CoeffModulus.create_composite(
            n, args.q32_scale_bits, depth, degree=2, anchor_bits=30,
            special_bits=30, special_count=size_p,
        )
        nlimbs = len(mods)
        params = EncryptionParameters(
            scheme=SchemeType.ckks,
            poly_modulus_degree=n,
            allow_insecure=True,
            coeff_modulus=tuple(mods),
            special_modulus_size=size_p,
            composite_degree=2,
        )
    else:
        size_p = args.size_p or max(2, -(-(depth + 1) // 2))
        bits = [60] + [59] * depth + [60] * size_p
        nlimbs = len(bits)
        params = EncryptionParameters(
            scheme=SchemeType.ckks,
            poly_modulus_degree=n,
            allow_insecure=True,
            coeff_modulus=tuple(CoeffModulus.create(n, bits)),
            special_modulus_size=size_p,
        )
    ctx = FheContext(params)
    enc = CkksEncoder(ctx)
    print(f"[context] N={n}, {nlimbs} limbs "
          f"(Q={nlimbs - size_p}, P={size_p}) ({time.time()-t0:.1f}s)")

    t0 = time.time()
    sk = SecretKey(ctx, key=2024)
    boot = CkksBootstrapper(ctx, enc)
    boot.set_sine_params(k, r, deg)
    slots = args.slots or n // 2
    # balanced baby/giant steps halve the rotation-key count per level
    # (g-1 inner + b-1 outer keys) vs the default wide giant step
    if args.dim1:
        dim1 = tuple(int(v) for v in args.dim1.split(","))
    else:
        dim1 = (8, 8) if args.logn >= 15 and level_budget[0] >= 4 else (0, 0)
    boot.setup(level_budget=level_budget, slots=slots, dim1=dim1)
    boot.keygen(sk, slots)
    print(f"[setup+keygen] ({time.time()-t0:.1f}s)")

    sf, _ = auto.scaling_factors(ctx)
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.8, 0.8, slots)
    ct = sk.encrypt_symmetric(enc.encode(x, sf[0], slots=slots))
    min_limbs = 2 * (2 if args.q32 else 1)
    while ctx.level(ct.chain_index).size > min_limbs:
        ct = ev.mod_drop_to_next(ctx, ct)
    cd = 2 if args.q32 else 1
    print(f"[input] levels before bootstrap: "
          f"{(len(ctx.chain) - 1 - ct.chain_index) // cd}")

    prec = 0.0
    for iters in [int(v) for v in args.iterations.split(",")]:
        meta_prec = args.precision or max(8, int(prec))
        for rep in range(args.repeat):
            t0 = time.time()
            if iters == 1:
                out = (boot.eval_bootstrap(ct, slots) if args.eager
                       else boot.eval_bootstrap_jit(ct, slots))
            else:
                out = boot.eval_bootstrap(ct, slots, iters, meta_prec)
            # D2H fetch = the only reliable completion barrier over the tunnel
            np.asarray(out.data.lo[0, 0, :4])
            dt = time.time() - t0
            if args.repeat > 1:
                print(f"[bootstrap iters={iters}] call {rep}: {dt:.1f}s")
        got = enc.decode(sk.decrypt(out), slots=slots).real
        prec = compute_bit_precision(got, x)
        levels_after = (len(ctx.chain) - 1 - out.chain_index) // cd
        print(f"[bootstrap iters={iters}] {dt:.1f}s, precision={prec:.1f} "
              f"bits, levels after={levels_after}")
        assert prec > 10, "bootstrap precision too low"
    print("OK")


if __name__ == "__main__":
    main()
