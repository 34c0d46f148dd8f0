"""Encrypted ResNet-20 / CIFAR-10 inference through the public API.

TPU-native analog of the reference's Resnet app (Resnet/resnet.cu):
N=2^16, 59-bit data primes, 60-bit first prime, 10x60-bit special primes,
levelBudget {2,2}, 11 levels after bootstrap, sparse packing at
(w << slotstr)^2 slots, ReluComposite activations with interleaved
bootstraps.

Full-scale run (TPU):   python examples/resnet20_infer.py --weights DIR --image cifar.npy
Doll-scale demo (CPU):  python examples/resnet20_infer.py --cpu --demo
The demo shrinks ring/width/planes but exercises the identical pipeline
(conv/bn/ReluComposite+bootstrap/residual/downsample/pool+fc) and compares
against the cleartext shadow of the same computation.
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


def main():
    # live stack dumps without disturbing the run: kill -USR1 <pid>
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1, all_threads=True)

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--demo", action="store_true", help="doll-scale config")
    ap.add_argument("--n", type=int, default=0, help="ring degree override")
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--planes", type=str, default="16,32,64")
    ap.add_argument("--blocks", type=int, default=3, help="blocks per layer")
    ap.add_argument("--layers", type=int, default=3,
                    help="layers to run (< 3 truncates; skips final pool)")
    ap.add_argument("--weights", type=str, default="", help=".npy weight dir")
    ap.add_argument("--image", type=str, default="", help="CIFAR .npy file")
    ap.add_argument("--image-index", type=int, default=0)
    ap.add_argument("--level-budget", type=str, default="",
                    help="C2S,S2C level budget (default 2,2; deeper budgets "
                         "trade bootstrap depth for much smaller resident "
                         "BSGS plaintext/key memory — 4,4 fits 16 GB HBM)")
    ap.add_argument("--q32", action="store_true",
                    help="composite-scaling regime (30-bit limb pairs, "
                         "working scale 2^58): ~3x faster bootstraps on "
                         "TPU at ~1 bit less precision")
    ap.add_argument("--ckpt", type=str, default="",
                    help="checkpoint dir: save the tensor after every stage "
                         "and resume from the last one on restart")
    ap.add_argument("--budget", type=float, default=0.0,
                    help="wall-clock seconds: checkpoint and exit(3) when "
                         "exceeded (run again to continue)")
    args = ap.parse_args()
    if args.budget and not args.ckpt:
        ap.error("--budget requires --ckpt (otherwise completed work "
                 "would be lost at the budget exit)")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: the full-scale stage programs cost tens of
    # minutes cold; across chunked runs they must come back from disk
    jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("TPU_FHE_COMPILE_CACHE", "/tmp/jax_cache_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from tpu_fhe.boot.bootstrap import CkksBootstrapper
    from tpu_fhe.core.modulus import CoeffModulus
    from tpu_fhe.core.params import EncryptionParameters, SchemeType
    from tpu_fhe.eval import auto
    from tpu_fhe.models import resnet20 as rn
    from tpu_fhe.models.dnn import DNN
    from tpu_fhe.scheme.ckks_encoder import CkksEncoder
    from tpu_fhe.scheme.context import FheContext
    from tpu_fhe.scheme.keys import SecretKey

    t0 = time.time()
    if args.demo:
        n = args.n or 256
        width = min(args.width, 8)
        planes = (2, 2, 2)
        blocks = min(args.blocks, 3)
        sine = (28, 3, 44)          # small-ring secret: sparse sine bound
        levels_after = 10
    else:
        n = args.n or 1 << 16
        width = args.width
        planes = tuple(int(p) for p in args.planes.split(","))
        blocks = args.blocks
        sine = (512, 6, 88)         # reference's uniform-secret parameters
        levels_after = 11

    if args.level_budget:
        level_budget = tuple(int(v) for v in args.level_budget.split(","))
    else:
        level_budget = (2, 2)
    boot = None  # created after context

    # parameter recipe mirrors Resnet/resnet.cu:16-54, except P: the
    # reference uses 10x60-bit special primes (dnum=3 at its depth) on an
    # 80 GB A100; on a 16 GB v5e rotation-key HBM dominates, and P=15
    # gives dnum=2 — keys shrink ~25% at slightly more moddown work
    first_mod, dcrt_bits, aux_mod, size_p = 60, 59, 60, 15 if not args.demo else 3

    # bootstrap depth needs the sine params; compute via a throwaway helper
    from tpu_fhe.eval import chebyshev as cheb
    from tpu_fhe.boot.bootstrap import gen_sine_coefficients

    approx = cheb.get_mult_depth_by_coeff_vector(
        gen_sine_coefficients(*sine), normalized=False
    )
    boot_depth = approx + sine[1] + level_budget[0] + level_budget[1]
    depth = levels_after + boot_depth
    print(f"[params] N={n} levels={depth + 1} boot_depth={boot_depth} "
          f"regime={'q32' if args.q32 else '60-bit'} "
          f"level_budget={level_budget}")

    if args.q32:
        # composite scaling (examples/bootstrap_ckks.py --q32): one logical
        # level = a 30-bit prime pair at working scale 2^58; single-word
        # device kernels bootstrap ~3x faster than the 60-bit chain
        size_p = depth + 1
        mods = CoeffModulus.create_composite(
            n, 58, depth, degree=2, anchor_bits=30,
            special_bits=30, special_count=size_p,
        )
        params = EncryptionParameters(
            scheme=SchemeType.ckks,
            poly_modulus_degree=n,
            allow_insecure=True,
            coeff_modulus=tuple(mods),
            special_modulus_size=size_p,
            composite_degree=2,
        )
    else:
        bits = [first_mod] + [dcrt_bits] * depth + [aux_mod] * size_p
        params = EncryptionParameters(
            scheme=SchemeType.ckks,
            poly_modulus_degree=n,
            allow_insecure=True,
            coeff_modulus=tuple(CoeffModulus.create(n, bits)),
            special_modulus_size=size_p,
        )
    ctx = FheContext(params)
    enc = CkksEncoder(ctx)
    sk = SecretKey(ctx, key=1)
    print(f"[context] logQP={sum(m.bit_count for m in params.coeff_modulus)} "
          f"({time.time() - t0:.1f}s)")

    sf, _ = auto.scaling_factors(ctx)
    model = DNN(ctx, enc, scale=sf[0])
    rn.prepare_resnet20(model, sk, width=width, layers=args.layers)

    slots = width * width
    boot = CkksBootstrapper(ctx, enc)
    boot.set_sine_params(*sine)
    boot.setup(level_budget=level_budget, slots=slots,
               dim1=(8, 8) if (not args.demo and level_budget[0] >= 4)
               else (0, 0))
    boot.keygen(sk, slots=slots)
    model.mul_key = boot.mul_key
    print(f"[keys+bootstrap setup] ({time.time() - t0:.1f}s)")

    rng = np.random.default_rng(17)
    if args.weights:
        weights = rn.load_weights(args.weights)
    else:
        weights = rn.random_weights(rng, planes=planes)
    if args.image:
        image = rn.load_cifar_image(args.image, args.image_index)
    else:
        image = rng.uniform(-0.5, 0.5, (width, width, 3))

    print("[inference] start")
    t1 = time.time()
    start_after = ""
    if args.ckpt and _os.path.exists(f"{args.ckpt}/meta.json"):
        x, meta = rn.load_tensor_ct(args.ckpt)
        start_after = meta["stage"]
        print(f"[resume] from checkpoint after stage {start_after!r}")
    else:
        x = model.enc_tensor(image, sk=sk)

    class _Budget(Exception):
        pass

    def stage_done(name, t):
        if args.ckpt:
            ts = time.time()
            rn.save_tensor_ct(t, args.ckpt, stage=name)
            print(f"  [ckpt] saved after {name} ({time.time() - ts:.0f}s)")
        if args.budget and time.time() - t1 > args.budget and name != "pool":
            # pool is the last stage: nothing left to budget, let the
            # decrypt/logits print happen
            raise _Budget(name)

    try:
        out = rn.resnet20_infer(
            x, model, boot, weights, blocks=blocks, layers=args.layers,
            log=lambda m: print(f"  {m} ({time.time() - t1:.0f}s)"),
            start_after=start_after, on_stage_done=stage_done,
        )
    except _Budget as e:
        from tpu_fhe.utils import timer
        print(f"[budget] exceeded after stage {e} "
              f"({time.time() - t1:.0f}s); checkpointed — rerun to continue")
        timer.print_accumulated()
        _sys.exit(3)
    wall = time.time() - t1
    if args.layers < 3:
        acts = model.dec_tensor(out, sk)
        print(f"[inference] truncated ({args.layers} layers) done in "
              f"{wall:.1f}s; activation sample {np.round(acts[0, 0, :4], 4)}")
        from tpu_fhe.utils import timer
        timer.print_accumulated()
        return
    logits = model.dec_tensor(out, sk)[0, 0, :]
    print(f"[inference] done in {wall:.1f}s")
    from tpu_fhe.utils import timer
    timer.print_accumulated()
    print(f"encrypted logits: {np.round(logits, 4)}")
    print(f"predicted class:  {int(np.argmax(logits))}")

    if not args.weights or blocks < 3:
        # cleartext shadow uses exact relu; encrypted uses the composite —
        # compare coarsely
        if blocks == 3:
            clear = rn.resnet20_infer_clear(image, weights)
            print(f"cleartext logits: {np.round(clear, 4)}")
            print(f"clear class:      {int(np.argmax(clear))}")


if __name__ == "__main__":
    main()
