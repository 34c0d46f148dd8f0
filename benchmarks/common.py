"""Shared benchmark plumbing (arg parsing, context builders, CSV output)."""

from __future__ import annotations

import argparse


def base_parser(desc: str) -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=desc)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--csv", action="store_true", help="CSV output only")
    return ap


def init_backend(args):
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    enable_compile_cache(jax)
    return jax


def enable_compile_cache(jax):
    """Persistent XLA compile cache: first compiles are slow (esp. over the
    TPU tunnel on a small host); reruns of any harness must not repay them."""
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def marginal_pairs(timed, iters, pairs=5, log=None):
    """Median-of-pairs marginal timing with a positivity guard.

    `timed(reps)` runs the op `reps` times (blocking) and returns seconds.
    A single (t_long - t_short) difference is exposed to one slow sample
    (scheduler hiccup / background recompile) and can go negative — the
    bug behind the invalid r03 headline and r04's unusable bsgs scaling
    numbers.  Take several independent pairs, keep positive marginals,
    report the median; fall back to direct per-op time (always positive,
    includes dispatch) in a pathological environment."""
    samples = []
    for _ in range(pairs):
        t_short = timed(2)
        t_long = timed(2 + iters)
        dt = (t_long - t_short) / iters
        if dt > 0:
            samples.append(dt)
    if not samples:
        samples = [timed(iters) / iters for _ in range(3)]
    samples.sort()
    med = samples[len(samples) // 2]
    if log is not None:
        spread = (samples[-1] - samples[0]) / med if med else float("inf")
        log(f"  ({len(samples)} marginal pairs, spread {spread * 100:.0f}%)")
    return med


def make_ckks(n, data_bits, num_data, size_p, first_bits=60, aux_bits=60):
    from tpu_fhe.core.modulus import CoeffModulus
    from tpu_fhe.core.params import EncryptionParameters, SchemeType
    from tpu_fhe.scheme.ckks_encoder import CkksEncoder
    from tpu_fhe.scheme.context import FheContext
    from tpu_fhe.scheme.keys import SecretKey

    bits = [first_bits] + [data_bits] * (num_data - 1) + [aux_bits] * size_p
    params = EncryptionParameters(
        scheme=SchemeType.ckks,
        poly_modulus_degree=n,
        allow_insecure=True,
        coeff_modulus=tuple(CoeffModulus.create(n, bits)),
        special_modulus_size=size_p,
    )
    ctx = FheContext(params)
    return ctx, CkksEncoder(ctx), SecretKey(ctx, key=1)
