"""tpu-fhe: a TPU-native fully homomorphic encryption framework.

Brand-new JAX/XLA/Pallas implementation of RNS-based CKKS/BFV/BGV with CKKS
bootstrapping and a PPML layer, with the capabilities of the PhantomFHE-boot
CUDA reference (see SURVEY.md).  The canonical on-device representation is
uint64 (XLA lowers to 32-bit pairs on TPU); hot kernels have Pallas
implementations operating on 32-bit halves.
"""

import os as _os

import jax as _jax

# x64 on: host-side table math and the CPU NTT fallback use uint64 arrays
# (on-device data is u32-pair planes, see ops/w64.py).
_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: FHE programs are large (per-level static
# shapes) and TPU compiles are expensive, especially over a remote tunnel.
_cache_dir = _os.environ.get("TPU_FHE_JAX_CACHE", "/tmp/tpu_fhe_jax_cache")
try:  # pragma: no cover - best effort
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

__version__ = "0.1.0"
