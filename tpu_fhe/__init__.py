"""tpu-fhe: a TPU-native fully homomorphic encryption framework.

Brand-new JAX/XLA/Pallas implementation of RNS-based CKKS/BFV/BGV with CKKS
bootstrapping and a PPML layer, with the capabilities of the PhantomFHE-boot
CUDA reference (see SURVEY.md).  The canonical on-device representation is
uint64 (XLA lowers to 32-bit pairs on TPU); hot kernels have Pallas
implementations operating on 32-bit halves.
"""

import jax as _jax

# uint64 is the canonical limb dtype throughout the framework.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
