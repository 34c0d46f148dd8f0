"""Test configuration: run on CPU with 8 virtual devices so the sharded
(multi-chip) paths are exercised without TPU hardware, and enable x64 for
the uint64 canonical representation.

Note: the environment's sitecustomize imports jax and registers a TPU
plugin at interpreter startup, so env vars are too late here — we must go
through jax.config (backends initialize lazily, so this still wins).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_num_cpu_devices", 8)

# Cache compiled XLA programs across test processes; the uint64 emulation
# generates many small programs and eager-mode first calls dominate runtime
# otherwise.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
