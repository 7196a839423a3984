"""JAX/TPU device engine: exact BN254 Fr arithmetic as 16x16-bit limb arrays
(Montgomery form) and the dense GKR layer sumcheck over device tables."""

import os

import jax

# Persistent compilation cache: the sumcheck compiles one program per table
# shape; cache them across processes/runs.  GKR_TPU_JAX_CACHE="" disables
# it entirely — the test conftest does this because XLA:CPU persists
# AOT-compiled host machine code whose recorded target features never
# match the loader's (SIGILL/segfault risk on reload, and the cache WRITE
# itself has segfaulted the CPU suite); the TPU plugin serializes portable
# executables and is safe to cache.
_cache_dir = os.environ.get("GKR_TPU_JAX_CACHE",
                            os.path.expanduser("~/.cache/gkr_tpu_jax"))
# The CPU AOT cache reload logs noisy (harmless) machine-feature mismatch
# errors about the prefer-no-scatter/gather tuning hints; silence them.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
if _cache_dir:
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - older jax without these options
        pass
