"""JAX/TPU device engine: exact BN254 Fr arithmetic as 16x16-bit limb arrays
(Montgomery form) and the dense GKR layer sumcheck over device tables."""

import os

import jax

# Persistent compilation cache: the sumcheck compiles one program per table
# shape; cache them across processes/runs.
_cache_dir = os.environ.get("GKR_TPU_JAX_CACHE",
                            os.path.expanduser("~/.cache/gkr_tpu_jax"))
# The CPU AOT cache reload logs noisy (harmless) machine-feature mismatch
# errors about the prefer-no-scatter/gather tuning hints; silence them.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:  # pragma: no cover - older jax without these options
    pass
