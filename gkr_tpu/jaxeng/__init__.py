"""JAX/TPU device engine: exact BN254 Fr arithmetic as 16x16-bit limb arrays
(Montgomery form) and the dense GKR layer sumcheck over device tables."""

import os

import jax

# Persistent compilation cache: the sumcheck compiles one program per table
# shape; cache them across processes/runs.
_cache_dir = os.environ.get("GKR_TPU_JAX_CACHE",
                            os.path.expanduser("~/.cache/gkr_tpu_jax"))
_platforms = str(getattr(jax.config, "jax_platforms", "") or "")
if not _platforms.startswith("cpu"):
    # On CPU the AOT cache reload spams machine-feature warnings; the cache
    # pays off on the TPU path where per-shape sumcheck programs are reused.
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - older jax without these options
        pass
