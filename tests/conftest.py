import os

# Tests run on a virtual 8-device CPU mesh — sharding logic is validated
# without TPU hardware; the real chip is exercised by bench.py / the driver.
#
# NOTE: in the axon environment jax is pre-imported at interpreter startup
# with the TPU backend forced (jax.config.jax_platforms == "axon,cpu"), so
# env vars alone are not enough: the config must be updated before first use.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()

# Disable the persistent compilation cache for the CPU suite (empty =
# gkr_tpu.jaxeng skips enabling it): XLA:CPU caches AOT-compiled HOST
# machine code whose recorded target features never match the loader's,
# and a cache READ of such an entry segfaults the process (reproduced in
# round 5 inside jax compilation_cache.get_executable_and_time).  The
# TPU-side scripts keep their cache — the TPU plugin serializes portable
# executables, not host code.
os.environ["GKR_TPU_JAX_CACHE"] = ""

import jax  # noqa: E402

if "cpu" not in jax.config.jax_platforms.split(",")[0]:
    jax.config.update("jax_platforms", "cpu")

# NO persistent compilation cache on CPU: XLA:CPU persists AOT-compiled
# machine code whose recorded target features (including tuning
# pseudo-features like +prefer-no-scatter) never match the loader's host
# feature set, so every reload warns about possible SIGILL — and a stale
# entry really did segfault the suite inside the first sharded program.
# CPU compiles here are cheap; the TPU-side scripts keep their own cache
# (the TPU plugin serializes portable executables, not host machine code).
