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

import jax  # noqa: E402

if "cpu" not in jax.config.jax_platforms.split(",")[0]:
    jax.config.update("jax_platforms", "cpu")

# Amortize XLA CPU compiles (the MiMC scan programs and per-shape sumcheck
# programs) across test runs on the same machine.
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
