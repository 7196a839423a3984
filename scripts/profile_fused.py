"""Per-piece timing of the fused engine at 2^k on the current device.

Usage: PYTHONPATH=.:/root/.axon_site python scripts/profile_fused.py [k]

Enables the persistent compilation cache so repeated profiling runs skip
the ~12 min Mosaic/XLA warmup.
"""

from __future__ import annotations

import os
import random
import sys
import time

import jax

_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache-device")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from gkr_tpu.field import P  # noqa: E402
from gkr_tpu.mimc import Mimc7  # noqa: E402
from gkr_tpu.mle import MleStruct  # noqa: E402
from gkr_tpu.jaxeng import limbs as L  # noqa: E402
import gkr_tpu.jaxeng.fused as F  # noqa: E402
from gkr_tpu.jaxeng.fused import build_wiring  # noqa: E402


def tick(label, fn, reps=5):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    jax.block_until_ready(r)
    print(f"{label:44s} {(time.time()-t0)/reps*1000:10.2f} ms", flush=True)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << k
    k_cur = 4
    rng = random.Random(1)
    use_pallas = F._pallas_platform()
    print("device:", jax.devices()[0], "k:", k, "pallas:", use_pallas,
          flush=True)

    key = jax.random.PRNGKey(0)
    w_dev = L.jnormalize(jax.random.randint(
        key, (n, 16), 0, 1 << 16, dtype=jnp.int32).astype(jnp.uint32))
    w_dev.block_until_ready()
    z = [rng.randrange(P) for _ in range(k_cur)]
    z_dev = L.pack(z)
    na = nm = n // 2
    t0 = time.time()
    add_gates = [(g & 15, rng.randrange(n), rng.randrange(n))
                 for g in range(na)]
    mult_gates = [(g & 15, rng.randrange(n), rng.randrange(n))
                  for g in range(nm)]
    print(f"synth gates: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    wiring = build_wiring(add_gates, mult_gates, n)
    jax.block_until_ready(wiring)
    print(f"build_wiring host->dev: {(time.time()-t0)*1000:.0f} ms",
          flush=True)

    c = L.pack_scalar(123456789)
    if use_pallas:
        from gkr_tpu.jaxeng import pallas_kernels as PK
        tick("pallas MiMC multi_hash(3)",
             lambda: PK.pl_mimc_multi(jnp.stack([c, c, c])))
    tick("XLA MiMC hash3", lambda: F._hash3(c, c, c))

    tick("build_phase1", lambda: F._build_phase1(
        w_dev, z_dev, wiring, (na, nm), n, use_pallas))
    S1, wa, wm = F._build_phase1(w_dev, z_dev, wiring,
                                 (na, nm), n, use_pallas)
    b_star = jnp.stack([L.pack_scalar(rng.randrange(P)) for _ in range(k)])
    wb = L.pack_scalar(rng.randrange(P))
    tick("eq_table 2^k", lambda: L.jeq_table(b_star))
    tick("build_phase2", lambda: F._build_phase2(
        w_dev, b_star, wb, wa, wm, wiring, (na, nm), n, use_pallas))

    if use_pallas:
        S1T = S1 if S1.ndim == 3 and S1.shape[0] == 4 else PK.to_T(S1)
        tick("pallas p1 eval+interp (full n)",
             lambda: F._p1_round_T(S1T))
        tick("pallas fold (full n)", lambda: PK.pl_fold(S1T, c))
    else:
        S1r = S1 if S1.ndim == 3 and S1.shape[1] == 4 else None
        if S1r is not None:
            tick("XLA p1 eval+interp (full n)", lambda: F._p1_round(S1r))
            tick("XLA fold (full n)", lambda: F._fold(S1r, c))

    struct = MleStruct(k, False, [True] * k, k)
    # warm full layer (compiles every halved shape), then time
    t0 = time.time()
    F.prove_layer_sumcheck_fused(z, None, add_gates, mult_gates, k_cur, k,
                                 struct, Mimc7(), w_dev=w_dev,
                                 wiring=wiring)
    print(f"full layer (1st, incl residual compiles): "
          f"{(time.time()-t0)*1000:.0f} ms", flush=True)
    for rep in range(3):
        t0 = time.time()
        F.prove_layer_sumcheck_fused(z, None, add_gates, mult_gates, k_cur,
                                     k, struct, Mimc7(), w_dev=w_dev,
                                     wiring=wiring)
        dt = time.time() - t0
        print(f"full layer run {rep}: {dt*1000:.0f} ms -> "
              f"{n/dt:,.0f} gates/s", flush=True)


if __name__ == "__main__":
    main()
